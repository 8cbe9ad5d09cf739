package graft.adsbx

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed API boundary (SURVEY §1.5): the emitted GeoJSON Feature as a
  * case-class contract, for consumers who want compile-time field safety
  * instead of the dynamic Row. `metadata` (the full input record,
  * task.ts:197) stays in the DataFrame view — it is schema-dynamic by
  * design; the typed view carries the stable CoT fields. */
final case class CotProperties(
    cot_type: String,
    callsign: String,
    speed: Double,
    course: Double,
    remarks: String)

final case class CotGeometry(
    `type`: String,
    coordinates: Seq[Double])

final case class CotFeature(
    id: String,
    `type`: String,
    properties: CotProperties,
    geometry: CotGeometry)

object CotFeature {

  /** Typed view over `Pipeline.features` output. */
  def fromFeatures(features: DataFrame): Dataset[CotFeature] = {
    import features.sparkSession.implicits._
    features.select(
      col("feature.id").as("id"),
      col("feature.type").as("type"),
      struct(
        col("feature.properties.type").as("cot_type"),
        col("feature.properties.callsign").as("callsign"),
        col("feature.properties.speed").as("speed"),
        col("feature.properties.course").as("course"),
        col("feature.properties.remarks").as("remarks")).as("properties"),
      col("feature.geometry").as("geometry"))
      .as[CotFeature]
  }
}
