package graft.adsbx.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** O1-O3 — output stage of the pipeline (reference task.ts:251-257).
  *
  * The reference wraps all features in one `FeatureCollection` and POSTs it
  * to the CloudTAK ETL API. At scale the collection wrap must never
  * materialize on the driver (SURVEY §4.3): `writeJsonFeatures` streams
  * row-per-feature JSON to files; `submitCollections` wraps per partition
  * and hands each bounded FeatureCollection document to a submit callback
  * (the HTTP POST seam — injectable so tests and the zero-egress harness
  * capture instead of POSTing).
  */
object FeatureSink {

  /** O1 — the `ok - fetched N aircraft` metric, as an observable metric on
    * the features DataFrame (counted post-dedup, pre-include-filter in the
    * reference; attach before the join to match). */
  def observed(features: DataFrame, name: String = "metrics"): DataFrame =
    features.observe(name, count(lit(1)).as("n_features"))

  /** O2+O3 batch path: one FeatureCollection JSON document per partition,
    * delivered to `submit`. Distributed wrap — no driver collect. */
  def submitCollections(features: DataFrame, submit: String => Unit): Unit = {
    val json = features.select(to_json(col("feature")).as("f"))
    json.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val fc = it.map(_.getString(0))
          .mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")
        submit(fc)
      }
    }
  }

  /** O2 file path: row-per-feature JSON lines (the scalable sink format —
    * downstream consumers re-window into collections as needed). */
  def writeJsonFeatures(features: DataFrame, path: String): Unit =
    features.select(to_json(col("feature")).as("value"))
      .write.mode("overwrite").text(path)

  /** O3 streaming path: per micro-batch (= per scheduled invocation in the
    * reference's model), wrap and submit each partition's collection. */
  def foreachBatchSubmit(submit: String => Unit)(batch: DataFrame, batchId: Long): Unit =
    submitCollections(batch, submit)

  /** Exactly-once file sink for foreachBatch: each micro-batch overwrites
    * its own `batch_id=<id>` partition directory, so a batch replayed
    * after failure (Structured Streaming reprocesses from the checkpoint)
    * rewrites the same files instead of appending duplicates — the
    * standard idempotent-by-batch-id pattern. */
  def idempotentBatchWriter(root: String)(batch: DataFrame, batchId: Long): Unit =
    batch.select(to_json(col("feature")).as("value"))
      .write.mode("overwrite").text(s"$root/batch_id=$batchId")
}
