package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Exact._

/** Skew-mitigation patterns (SURVEY §4.3 scale posture).
  *
  * A hot grouping key concentrates one reducer partition at shuffle time;
  * AQE's skew-join splitting covers joins but skewed AGGREGATION keys need
  * salting: shard each key into `nSalts` sub-keys for the partial
  * aggregate, then combine the shards. Results are identical to the
  * unsalted aggregate when every aggregate in play is commutative +
  * associative (sum/count/min/max — decimal sums here, so even float
  * summation order cannot show through).
  *
  * `saltedAgg` is the reusable operator; `rel_salted_agg` proves
  * equivalence against the plain-GROUP BY DuckDB oracle on the most skewed
  * real column in the corpus (events.event_type).
  */
object SkewOps {

  /** Two-stage salted aggregation: count + exact sum per key. */
  def saltedAgg(df: DataFrame, key: Column, value: Column, nSalts: Int): DataFrame =
    df.groupBy(key.as("k"), (monotonically_increasing_id() % nSalts).as("salt"))
      .agg(count(lit(1)).as("pn"), sum(value.cast(dec)).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).cast("double").as("sum_value"))

  private def saltedAggQ(s: SparkSession, dir: String): DataFrame =
    saltedAgg(graft.Tables(s, dir, "events"), col("event_type"), col("value"), 16)
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_salted_agg" -> saltedAggQ,
  )

  val oracles: Map[String, String] = Map(
    // the oracle is the UNSALTED aggregate — equivalence is the point
    "rel_salted_agg" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sumSql("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
