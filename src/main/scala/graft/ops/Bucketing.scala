package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities — the co-located-join path for repeated
  * fact-to-fact joins (SURVEY §4.3 / the 100 TB posture).
  *
  * A shuffle join of two 100 TB fact tables moves both tables over the
  * network every query. Writing them bucketed (and sorted) by the join key
  * makes every subsequent equi-join on that key shuffle-free: each task
  * reads bucket i of both sides and merge-joins locally. The write-side
  * shuffle is paid once, amortized over every downstream join/aggregation
  * keyed the same way.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equi-join two tables previously bucketed on `key` — planned with no
    * shuffle exchange on either side (verify with PlanSpec / explain). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
