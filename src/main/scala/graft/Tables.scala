package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus loaders for /root/testdata/sf*.
  *
  * `events.ts` has shipped with different physical types across driver
  * corpus generations — INT64 TIMESTAMP(NANOS) (which Spark's parquet
  * reader rejects by default, PARQUET_TYPE_ILLEGAL) and native
  * TIMESTAMP(MICROS) without timezone (TIMESTAMP_NTZ). Both are
  * normalized here to one canonical TimestampType so every consumer
  * (batch windows, `unix_micros`, streaming watermarks — which reject
  * NTZ outright) sees a single type regardless of corpus vintage:
  * nanos are read as long (`spark.sql.legacy.parquet.nanosAsLong`) and
  * converted via integer division — NOT double division, which would
  * lose precision above 2^53 (epoch-nanos in 2024 ≈ 1.7e18) — and NTZ
  * is cast, value-preserving under the pinned UTC session timezone.
  */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Scan rebalanced across all cores. The test corpus writes each table as
    * ONE parquet row group, so the scan arrives as a single partition and
    * any expression-heavy projection directly above it runs single-threaded
    * until the first shuffle. A production 100 TB table has thousands of
    * files/row groups and scans parallel natively — this rebalance exists
    * purely to restore that parallelism on single-split inputs, and costs
    * one shuffle of only the pruned columns (projection/filter pushdown
    * still reach the scan below the exchange).
    *
    * Hash-partitioned on the table's unique key, NOT round-robin:
    * `repartition(n)` binary-sorts every row before exchanging
    * (sortBeforeRepartition, for retry determinism), which on a single
    * input partition is a single-threaded whole-table sort — the exact
    * bottleneck this helper removes. Hash exchange needs no such sort.
    *
    * Use for compute-heavy per-row kernels (hashing, shingling, vector
    * math); plain filter/agg queries go straight to `apply`, whose first
    * shuffle parallelizes them anyway. */
  def balanced(spark: SparkSession, dir: String, name: String,
               key: String): DataFrame =
    apply(spark, dir, name)
      .repartition(spark.sparkContext.defaultParallelism, col(key))

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", normalizeTs(raw.schema("ts").dataType, col("ts")))
  }

  /** ts-column normalization shared by the batch loader and the streaming
    * file source (StreamOps.eventsStream): any corpus vintage → TIMESTAMP.
    * The nanos branch needs SQL integer division (Column `/` is double
    * division and loses epoch-nano precision above 2^53), built from the
    * PASSED column via the registered `div` function so any caller's
    * column expression is honored, not just one literally named `ts`. */
  def normalizeTs(physical: org.apache.spark.sql.types.DataType,
                  ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    physical match {
      case LongType => timestamp_micros(call_function("div", ts, lit(1000L)))
      case TimestampType => ts
      case _ => ts.cast(TimestampType)
    }
  }
}
