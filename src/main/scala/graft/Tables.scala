package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus loaders for /root/testdata/sf*.
  *
  * `events.parquet` carries INT64 TIMESTAMP(NANOS) timestamps, which Spark's
  * parquet reader rejects by default (PARQUET_TYPE_ILLEGAL). We read nanos
  * as long (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a proper
  * TimestampType via integer division — NOT double division, which would
  * lose precision above 2^53 (epoch-nanos in 2024 ≈ 1.7e18).
  */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
