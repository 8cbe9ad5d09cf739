package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adaptive Query Execution as the runtime skew backstop (SURVEY §4.3):
  * SkewOps covers MANUAL salting (for shapes AQE can't split); this spec
  * proves the AUTOMATIC path — a sort-merge join whose probe side piles
  * ~90% of rows onto one key gets its oversized partition split at
  * runtime by OptimizeSkewedJoin, visible as `skew=true` in the final
  * adaptive plan. Thresholds are shrunk so test-scale data trips the
  * optimization; production keeps the defaults (256 MB advisory). */
class AqeSpec extends SparkSpec {

  test("AQE OptimizeSkewedJoin splits the skewed partition at runtime") {
    val s = spark
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> util.Try(s.conf.get(k)).toOption.filter(_ != null))
    try {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      import s.implicits._
      val big = s.range(200000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
          concat(lit("payload_payload_payload_"), col("id")).as("v"))
      val dim = s.range(1000).select(col("id").as("dk"),
        concat(lit("attr"), col("id") % 7).as("attr"))
      val joined = big.join(dim, col("k") === col("dk"))
      // collect() (not count()) so the inspected QueryExecution is the one
      // that ran: count() wraps the join in a NEW plan with its own QE
      val n = joined.collect().length
      assert(n > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a runtime-split skewed join in:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
