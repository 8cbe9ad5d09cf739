package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Join-strategy control surface: Spark's join hints are part of the API a
  * user tunes a 100 TB job with (force a broadcast the size estimator
  * missed; force shuffle-hash when a sort-merge's sort is the bottleneck;
  * force sort-merge when the "small" side isn't). Each hint must override
  * the optimizer's default choice — asserted against plans where the
  * default would differ. */
class JoinHintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def orders = graft.Tables(spark, sf, "orders")
  private def cust = graft.Tables(spark, sf, "customer")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("merge hint forces SortMergeJoin where broadcast would be the default") {
    val p = planOf(orders.join(cust.hint("merge"),
      col("o_custkey") === col("c_custkey")))
    assert(p.contains("SortMergeJoin"), p.linesIterator.take(5).mkString("\n"))
  }

  test("shuffle_hash hint forces ShuffledHashJoin") {
    val p = planOf(orders.join(cust.hint("shuffle_hash"),
      col("o_custkey") === col("c_custkey")))
    assert(p.contains("ShuffledHashJoin"), p.linesIterator.take(5).mkString("\n"))
  }

  test("broadcast hint forces BroadcastHashJoin even with broadcast disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = planOf(orders.join(broadcast(cust),
        col("o_custkey") === col("c_custkey")))
      assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(5).mkString("\n"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
