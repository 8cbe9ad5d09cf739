package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic pins for the round-3 generic operators exposed on the API
  * surface (the oracle checks their query instantiations end-to-end; these
  * tests pin the INVARIANTS of the generics on other inputs). */
class GenericOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("scd2History: one current version per key, chains link exactly") {
    import spark.implicits._
    val hist = graft.Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").as("valid_from"))
      .scd2History("o_custkey", "valid_from", "o_orderkey")
    val perKey = hist.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_current"), 1L).otherwise(0L)).as("n_current"),
        sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_open"))
    assert(perKey.filter(col("n_current") =!= 1L || col("n_open") =!= 1L)
      .count() == 0)
    // every non-current version's valid_to equals some version's
    // valid_from of the same key (the chain has no gaps)
    val closes = hist.filter(!col("is_current"))
      .select(col("o_custkey"), col("valid_to"))
    val opens = hist.select(col("o_custkey"),
      col("valid_from").as("valid_to")).distinct()
    assert(closes.join(opens, Seq("o_custkey", "valid_to"), "left_anti")
      .count() == 0)
  }

  test("cdcApply: delete-last keys vanish, others carry the latest attr") {
    import spark.implicits._
    val changes = Seq(
      (1L, "I", 10.0, 1L), (1L, "U", 11.0, 2L),          // key 1 -> U 11.0
      (2L, "I", 20.0, 1L), (2L, "D", 0.0, 2L),           // key 2 -> deleted
      (3L, "D", 0.0, 1L), (3L, "I", 30.0, 2L)            // key 3 -> I 30.0 (D not last)
    ).toDF("k", "op", "attr", "v")
    val out = changes.cdcApply("k", "op", Seq("attr"), Seq("v"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "U", 11.0), (3L, "I", 30.0)))
  }

  test("pagerank: deterministic across runs and mass-conserving") {
    import spark.implicits._
    val edges = graft.Tables(spark, sf, "lineitem")
      .select((col("l_orderkey") % 100).as("src"),
        (col("l_partkey") % 100).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist()
    val a = edges.pagerank(2).orderBy("node")
      .as[(Long, Long, Double)].collect().toSeq
    val b = edges.pagerank(2).orderBy("node")
      .as[(Long, Long, Double)].collect().toSeq
    edges.unpersist()
    assert(a == b, "fixed-point ranks must be bit-identical across runs")
    val mass = a.map(_._2).sum
    // floor divisions only lose units: total mass in (0.9, 1.0] * SCALE
    assert(mass <= 1000000000000000L && mass > 900000000000000L, s"mass=$mass")
  }

  test("expectations: n_checked is the row count, violations bounded") {
    import spark.implicits._
    val rep = graft.Tables(spark, sf, "orders")
      .expectations(Seq(
        "impossible" -> lit(false),
        "always" -> lit(true),
        "some" -> (col("o_totalprice") > 200000.0)))
      .orderBy("rule").as[(String, Long, Long)].collect().toSeq
    val n = graft.Tables(spark, sf, "orders").count()
    assert(rep.map(_._2).forall(_ == n))
    val byRule = rep.map(r => r._1 -> r._3).toMap
    assert(byRule("impossible") == 0L && byRule("always") == n)
    assert(byRule("some") > 0L && byRule("some") < n)
  }

  test("proximityPairs generic: finds the planted pair, no self-pairs") {
    import spark.implicits._
    val pts = Seq(
      (1L, 10.001, 20.001), (2L, 10.002, 20.002),  // ~0.0014 apart
      (3L, -9.999, 20.001), (4L, 10.5, 20.5)       // isolated
    ).toDF("id", "la", "lo")
    val pairs = pts.proximityPairs(col("id"), col("la"), col("lo"), 0.05)
      .select("e1", "e2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
