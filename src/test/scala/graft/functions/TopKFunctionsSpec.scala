package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKFunctionsSpec extends SparkSpec {

  test("graft_topk: k largest with value-desc/id-asc tie-break, null-safe") {
    import spark.implicits._
    TopKFunctions.register(spark)
    val df = Seq(
      ("a", 5.0, 1L), ("a", 5.0, 0L), ("a", 9.0, 7L), ("a", 1.0, 2L),
      ("a", 9.0, 9L), ("b", 2.0, 4L)).toDF("g", "v", "id")
      .union(Seq(("b", Option.empty[Double], Option(6L))).toDF("g", "v", "id"))
    val out = df.groupBy("g")
      .agg(TopKFunctions.topkBy(col("v"), col("id"), 3).as("top"))
      .select(col("g"), col("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getDouble(0), p.getLong(1))).toList)
      .toMap
    // ties on 9.0 and 5.0 break by smaller id first; null value row dropped
    assert(out("a") == List((9.0, 7L), (9.0, 9L), (5.0, 0L)))
    assert(out("b") == List((2.0, 4L)))
  }

  test("graft_topk: exceeds compaction threshold and partial-merges correctly") {
    import spark.implicits._
    TopKFunctions.register(spark)
    // 10k rows in one group across many partitions forces update-side
    // compaction and partial/final merge paths
    val df = spark.range(10000).select(
      lit("g").as("g"), (col("id") % 997).cast("double").as("v"), col("id").as("id"))
      .repartition(13)
    val out = df.groupBy("g")
      .agg(TopKFunctions.topkBy(col("v"), col("id"), 5).as("top"))
      .select(explode(col("top")).as("p")).select("p.value", "p.id")
      .as[(Double, Long)].collect().toList
    // max v = 996; smallest ids with that v are 996, 1993, 2990, 3987, 4984
    assert(out == List((996.0, 996L), (996.0, 1993L), (996.0, 2990L),
      (996.0, 3987L), (996.0, 4984L)))
  }

  test("rel_topk_agg equals the window formulation") {
    val sf = "/root/testdata/sf0.001"
    val agg = graft.ops.Relational2.queries("rel_topk_agg")(spark, sf)
      .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
    val win = graft.ops.Relational.queries("rel_window_topk")(spark, sf)
      .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
    assert(agg.exceptAll(win).count() == 0 && win.exceptAll(agg).count() == 0)
  }

  test("graft_topk property: equals sort-take for random inputs (incl. ties/NaN)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    TopKFunctions.register(spark)
    val rowGen = Gen.nonEmptyListOf(for {
      v <- Gen.oneOf(Gen.choose(-100.0, 100.0), Gen.const(Double.NaN),
        Gen.const(0.0), Gen.const(1.5))
      id <- Gen.choose(0L, 50L)
    } yield (v, id))
    (1 to 20).foreach { seed =>
      val rows = rowGen(Gen.Parameters.default, Seed(seed.toLong)).getOrElse(Nil)
      val k = 1 + seed % 10
      val got = rows.toDF("v", "id").repartition(5)
        .agg(TopKFunctions.topkBy(col("v"), col("id"), k).as("top"))
        .select(explode(col("top")).as("p")).select("p.value", "p.id")
        .as[(Double, Long)].collect().toList
      // reference: total order value DESC (NaN greatest), id ASC
      val expect = rows.sortWith { (a, b) =>
        val c = java.lang.Double.compare(b._1, a._1)
        c < 0 || (c == 0 && a._2 < b._2)
      }.take(k)
      assert(got.map(t => (java.lang.Double.doubleToLongBits(t._1), t._2)) ==
        expect.map(t => (java.lang.Double.doubleToLongBits(t._1), t._2)),
        s"seed=$seed k=$k rows=$rows")
    }
  }

  test("graft_topk also callable from SQL") {
    TopKFunctions.register(spark)
    graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .createOrReplaceTempView("orders_topk_sql")
    val r = spark.sql(
      """SELECT o_orderstatus, graft_topk(o_totalprice, o_orderkey, 2) AS top
        |FROM orders_topk_sql GROUP BY o_orderstatus""".stripMargin)
      .collect()
    assert(r.nonEmpty && r.forall(_.getSeq[Any](1).size == 2))
  }
}
