package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant tests for the round-2 relational / format operators over
  * sf0.001 (oracle equivalence is the driver gate; these check structural
  * invariants and plan shapes). */
class Relational2Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("rel_grouping_sets: per-set totals agree with the grand total") {
    val out = Relational2.queries("rel_grouping_sets")(spark, sf).collect()
    val grand = out.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1)
    val total = grand.head.getAs[Long]("n_supp")
    // region-level rows (gid 1: nation aggregated away) sum to the total
    assert(out.filter(_.getAs[Long]("gid") == 1L).map(_.getAs[Long]("n_supp")).sum == total)
    // finest level too
    assert(out.filter(_.getAs[Long]("gid") == 0L).map(_.getAs[Long]("n_supp")).sum == total)
  }

  test("prefixSums: running sums and totals equal the single-partition " +
      "window reference on a shuffled multi-partition frame") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // md5-shuffled keys so the range exchange genuinely reorders rows
    val rows = (0 until 500).map { i =>
      (i.toLong, (i * 7 % 13).toLong, (i % 5 + 1).toLong)
    }
    val df = rows.toDF("k", "a", "b").repartition(7)
    val got = Relational2.prefixSums(df, Seq(col("k")), Seq("a", "b"))
      .select(col("k"), col("__cum_a"), col("__cum_b"),
        col("__tot_a"), col("__tot_b"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = rows.toDF("k", "a", "b")
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("ca"), r.getAs[Long]("cb"))).toMap
    val ta = rows.map(_._2).sum; val tb = rows.map(_._3).sum
    assert(got.size == 500)
    rows.foreach { case (k, _, _) =>
      assert(got(k)._1 == ref(k)._1 && got(k)._2 == ref(k)._2, s"k=$k")
      assert(got(k)._3 == ta && got(k)._4 == tb)
    }
  }

  test("rel_unpivot: 3 measure rows per source row, values preserved") {
    val src = graft.Tables(spark, sf, "lineitem").filter(col("l_orderkey") % 500 === 0)
    val out = Relational2.queries("rel_unpivot")(spark, sf)
    assert(out.count() == 3 * src.count())
    val qtySum = out.filter(col("measure") === "quantity").agg(sum("val")).head().getDouble(0)
    assert(math.abs(qtySum - src.agg(sum("l_quantity")).head().getDouble(0)) < 1e-9)
  }

  test("rel_scalar_subquery: max_order matches a groupBy computation") {
    val out = Relational2.queries("rel_scalar_subquery")(spark, sf)
    val expected = graft.Tables(spark, sf, "orders")
      .groupBy(col("o_custkey")).agg(max("o_totalprice").as("m"), count(lit(1)).as("c"))
    val j = out.join(expected, col("c_custkey") === col("o_custkey"), "left")
    assert(j.filter(col("max_order") =!= col("m")).count() == 0)
    assert(j.filter(col("n_orders") =!= coalesce(col("c"), lit(0L))).count() == 0)
  }

  test("rel_range_join: bucketized counts equal the naive theta join") {
    val ev = graft.Tables(spark, sf, "events")
    val w = ev.filter(col("event_id") % 997 === 0)
      .select(col("event_id").as("win_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 4 HOURS")).as("w_end"))
    val naive = ev.crossJoin(w)
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy("win_id").agg(count(lit(1)).as("n_naive"))
    val out = Relational2.queries("rel_range_join")(spark, sf)
    assert(out.join(naive, "win_id").filter(col("n_events") =!= col("n_naive")).count() == 0)
    assert(out.count() == naive.count())
  }

  test("rel_range_join plan: equi join on the hour bucket, not a nested loop") {
    val plan = Relational2.queries("rel_range_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("rel_moments: agrees with built-in var_samp within float tolerance") {
    val out = Relational2.queries("rel_moments")(spark, sf)
    val builtin = graft.Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(var_samp("l_quantity").as("v"), corr("l_quantity", "l_extendedprice").as("r"))
    val j = out.join(builtin, "l_returnflag").collect()
    j.foreach { row =>
      assert(math.abs(row.getAs[Double]("var_qty") - row.getAs[Double]("v")) < 1e-6)
      assert(math.abs(row.getAs[Double]("corr_qp") - row.getAs[Double]("r")) < 1e-6)
    }
  }

  test("rel_map_funcs: n_click consistent with per-type rows") {
    val out = Relational2.queries("rel_map_funcs")(spark, sf)
    val clicks = out.filter(col("event_type") === "click")
      .select(col("user_id"), col("n"))
    val j = out.join(clicks.withColumnRenamed("n", "n2"), Seq("user_id"), "left")
    assert(j.filter(col("n_click") =!= coalesce(col("n2"), lit(0L))).count() == 0)
  }

  test("src_csv_roundtrip and src_jsonl_roundtrip: lossless vs direct aggregation") {
    val csv = FormatOps.queries("src_csv_roundtrip")(spark, sf)
    val direct = graft.Tables(spark, sf, "orders")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_direct"))
    assert(csv.join(direct, "o_orderpriority")
      .filter(col("n") =!= col("n_direct")).count() == 0)
    val jl = FormatOps.queries("src_jsonl_roundtrip")(spark, sf)
    val directE = graft.Tables(spark, sf, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n_direct"))
    assert(jl.join(directE, "event_type")
      .filter(col("n") =!= col("n_direct")).count() == 0)
  }

  test("src_partitioned_pruned: partition filter reaches the scan") {
    val q = FormatOps.queries("src_partitioned_pruned")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderstatus"), plan.take(2000))
  }

  test("sim_ann_ivf: 5 ranked hits per query with sims matching brute force") {
    val ivf = Similarity.queries("sim_ann_ivf")(spark, sf)
    val bf = Similarity.queries("sim_cosine_topk")(spark, sf)
      .select(col("q_id"), col("vec_id"), col("sim").as("bf_sim"))
    // per-query: exactly K ranked rows, descending sim
    val perQ = ivf.groupBy("q_id").agg(count(lit(1)).as("k"),
      max("rk").as("maxrk")).collect()
    perQ.foreach { r => assert(r.getAs[Long]("k") == 5 && r.getAs[Int]("maxrk") == 5) }
    // a (q, cand) pair scored by IVF must carry the same exact sim the
    // brute-force scorer computes (only membership may differ)
    val both = ivf.join(bf, Seq("q_id", "vec_id"))
    assert(both.filter(col("sim") =!= col("bf_sim")).count() == 0)
  }

  test("stream_static_join and stream_stream_join equal their batch forms") {
    val ss = graft.streaming.StreamOps.queries("stream_static_join")(spark, sf)
    val cust = graft.Tables(spark, sf, "customer")
    val batch = graft.Tables(spark, sf, "events")
      .join(cust, col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type").agg(count(lit(1)).as("n_b"))
    assert(ss.join(batch, Seq("c_mktsegment", "event_type"))
      .filter(col("n") =!= col("n_b")).count() == 0)
    assert(ss.count() == batch.count())

    val sj = graft.streaming.StreamOps.queries("stream_stream_join")(spark, sf)
    val ev = graft.Tables(spark, sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vu"), col("ts").as("vts"))
    val batchJoin = clicks.join(views,
      col("user_id") === col("vu") &&
        col("vts") >= col("cts") - expr("INTERVAL 10 MINUTES") &&
        col("vts") <= col("cts") + expr("INTERVAL 10 MINUTES"))
    assert(sj.count() == batchJoin.count())
  }

  test("targetEncode: LOO mean excludes own row, singleton falls back to prior") {
    import spark.implicits._
    // category a: targets 10, 20, 30 -> LOO means 25, 20, 15;
    // category b: singleton -> global prior (10+20+30+100)/4 = 40
    val d = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 4L, 100.0)).toDF("cat", "id", "t")
    val out = Relational2.targetEncode(d, "cat", "t")
      .select(col("id"), col("loo_enc"), col("is_fallback"))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("loo_enc"), r.getAs[Long]("is_fallback"))).toMap
    assert(out(1L) == (25.0, 0L) && out(2L) == (20.0, 0L) &&
      out(3L) == (15.0, 0L))
    assert(out(4L) == (40.0, 1L), "singleton must take the global prior")
  }

  test("text_repetition: rates in [0,1]; text_zipf: ranks 1..25 share-ordered") {
    val rep = TextOps.queries("text_repetition")(spark, sf).collect()
    rep.foreach { r =>
      val d = r.getAs[Double]("avg_dup_2gram")
      assert(d >= 0.0 && d <= 1.0)
    }
    val zipf = TextOps.queries("text_zipf")(spark, sf).collect()
    assert(zipf.map(_.getAs[Long]("rank")).toList == (1L to 25L).toList)
    val shares = zipf.map(_.getAs[Double]("share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
  }
}
