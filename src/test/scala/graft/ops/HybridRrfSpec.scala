package graft.ops

import graft.SparkSpec

/** Pins text_hybrid_rrf's reason to exist: a document that both serving
  * paths agree on (present in the lexical AND semantic top-N, even deep in
  * each) outranks documents a single arm ranked first — the consensus
  * property RRF is chosen for. Also pins the fusion arithmetic row-by-row:
  * rrf must equal 1/(K+lex_rk) + 1/(K+vec_rk) with an absent arm
  * contributing zero. */
class HybridRrfSpec extends SparkSpec {

  test("consensus doc wins; rrf arithmetic is exact per row") {
    val rows = graft.SparkEntry
      .queries("text_hybrid_rrf")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty, "hybrid query produced no rows")
    val top = rows.minBy(_.getAs[Long]("rk"))
    assert(!top.isNullAt(top.fieldIndex("lex_rk")) &&
      !top.isNullAt(top.fieldIndex("vec_rk")),
      "top fused doc should be a both-arms consensus hit on this corpus")
    rows.foreach { r =>
      def arm(c: String): Double =
        if (r.isNullAt(r.fieldIndex(c))) 0.0
        else 1.0 / (60 + r.getAs[Long](c))
      val want = BigDecimal(arm("lex_rk") + arm("vec_rk"))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rrf") == want,
        s"row $r: rrf != 1/(60+lex) + 1/(60+vec)")
    }
  }

  test("semantic arm serves from the partition-pruned IVF index") {
    // the serve contract is enforced at build time: servePrunedIndex
    // `require`s the partition filter in the executed plan, so merely
    // BUILDING the query proves the pruned-scan path (a regression to a
    // full-index scan would throw here, not ship)
    val df = graft.SparkEntry
      .queries("text_hybrid_rrf")(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    // and the fused plan reads the index through a parquet scan, not the
    // embeddings table crossJoin the old exact arm used
    assert(plan.contains("graft_hybidx_rrf_"),
      "fused plan should read the persisted hybrid index")
  }

  test("text_hybrid_recall pins the ANN arm's approximation") {
    val rows = graft.SparkEntry
      .queries("text_hybrid_recall")(spark, "/root/testdata/sf0.01")
      .collect()
    val byMethod = rows.map(r =>
      r.getAs[String]("method") -> r.getAs[Double]("recall")).toMap
    assert(byMethod.keySet == Set("fused", "sem"))
    byMethod.foreach { case (m, rec) =>
      assert(rec > 0.0 && rec <= 1.0, s"$m recall out of range: $rec")
    }
  }
}
