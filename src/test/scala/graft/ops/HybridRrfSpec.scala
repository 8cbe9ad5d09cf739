package graft.ops

import graft.SparkSpec

/** Pins text_hybrid_rrf's reason to exist: a document that both serving
  * paths agree on (present in the lexical AND semantic top-N, even deep in
  * each) outranks documents a single arm ranked first — the consensus
  * property RRF is chosen for (pinned on the batch: at least one query's
  * top fused doc is a both-arms hit; per-query ranks are dense). Also pins
  * the fusion arithmetic row-by-row: rrf must equal
  * 1/(K+lex_rk) + 1/(K+vec_rk) with an absent arm contributing zero. */
class HybridRrfSpec extends SparkSpec {

  test("consensus doc wins; rrf arithmetic is exact per row") {
    val rows = graft.SparkEntry
      .queries("text_hybrid_rrf")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty, "hybrid query produced no rows")
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size > 1, "batched hybrid must serve more than one query")
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.sameElements(1L to rs.length),
        s"query $q: fused ranks not dense 1..N")
    }
    val tops = byQ.values.map(_.minBy(_.getAs[Long]("rk")))
    assert(tops.exists(t => !t.isNullAt(t.fieldIndex("lex_rk")) &&
      !t.isNullAt(t.fieldIndex("vec_rk"))),
      "some query's top fused doc should be a both-arms consensus hit")
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
    assert(plan.contains("graft_idx_hybsem_"),
      "fused plan should read the persisted (session-staged) hybrid index")
  }

  test("hybrid consumers share ONE staged index build per session") {
    // rrf and recall declare the same postings identity ("hybsem"), so
    // the second consumer must serve from the files the first one wrote —
    // not write its own O(corpus) copy (the r9 bench regression)
    val dir = "/root/testdata/sf0.01"
    graft.SparkEntry.queries("text_hybrid_rrf")(spark, dir).count()
    val idxRoot = new java.io.File(
      System.getProperty("java.io.tmpdir", "/tmp"))
      .listFiles().filter(_.getName ==
        s"graft_idx_hybsem_${spark.sparkContext.applicationId}")
    assert(idxRoot.length == 1, "exactly one staged hybrid index dir")
    def snapshot(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(idxRoot.head).map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = snapshot()
    graft.SparkEntry.queries("text_hybrid_recall")(spark, dir).count()
    assert(snapshot() == before,
      "recall must read the staged index, not rewrite it")
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
