package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant tests for the training-data operators over sf0.001 (smallest
  * corpus) plus unit tests of the shared tokenization expressions. */
class OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("Tokens.shingles: edge cases (k boundary, empty text, double spaces)") {
    import spark.implicits._
    val got = Seq("a b c d e", "a b", "a b c", "", "x  y z w").toDF("text")
      .select(Tokens.shingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(
      List("a b c", "b c d", "c d e"), // sliding
      List("a b"),                     // shorter than k → whole text
      List("a b c"),                   // exactly k
      List(""),                        // empty text
      List("x  y", " y z", "y z w"))) // empty tokens preserved
  }

  test("Tokens.saltedHash: deterministic, salt-sensitive") {
    import spark.implicits._
    val r = Seq(("w1", "w1"), ("w1", "w2")).toDF("a", "b").select(
      (Tokens.saltedHash(col("a"), 0) === Tokens.saltedHash(col("b"), 0)).as("same0"),
      (Tokens.saltedHash(col("a"), 0) === Tokens.saltedHash(col("a"), 1)).as("cross_salt"))
      .collect()
    assert(r(0).getBoolean(0) && !r(0).getBoolean(1)) // same word: equal within salt, differs across salts
    assert(!r(1).getBoolean(0))                       // different words differ
  }

  test("dedup_exact: groups cover the corpus; keeper is the min doc_id") {
    val d = graft.Tables(spark, sf, "documents")
    val out = DedupOps.queries("dedup_exact")(spark, sf)
    assert(out.agg(sum("n_copies")).head().getLong(0) == d.count())
    assert(out.filter(col("keep_id").isNull).count() == 0)
  }

  test("dedup_minhash_sig: identical texts get identical signatures") {
    val d = graft.Tables(spark, sf, "documents")
    val sig = DedupOps.queries("dedup_minhash_sig")(spark, sf)
    val joined = d.select(col("doc_id"), md5(col("text")).as("fp"))
      .join(sig, "doc_id")
      .groupBy("fp")
      .agg(countDistinct(concat_ws("|",
        (0 until 8).map(i => col(s"mh$i")): _*)).as("nsig"))
    assert(joined.filter(col("nsig") =!= 1).count() == 0)
  }

  test("dedup_lsh_neardup: exact duplicates are found as pairs with jaccard 1") {
    val pairs = DedupOps.queries("dedup_lsh_neardup")(spark, sf)
    assert(pairs.count() > 0)
    assert(pairs.filter(col("jaccard") < 0.8 || col("jaccard") > 1.0).count() == 0)
    assert(pairs.filter(col("d1") >= col("d2")).count() == 0) // canonical order
  }

  test("clusterQuality: a chained cluster reads density 2/3 while a " +
      "clique reads 1.0 — the over-merge flag") {
    import spark.implicits._
    // chain 1~2~3 (1 and 3 never verified together) vs clique 10-11-12
    val vp = Seq(
      (1L, 2L, 0.85), (2L, 3L, 0.82),
      (10L, 11L, 0.95), (10L, 12L, 0.91), (11L, 12L, 0.93))
      .toDF("d1", "d2", "jaccard")
    val got = DedupOps.clusterQualityFrom(vp).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("n_edges"),
          r.getAs[Double]("density"), r.getAs[Double]("min_jaccard"))).toMap
    assert(got.keySet == Set(1L, 10L))
    assert(got(1L) == ((3L, 2L, 0.666667, 0.82)),
      s"chain must flag sub-1 density: ${got(1L)}")
    assert(got(10L)._3 == 1.0 && got(10L)._2 == 3L,
      s"clique must read density 1: ${got(10L)}")
  }

  test("dedup_lsh_curve: coarser bands only lose candidates; r=1 is the " +
      "relative-recall ceiling") {
    val curve = DedupOps.queries("dedup_lsh_curve")(spark, sf)
      .collect().map(r => r.getAs[Long]("r") -> r).toMap
    assert(curve.keySet == Set(1L, 2L, 4L))
    // an r-chunk concatenated bucket collides only if every constituent
    // chunk collides -> candidate sets are nested along r
    assert(curve(1L).getAs[Long]("n_candidates")
      >= curve(2L).getAs[Long]("n_candidates"))
    assert(curve(2L).getAs[Long]("n_candidates")
      >= curve(4L).getAs[Long]("n_candidates"))
    assert(curve(1L).getAs[Long]("n_verified")
      >= curve(2L).getAs[Long]("n_verified"))
    assert(curve(2L).getAs[Long]("n_verified")
      >= curve(4L).getAs[Long]("n_verified"))
    // the union of verified pairs IS r=1's verified set
    assert(curve(1L).getAs[Double]("recall_rel") == 1.0)
    curve.values.foreach { r =>
      assert(r.getAs[Long]("n_bands") * r.getAs[Long]("r") == 8L)
      val p = r.getAs[Double]("precision")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("sim_cosine_topk: k results per query, sims within [-1,1] descending") {
    val out = Similarity.queries("sim_cosine_topk")(spark, sf)
    val perQ = out.groupBy("q_id").agg(count(lit(1)).as("n"),
      max("sim").as("mx"), min("sim").as("mn"))
    assert(perQ.filter(col("n") =!= 5).count() == 0)
    assert(out.filter(abs(col("sim")) > 1.0).count() == 0)
    // rk order agrees with sim order
    val bad = out.as("a").join(out.as("b"),
      col("a.q_id") === col("b.q_id") && col("a.rk") < col("b.rk") &&
        col("a.sim") < col("b.sim"))
    assert(bad.count() == 0)
  }

  test("text_lm_score: log-probs negative, gram count matches text length") {
    val out = TextOps.queries("text_lm_score")(spark, sf)
    assert(out.filter(col("avg_lp") >= 0.0).count() == 0) // every P < 1
    val joined = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).as("len"))
      .join(out, "doc_id")
    assert(joined.filter(col("len") >= 3 &&
      col("n_grams") =!= col("len") - 2).count() == 0)
    assert(out.count() == graft.Tables(spark, sf, "documents").count())
  }

  test("text_lm_score_pruned: model rows bounded by instances/threshold, " +
      "pruning bites, scores dominate the unpruned model's") {
    val g3 = graft.Tables(spark, sf, "documents")
      .select(explode(Tokens.charNgrams(col("text"), 3)).as("g"))
    val c3 = g3.groupBy(col("g")).agg(count(lit(1)).as("c3"))
    val fullModel = c3.count()
    val prunedModel = c3.filter(col("c3") >= TextOps.LM_PRUNE_MIN).count()
    val instances = g3.count()
    // THE bound pruning buys: every kept gram carries >= threshold
    // instances, so model rows <= instances/threshold no matter how much
    // of the corpus's growth is novel vocabulary (the unpruned model has
    // no such bound — BENCH_SF10_SPOT's 100x note)
    assert(prunedModel <= instances / TextOps.LM_PRUNE_MIN)
    assert(prunedModel < fullModel,
      s"threshold ${TextOps.LM_PRUNE_MIN} prunes nothing at this corpus " +
        "— the coalesce backoff path is untested")
    // threshold-ceiling backoff only ever RAISES a gram's count, so the
    // pruned score dominates the full-model score per document
    val p = TextOps.queries("text_lm_score_pruned")(spark, sf)
      .select(col("doc_id"), col("avg_lp").as("lp_pruned"))
    val u = TextOps.queries("text_lm_score")(spark, sf)
      .select(col("doc_id"), col("avg_lp").as("lp_full"))
    assert(p.join(u, "doc_id")
      .filter(col("lp_pruned") < col("lp_full") - 1e-9).count() == 0)
  }

  test("cdcChunks: an inserted prefix still dedups the shared suffix " +
      "(the byte-shift resistance fixed blocks lack)") {
    import spark.implicits._
    // a long deterministic body with multiple content-defined cuts
    val body = (1 to 60).map(i => s"w${i % 17}tok$i").mkString(" ")
    val shifted = Seq((1L, body), (2L, "INSERTED PREFIX " + body))
      .toDF("doc_id", "text")
    val hist = DedupOps.cdcChunks(shifted, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // past the gear state's 32-char memory, both docs chunk identically:
    // shared chunks MUST dominate (fixed-size blocks would share none —
    // every boundary shifts by the prefix length). Exact gear pin: 30
    // chunks recur across the pair (plus intra-doc recurrences at 4/6).
    assert(hist.getOrElse(2L, 0L) == 30L,
      s"shifted pair must share its suffix chunks: $hist")
    // disjoint texts share only trivial short fragments (the stateless
    // gear has no min-chunk clamp, so 1-3-char chunks exist and "to"/"1"
    // style fragments can coincide) — the shared mass must be an order
    // of magnitude below the shifted pair's. Exact pin: 65 singletons,
    // 4 recurring fragments.
    val disjoint = Seq((1L, body), (2L, body.replace("w", "q")))
      .toDF("doc_id", "text")
    val h2 = DedupOps.cdcChunks(disjoint, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h2(1L) == 65L, s"disjoint histogram moved: $h2")
    assert(h2.filter(_._1 >= 2L).values.sum <= 4L,
      s"disjoint texts must share only trivial fragments: $h2")
  }

  test("rakeKeywords: deg/freq scoring, stopword phrase split, tie-break") {
    import spark.implicits._
    // phrases: "big deep learning" (len 3), "deep learning" (2),
    // "fast gpu" (2). deg/freq: big 3/1, deep 5/2, learning 5/2,
    // fast 2/1, gpu 2/1 -> phrase scores 8.0, 5.0, 4.0
    val d = Seq((7L, "big deep learning of deep learning the fast gpu"))
      .toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(d, col("doc_id"), col("text"),
        stops = Seq("of", "the"), k = 3)
      .orderBy(col("rk")).collect()
    assert(got.map(_.getAs[String]("phrase")).toSeq ==
      Seq("big deep learning", "deep learning", "fast gpu"))
    assert(got.map(_.getAs[Double]("score")).toSeq == Seq(8.0, 5.0, 4.0))
    assert(got.map(_.getAs[Long]("n_words")).toSeq == Seq(3L, 2L, 2L))
    // duplicate phrase texts collapse: "deep learning" appears twice in
    // the doc but once in the ranking
    assert(got.length == 3)
  }

  test("dedup_incremental: surviving batch docs are genuinely absent from history") {
    val out = DedupOps.queries("dedup_incremental")(spark, sf)
    val d = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
    assert(out.filter(col("doc_id") % 10 =!= 0).count() == 0)
    val leaked = out.join(d.filter(col("doc_id") % 10 =!= 0).select("fp"), "fp")
    assert(leaked.count() == 0)
    assert(out.filter(col("n_batch") < 1).count() == 0)
  }

  test("text_stats: ratios bounded, token counts positive") {
    val out = TextOps.queries("text_stats")(spark, sf)
    assert(out.filter(col("n_tokens") <= 0).count() == 0)
    assert(out.filter(col("ttr") < 0 || col("ttr") > 1).count() == 0)
    assert(out.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() == 0)
    assert(out.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
  }

  test("dedup_clusters: valid connected components of the near-dup graph") {
    val pairs = DedupOps.queries("dedup_lsh_neardup")(spark, sf).cache()
    val clusters = DedupOps.queries("dedup_clusters")(spark, sf).cache()
    // every doc in a pair is clustered; cluster_id is the component min
    val inPairs = pairs.select(col("d1").as("doc_id"))
      .union(pairs.select(col("d2").as("doc_id"))).distinct()
    assert(clusters.count() == inPairs.count())
    assert(clusters.filter(col("cluster_id") > col("doc_id")).count() == 0)
    // both endpoints of every edge share a cluster
    val viol = pairs
      .join(clusters.select(col("doc_id").as("d1"), col("cluster_id").as("c1")), "d1")
      .join(clusters.select(col("doc_id").as("d2"), col("cluster_id").as("c2")), "d2")
      .filter(col("c1") =!= col("c2"))
    assert(viol.count() == 0)
    pairs.unpersist(); clusters.unpersist()
  }

  test("dedup_simhash_pairs: bounded hamming summary, identical-fp count complete") {
    val out = DedupOps.queries("dedup_simhash_pairs")(spark, sf)
    val rows = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet.subsetOf(Set(0L, 1L, 2L)))
    assert(rows.values.forall(_ > 0))
    // pigeonhole completeness at distance 0: the summary's hamming=0 count
    // must equal the identical-fingerprint pair count
    val sh = DedupOps.queries("dedup_simhash")(spark, sf)
    val dup = sh.as("a").join(sh.as("b"),
      col("a.simhash16") === col("b.simhash16") && col("a.doc_id") < col("b.doc_id"))
    assert(rows.getOrElse(0L, 0L) == dup.count())
  }

  test("rel_window_range: trailing window includes the current order") {
    val out = Relational.queries("rel_window_range")(spark, sf)
    assert(out.filter(col("n_7d") < 1).count() == 0)
    assert(out.filter(col("trailing_7d") < col("o_totalprice")).count() == 0)
  }

  test("text_tfidf_topk: exactly ranks 1..3 per doc, scores descending") {
    val out = TextOps.queries("text_tfidf_topk")(spark, sf)
    val perDoc = out.groupBy("doc_id").agg(
      count(lit(1)).as("n"), min("rk").as("mn"), max("rk").as("mx"))
    assert(perDoc.filter(col("n") =!= 3 || col("mn") =!= 1 || col("mx") =!= 3).count() == 0)
    val bad = out.as("a").join(out.as("b"),
      col("a.doc_id") === col("b.doc_id") && col("a.rk") < col("b.rk") &&
        col("a.tfidf") < col("b.tfidf"))
    assert(bad.count() == 0)
  }

  test("text_split_assign: deterministic, total-preserving, ~90/5/5") {
    val out = SplitOps.queries("text_split_assign")(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total == graft.Tables(spark, sf, "documents").count())
    val bySplit = out.groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("n")).sum)
    assert(bySplit("train").toDouble / total > 0.75) // pseudo-uniform, small corpus
    // assignment is a pure function of doc_id: re-running gives identical rows
    val again = SplitOps.queries("text_split_assign")(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("text_pack_bins: bins contiguous from 0, token totals preserved") {
    val out = TextOps.queries("text_pack_bins")(spark, sf)
    val perLang = out.groupBy("lang").agg(
      min("bin").as("mn"), max("bin").as("mx"),
      countDistinct("bin").as("nb"), sum("sum_tok").as("tot"))
    // bins are 0..max with no gaps
    assert(perLang.filter(col("mn") =!= 0 || col("nb") =!= col("mx") + 1).count() == 0)
    // no tokens lost or invented by the packing
    val totTok = graft.Tables(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n")).agg(sum("n"))
      .head().getLong(0)
    assert(out.agg(sum("sum_tok")).head().getLong(0) == totTok)
  }

  test("mm_frame_sample: frame counts match payload size") {
    val meta = MultimodalOps.queries("mm_decode_meta")(spark, sf)
    val frames = MultimodalOps.queries("mm_frame_sample")(spark, sf)
    val j = meta.select(col("doc_id"), col("n_frames"))
      .join(frames.groupBy("doc_id").agg(count(lit(1)).as("nf")), "doc_id")
    assert(j.filter(col("n_frames") =!= col("nf")).count() == 0)
  }

  test("mm_phash_neardup: every planted re-encode found; dHash survives the retouch") {
    // every doc's two renditions (item ids 2d and 2d+1) must pair within
    // hamming <= 2 — dHash is invariant to the x2 brightness scale, and
    // the two artifact bytes can flip at most the few bits whose pooled
    // cells they touch. Exact content hashing (mm_dedup) finds NONE of
    // these pairs — that gap is the operator's reason to exist.
    val pairs = MultimodalOps.queries("mm_phash_neardup")(spark, sf).cache()
    try {
      val nDocs = graft.Tables(spark, sf, "documents").count()
      val planted = pairs.filter(col("same_doc") &&
        col("d2") === col("d1") + 1 && col("d1") % 2 === 0)
      assert(planted.count() == nDocs,
        s"expected all $nDocs planted re-encode pairs within hamming 2")
      assert(pairs.filter(col("hamming") > 2).count() == 0)
    } finally pairs.unpersist()
  }
}
