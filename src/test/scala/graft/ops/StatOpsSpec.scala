package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Math pins for the round-11 statistical operators — hand-computed
  * fixtures, independent of the DuckDB oracle. */
class StatOpsSpec extends SparkSpec {

  import spark.implicits._

  private def hourTs(h: Int): Timestamp =
    Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h.toLong))

  test("mode: deterministic tie-break picks the smaller value") {
    val d = Seq(("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"))
      .toDF("grp", "v")
    val row = StatOps.mode(d, col("grp"), col("v")).collect().head
    assert(row.getAs[String]("mode_value") == "a") // a and b both count 2
    assert(row.getAs[Long]("mode_cnt") == 2L)
    assert(row.getAs[Long]("n_rows") == 5L)
    assert(math.abs(row.getAs[Double]("mode_share") - 0.4) < 1e-9)
  }

  test("corrRegr: perfect line recovers slope/intercept/corr exactly") {
    // y = 3x + 7 over x = 1..10 — integral, so the exact-sum path is exact
    val d = (1 to 10).map(x => ("g", x.toDouble, (3 * x + 7).toDouble))
      .toDF("grp", "x", "y")
    val row = StatOps.corrRegr(d, col("grp"), col("x"), col("y"))
      .collect().head
    assert(row.getAs[Long]("n") == 10L)
    assert(row.getAs[Double]("slope") == 3.0)
    assert(row.getAs[Double]("intercept") == 7.0)
    assert(row.getAs[Double]("corr") == 1.0)
  }

  test("corrRegr: anti-correlated data gives corr = -1") {
    val d = (1 to 8).map(x => ("g", x.toDouble, (100 - 2 * x).toDouble))
      .toDF("grp", "x", "y")
    val row = StatOps.corrRegr(d, col("grp"), col("x"), col("y"))
      .collect().head
    assert(row.getAs[Double]("slope") == -2.0)
    assert(row.getAs[Double]("corr") == -1.0)
  }

  test("giniImpurity: pure group 0, uniform 2-class 0.5, majority pinned") {
    val d = (Seq.fill(4)(("pure", "en")) ++
      Seq(("mix", "en"), ("mix", "de"), ("mix", "en"), ("mix", "de")))
      .toDF("grp", "cls")
    val got = StatOps.giniImpurity(d, col("grp"), col("cls"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("pure").getAs[Double]("gini") == 0.0)
    assert(got("pure").getAs[String]("top_class") == "en")
    assert(got("mix").getAs[Double]("gini") == 0.5)
    // tie at 2/2 -> smaller class wins deterministically
    assert(got("mix").getAs[String]("top_class") == "de")
    assert(got("mix").getAs[Long]("n_classes") == 2L)
  }

  test("chi2Cells: independent table has zero contribution everywhere") {
    // P(a)P(b) factorizes exactly: counts 10/20 x 30/60 pattern
    val rows = for {
      (a, na) <- Seq(("a1", 1), ("a2", 2)); (b, nb) <- Seq(("b1", 1), ("b2", 3))
      _ <- 1 to na * nb * 5
    } yield (a, b)
    val got = StatOps.chi2Cells(rows.toDF("a", "b"), col("a"), col("b"))
      .collect()
    assert(got.length == 4)
    got.foreach { r =>
      assert(r.getAs[Double]("chi2_contrib") == 0.0,
        s"independent cell must contribute 0: $r")
      assert(r.getAs[Double]("expected") == r.getAs[Long]("observed").toDouble)
    }
  }

  test("chi2Cells: known 2x2 dependence matches the hand formula") {
    // cells: (x,p)=30 (x,q)=10 (y,p)=10 (y,q)=30; n=80, all marginals 40
    val rows = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))
    val got = StatOps.chi2Cells(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // expected each cell = 40*40/80 = 20; contrib = (30-20)^2/20 = 5
    got.values.foreach { r =>
      assert(r.getAs[Double]("expected") == 20.0)
      assert(r.getAs[Double]("chi2_contrib") == 5.0)
    }
  }

  private def ts(m: Int) = Timestamp.valueOf(
    java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(m.toLong))

  test("sequenceMatch: consecutive-only, per-key, ordered by ts") {
    val d = Seq(
      // user 1: view,click,purchase consecutive -> one match
      (1L, ts(0), 10L, "view"), (1L, ts(1), 11L, "click"),
      (1L, ts(2), 12L, "purchase"),
      // user 2: gap (error between click and purchase) -> no match
      (2L, ts(0), 20L, "view"), (2L, ts(1), 21L, "click"),
      (2L, ts(2), 22L, "error"), (2L, ts(3), 23L, "purchase"),
      // user 3: two overlapping funnels share the middle? no — pattern is
      // consecutive triples: v,c,p,c,p gives exactly one match at 30
      (3L, ts(0), 30L, "view"), (3L, ts(1), 31L, "click"),
      (3L, ts(2), 32L, "purchase"), (3L, ts(3), 33L, "click"),
      (3L, ts(4), 34L, "purchase"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = StatOps.sequenceMatch(d, col("user_id"),
        Seq(col("ts"), col("event_id")), col("event_type"),
        col("event_id"), col("ts"), Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSet == Set((1L, 10L, 12L, 120000000L),
      (3L, 30L, 32L, 120000000L)))
  }

  test("theilSen: exact slope on a linear series, robust to one outlier") {
    // user 1: v = 2 * hours -> every pairwise slope = 2/3600 per second...
    // use values per second: ts spaced 1 minute, v = 120*t_minutes so the
    // slope per SECOND is exactly 2.0
    val lin = (0 until 9).map(i => (1L, ts(i), i.toLong, 120.0 * i))
    // user 2: same line but one wild outlier at the end; the MEDIAN slope
    // stays 2.0 (OLS would not)
    val out = (0 until 8).map(i => (2L, ts(i), 100L + i, 120.0 * i)) :+
      (2L, ts(8), 108L, 100000.0)
    val d = (lin ++ out).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeriesOps.theilSen(d, "user_id", "ts", "event_id", "value", 40)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ts_slope")).toMap
    assert(got(1L) == 2.0)
    assert(got(2L) == 2.0, s"median slope must shrug off the outlier: $got")
  }

  test("bigrams: adjacency only, single-token docs dropped") {
    val d = Seq("a b c", "x", "b c").toDF("text")
    val got = CorpusOps.bigrams(d, col("text"))
      .groupBy("bigram").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a b" -> 1L, "b c" -> 2L))
  }

  test("curriculumShards: contiguous shards along the score order") {
    val d = (1L to 10L).map(i => (i, 11L - i)).toDF("doc_id", "n_chars")
    val got = CorpusOps.curriculumShards(d, "n_chars", "doc_id", 4L)
      .collect()
    assert(got.length == 3)
    val s0 = got.find(_.getLong(0) == 0L).get
    // lowest scores first: n_chars 1..4 = doc_ids 10..7
    assert(s0.getAs[Long]("n_docs") == 4L)
    assert(s0.getAs[Long]("min_chars") == 1L)
    assert(s0.getAs[Long]("max_chars") == 4L)
    assert(s0.getAs[Long]("first_doc") == 10L)
    assert(s0.getAs[Long]("last_doc") == 7L)
    val s2 = got.find(_.getLong(0) == 2L).get
    assert(s2.getAs[Long]("n_docs") == 2L)
    assert(s2.getAs[Long]("last_doc") == 1L)
  }

  test("winsorize: bounds are data values, mean clips the outliers") {
    // 20 values 1..19 + one wild 1000: p5 = value at rank ceil(20/20)=1,
    // p95 = value at rank ceil(19*20/20)=19 -> bounds 1.0 and 19.0; the
    // 1000 clips to 19, so the winsorized mean = (190 + 19)/20 = 10.45
    val d = ((1 to 19).map(_.toDouble) :+ 1000.0).map(("g", _)).toDF("grp", "v")
    val row = StatOps.winsorize(d, col("grp"), col("v")).collect().head
    assert(row.getAs[Long]("n") == 20L)
    assert(row.getAs[Double]("p_lo") == 1.0)
    assert(row.getAs[Double]("p_hi") == 19.0)
    assert(row.getAs[Double]("wins_mean") == 10.45)
  }

  test("labelPropagate: two cliques joined by one bridge keep two communities") {
    // triangles {0,1,2} and {10,11,12} + bridge 2-10: after sync rounds
    // each triangle coheres on its min label; the bridge endpoints see a
    // within-clique majority (2 neighbors) vs one cross edge
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L), (10L, 12L),
      (11L, 12L), (2L, 10L)).toDF("src", "dst")
    val got = GraphOps.labelPropagate(e, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(0L, 1L, 2L).map(got) == Set(0L))
    // the right clique coheres on label 2 (the bridge endpoint's round-1
    // min-label leaked across and won the tie) — communities are still
    // exactly the two cliques, which is the property that matters
    assert(Set(10L, 11L, 12L).map(got).size == 1)
    assert(got(10L) != got(0L), "the bridge must not merge the cliques")
  }

  test("ngram novelty query: first doc fully novel, shares monotone sane") {
    val out = CorpusOps.queries("text_ngram_novelty")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val first = out.minBy(_.getLong(0))
    assert(first.getAs[Double]("novelty") == 1.0,
      "the earliest doc's bigrams are all first occurrences by definition")
    out.foreach { r =>
      val nv = r.getAs[Long]("n_novel"); val ng = r.getAs[Long]("n_grams")
      assert(nv >= 0 && nv <= ng)
    }
  }

  test("gapsIslands: rank-difference islands, gaps between them") {
    // keys: 1,2,3  7,8  10 — three islands, lengths 3/2/1
    val d = Seq(1L, 2L, 3L, 7L, 8L, 10L).toDF("k")
    val got = StatOps.gapsIslands(d, col("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSet == Set((1L, 3L, 3L, 3L), (7L, 8L, 2L, 3L),
      (10L, 10L, 1L, 3L)))
  }

  test("decileLift: perfectly score-separated positives max out early lift") {
    // 100 rows, score = id, positives = the 10 HIGHEST scores -> decile 1
    // captures all positives: capture(1) = 1.0, lift(1) = 10.0, and the
    // remaining deciles stay at capture 1.0 with lift decaying as 10/d
    val d = (1L to 100L).map(i => (i.toDouble, i, i > 90L)).toDF("s", "i", "p")
    val got = StatOps.decileLift(d, col("s"), col("i"), col("p"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_rows") == 10L)
    assert(got(1L).getAs[Long]("n_pos") == 10L)
    assert(got(1L).getAs[Double]("capture") == 1.0)
    assert(got(1L).getAs[Double]("lift") == 10.0)
    assert(got(5L).getAs[Double]("capture") == 1.0)
    assert(got(5L).getAs[Double]("lift") == 2.0)
    assert(got(10L).getAs[Double]("lift") == 1.0)
  }

  test("kcore: pendant and tail peel away, the clique survives") {
    // 4-clique {0,1,2,3} + tail 3-4-5: k=3 keeps exactly the clique with
    // core degree 3 each; the tail needs two peel rounds (5 first, then 4)
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = GraphOps.kcore(e, 3, 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("linkPredict: wedge-only candidates, existing edges excluded") {
    // square 1-2-3-4-1: the two diagonals are the only non-adjacent
    // pairs, each sharing BOTH its neighbors -> jaccard 1.0; adjacent
    // pairs must not appear
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = GraphOps.linkPredict(e, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getAs[Double]("jaccard"))).toMap
    assert(got == Map((1L, 3L) -> (2L, 1.0), (2L, 4L) -> (2L, 1.0)))
  }

  test("mannWhitney: separation, symmetry, midranks, degenerate ties") {
    def mw(rows: Seq[(Long, Int, Double)]) =
      StatOps.mannWhitney(rows.toDF("i", "a", "v"),
        col("a") === 1, col("v"), col("i")).collect().head
    // complete separation: sample A strictly below -> U = 0, biserial -1
    val sep = mw((1L to 4L).map(i => (i, 1, i.toDouble)) ++
      (5L to 8L).map(i => (i, 0, 10.0 + i)))
    assert(sep.getAs[Double]("u_stat") == 0.0)
    assert(sep.getAs[Double]("rank_biserial") == -1.0)
    assert(sep.getAs[Double]("z") < -2.0)
    // identical interleaved samples: U = n1 n2 / 2, z = 0
    val sym = mw(Seq((1L, 1, 1.0), (2L, 0, 1.0), (3L, 1, 2.0),
      (4L, 0, 2.0), (5L, 1, 3.0), (6L, 0, 3.0)))
    assert(sym.getAs[Double]("u_stat") == 4.5)
    assert(sym.getAs[Double]("z") == 0.0)
    assert(sym.getAs[Double]("rank_biserial") == 0.0)
    // all-tied pool: varU = 0 -> z NULL, never NaN
    val tied = StatOps.mannWhitney(
      Seq((1L, 1, 5.0), (2L, 0, 5.0), (3L, 1, 5.0), (4L, 0, 5.0))
        .toDF("i", "a", "v"),
      col("a") === 1, col("v"), col("i")).collect().head
    assert(tied.isNullAt(tied.fieldIndex("z")))
    assert(tied.getAs[Double]("u_stat") == 2.0) // midranks: U = n1 n2 / 2
  }

  test("entropyBy: uniform 2-class is ln 2 / norm 1, pure group is 0/0") {
    val d = (Seq.fill(4)(("pure", "en")) ++
      Seq(("mix", "en"), ("mix", "de"), ("mix", "en"), ("mix", "de")))
      .toDF("grp", "cls")
    val got = StatOps.entropyBy(d, col("grp"), col("cls"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("pure").getAs[Double]("entropy") == 0.0)
    assert(got("pure").getAs[Double]("norm_entropy") == 0.0)
    assert(got("pure").getAs[Long]("n_classes") == 1L)
    assert(math.abs(got("mix").getAs[Double]("entropy") - math.log(2.0)) < 2e-6)
    assert(math.abs(got("mix").getAs[Double]("norm_entropy") - 1.0) < 1e-5)
  }

  test("giniConcentration: uniform 0, fully concentrated (n-1)/n") {
    val uni = (1 to 10).map(k => (k.toLong, 5.0)).toDF("k", "v")
    val g0 = StatOps.giniConcentration(uni, col("k"), col("v"))
      .collect().head
    assert(g0.getAs[Long]("n_keys") == 10L)
    assert(g0.getAs[Double]("gini") == 0.0)
    // one key holds everything: G = (n-1)/n = 0.9 (finite-population max)
    val conc = ((1 to 9).map(k => (k.toLong, 0.0)) :+ (10L, 100.0))
      .toDF("k", "v")
    val g1 = StatOps.giniConcentration(conc, col("k"), col("v"))
      .collect().head
    assert(g1.getAs[Double]("gini") == 0.9)
    // multiple rows per key aggregate before ranking
    val multi = (uni.collect().map(r => (r.getLong(0), r.getDouble(1)))
      ++ Seq((1L, 5.0))).toSeq.toDF("k", "v")
    val g2 = StatOps.giniConcentration(multi, col("k"), col("v"))
      .collect().head
    assert(g2.getAs[Long]("n_keys") == 10L)
    assert(g2.getAs[Double]("gini") > 0.0)
  }

  test("basketLift: co-occurring rares lift 2, ubiquitous partner lifts 1") {
    // 4 baskets: {p,q,x} {p,q,x} {r,x} {r,x} — p and q always together
    // (rare pair, lift 2·4/(2·2) = 2); x is in every basket so any pair
    // with x reads lift 1 (ubiquity IS independence); q-r never co-occur
    val rows = Seq(
      (1, "p"), (1, "q"), (1, "x"), (2, "p"), (2, "q"), (2, "x"),
      (3, "r"), (3, "x"), (4, "r"), (4, "x"))
    val got = StatOps.basketLift(rows.toDF("bk", "it"), col("bk"), col("it"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val pq = got(("p", "q"))
    assert(pq.getAs[Long]("n_ab") == 2L)
    assert(pq.getAs[Double]("confidence") == 1.0)
    assert(pq.getAs[Double]("lift") == 2.0)
    assert(pq.getAs[Double]("support") == 0.5)
    val px = got(("p", "x"))
    assert(px.getAs[Double]("lift") == 1.0)
    assert(!got.contains(("q", "r")))
    // duplicate events in a basket must not inflate counts (distinct)
    val dup = StatOps.basketLift(
      (rows ++ Seq((1, "p"), (1, "p"))).toDF("bk", "it"),
      col("bk"), col("it")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_ab"))
      .toMap
    assert(dup(("p", "q")) == 2L)
  }

  test("basketLift: min-support prefilters singleton items out of the " +
      "pair join; sub-support pairs dropped") {
    // y appears in ONE basket (support 1 < minSupport 2): no pair with y
    // may form. p/q appear twice but co-occur only once -> the (p,q)
    // pair is sub-support and dropped from the report.
    val rows = Seq(
      (1, "p"), (1, "q"), (1, "y"),
      (2, "p"), (3, "q"),
      (4, "a"), (4, "b"), (5, "a"), (5, "b"))
    val got = StatOps.basketLift(rows.toDF("bk", "it"), col("bk"), col("it"),
        minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b")))
    // the API DEFAULT (minSupport = 1, the original report-everything
    // contract — r15 restored after the r14 guard work silently flipped
    // it to 2) keeps the support-1 pairs
    val all = StatOps.basketLift(rows.toDF("bk", "it"), col("bk"), col("it"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(all == Set(("a", "b"), ("p", "q"), ("p", "y"), ("q", "y")))
  }

  test("basketLift: a hot basket past maxBasketItems raises in-plan " +
      "instead of exploding one task") {
    // 12 items, each in both baskets (so ALL survive the support
    // prefilter) — with maxBasketItems = 8 the 12-item baskets must
    // REFUSE, not quietly build 66 pairs per basket
    val items = (0 until 12).map(i => f"i$i%02d")
    val rows = for (bk <- Seq(1, 2); it <- items) yield (bk, it)
    val ex = intercept[Exception] {
      StatOps.basketLift(rows.toDF("bk", "it"), col("bk"), col("it"),
        minSupport = 2L, maxBasketItems = 8L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxBasketItems")))
    // the same data passes once the cap admits the basket
    assert(StatOps.basketLift(rows.toDF("bk", "it"), col("bk"), col("it"),
      minSupport = 2L, maxBasketItems = 12L).count() == 66L)
  }

  test("freqItemsets: downward-closed levels with the support filter") {
    // {p,q,r} together in 2 baskets -> the triple and all its subsets
    // are frequent; y is a singleton (support 1) and never appears
    val rows = Seq(
      (1, "p"), (1, "q"), (1, "r"), (1, "y"),
      (2, "p"), (2, "q"), (2, "r"))
    val got = StatOps.freqItemsets(rows.toDF("bk", "it"),
        col("bk"), col("it")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)) -> r.getAs[Long]("support")).toMap
    assert(got((1L, "p", null, null)) == 2L)
    assert(got((2L, "p", "q", null)) == 2L)
    assert(got((3L, "p", "q", "r")) == 2L)
    assert(!got.keys.exists(_._2 == "y"))
    assert(got.size == 3 + 3 + 1) // 3 singles, 3 pairs, 1 triple
  }

  test("freqItemsets: a frequent-items / infrequent-edges basket emits " +
      "no triple (the a-priori L2 prune is semantics-preserving)") {
    // p,q,r all have support >= 2, and {p,q,r} co-occur in basket 1 —
    // but edges (p,r) and (q,r) each co-occur only once, so downward
    // closure forbids any triple. The r15 candidate generation builds
    // triples FROM frequent pairs, so this is also the shape where the
    // old guarded³ join did cubic work for provably-zero output.
    val rows = Seq(
      (1, "p"), (1, "q"), (1, "r"),
      (2, "p"), (2, "q"),
      (3, "r"))
    val got = StatOps.freqItemsets(rows.toDF("bk", "it"),
        col("bk"), col("it")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)) -> r.getAs[Long]("support")).toMap
    assert(!got.keys.exists(_._1 == 3L), s"no triple may survive: $got")
    assert(got((2L, "p", "q", null)) == 2L)
    assert(got.keys.count(_._1 == 2L) == 1) // (p,q) is the only L2 pair
  }

  test("welchTTest: |value| >= 1e12 raises in-plan instead of silently " +
      "NULLing out of the DECIMAL(18,6) moment sums") {
    val bad = Seq(("g", "A", 1.0e12), ("g", "A", 2.0), ("g", "B", 3.0),
      ("g", "B", 4.0), ("g", "A", 5.0), ("g", "B", 6.0))
      .toDF("grp", "arm", "x")
    val ex = intercept[Exception] {
      StatOps.welchTTest(bad, col("grp"), col("arm"), "A", "B",
        col("x")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("1e12")), msgs(ex).mkString("; "))
    // just inside the domain: computes normally
    val ok = StatOps.welchTTest(bad.withColumn("x",
        when(col("x") >= 1.0e12, lit(9.0e11)).otherwise(col("x"))),
      col("grp"), col("arm"), "A", "B", col("x")).collect()
    assert(ok.length == 1)
  }

  test("decisionStump: matches a brute-force threshold search on " +
      "deterministic pseudo-random data") {
    // 60 rows with md5-derived features/labels: the stump's windowed
    // search must find exactly the brute-force minimum over every cent
    // threshold, with the same smaller-threshold tie-break
    val rows = (0 until 60).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      val x = ((h(0) & 0xff) * 256 + (h(1) & 0xff)) / 100.0 // 2 dp domain
      val y = (h(2) & 1) == 1 || x > 300.0 // correlated + noisy
      (x, y)
    }
    val got = StatOps.decisionStump(rows.toDF("x", "y"), col("x"), col("y"))
      .collect().head
    // brute force over distinct cent thresholds
    val cents = rows.map { case (x, y) => (math.floor(x * 100 + 0.5).toLong, y) }
    def gini(n: Long, p: Long): Double = {
      val nd = n.toDouble; val pd = p.toDouble
      1.0 - (pd / nd) * (pd / nd) - ((nd - pd) / nd) * ((nd - pd) / nd)
    }
    val n = cents.size.toLong
    val p = cents.count(_._2).toLong
    val best = cents.map(_._1).distinct.sorted.dropRight(1).map { t =>
      val l = cents.filter(_._1 <= t)
      val nl = l.size.toLong; val pl = l.count(_._2).toLong
      val w = (nl * gini(nl, pl) + (n - nl) * gini(n - nl, p - pl)) / n
      (math.floor(w * 1e6 + 0.5) / 1e6, t)
    }.min
    assert(got.getAs[Double]("gini_split") == best._1, s"$got vs $best")
    assert(got.getAs[Double]("threshold") == best._2 / 100.0,
      s"$got vs $best")
  }

  test("cupedAdjust: matches a brute-force moment computation, and a " +
      "constant pre-metric emits NULL theta (no fit) in-plan") {
    // 8 units, arm = u <= 4; two events per unit (one pre, one post by
    // construction of the ts range); y = 2x + 3·arm — correlated but not
    // perfectly (the arm term), so every output cell is a nontrivial value
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val rows = (1L to 8L).flatMap { u =>
      val arm = u <= 4
      val x = u.toDouble
      val y = 2.0 * u + (if (arm) 3.0 else 0.0)
      Seq(("g", u, ts(1), x), ("g", u, ts(23), y))
    }
    val d = rows.toDF("grp", "u", "ts", "v")
    val got = StatOps.cupedAdjust(d, col("grp"), col("u"), col("u") <= 4L,
      col("ts"), col("v")).collect().head
    // brute-force reference over exact cents
    val per = (1L to 8L).map { u =>
      val arm = if (u <= 4) 1 else 0
      val x = math.floor(u * 100.0 + 0.5).toLong
      val y = math.floor((2.0 * u + (if (u <= 4) 3.0 else 0.0)) * 100.0 + 0.5).toLong
      (arm, x, y)
    }
    val n = per.size.toDouble
    val sx = per.map(_._2).sum.toDouble; val sy = per.map(_._3).sum.toDouble
    val sxx = per.map(p => p._2 * p._2).sum.toDouble
    val syy = per.map(p => p._3 * p._3).sum.toDouble
    val sxy = per.map(p => p._2 * p._3).sum.toDouble
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx; val vary = n * syy - sy * sy
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.getAs[Long]("n_units") == 8L)
    assert(got.getAs[Long]("n_treat") == 4L)
    assert(got.getAs[Double]("theta") == r6d(cov / varx))
    assert(got.getAs[Double]("var_reduction") == r6d(cov * cov / (varx * vary)))
    val nt = 4.0; val nc = 4.0
    val syt = per.filter(_._1 == 1).map(_._3).sum.toDouble
    val sxt = per.filter(_._1 == 1).map(_._2).sum.toDouble
    val diffRaw = (syt / nt - (sy - syt) / nc) / 100.0
    val diffX = (sxt / nt - (sx - sxt) / nc) / 100.0
    assert(got.getAs[Double]("diff_raw") == r6d(diffRaw))
    assert(got.getAs[Double]("diff_cuped") ==
      r6d(diffRaw - (cov / varx) * diffX))

    // degenerate: every unit has the same pre-metric -> varx = 0 -> the
    // fit is undefined; theta/var_reduction/diff_cuped must be NULL
    // (never NaN/Inf), diff_raw still computes
    val flatRows = (1L to 4L).flatMap { u =>
      Seq(("g", u, ts(1), 5.0), ("g", u, ts(23), u.toDouble))
    }
    val f = StatOps.cupedAdjust(flatRows.toDF("grp", "u", "ts", "v"),
      col("grp"), col("u"), col("u") <= 2L, col("ts"), col("v"))
      .collect().head
    Seq("theta", "var_reduction", "diff_cuped").foreach { c =>
      assert(f.isNullAt(f.schema.fieldIndex(c)), s"$c must be NULL: $f")
    }
    assert(!f.isNullAt(f.schema.fieldIndex("diff_raw")))
  }

  test("srmCheck: counts UNITS not events, pins the chi2 hand values, " +
      "flags only past 3.84") {
    // group g: units 1,2,3 in arm A, unit 4 in arm B — unit 1 fires 10
    // events (must still count once). chi2 = (3-2)^2/2 + (1-2)^2/2 = 1.0
    val g = Seq.fill(10)(("g", 1L)) ++
      Seq(("g", 2L), ("g", 3L), ("g", 4L))
    // group h: 8 units in arm A, 0 in arm B -> chi2 = 16/4 + 16/4 = 8 > 3.84
    val h = (10L to 17L).map(u => ("h", u))
    val d = (g ++ h).toDF("grp", "u")
    val got = StatOps.srmCheck(d, col("grp"), col("u"),
        col("u") <= 3L || col("u") >= 10L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("chi2"), r.getAs[Long]("srm"))).toMap
    assert(got("g") == ((3L, 1L, 1.0, 0L)))
    assert(got("h") == ((8L, 0L, 8.0, 1L)))
  }

  test("decisionStump: finds the perfectly separating threshold and " +
      "pins gini to the hand formula") {
    // negatives at 1.0/2.0, positives at 3.0/4.0 -> the cents<=200 split
    // is pure on both sides (gini_split 0); base gini = 0.5
    val d = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("x", "y")
    val r = StatOps.decisionStump(d, col("x"), col("y")).collect().head
    assert(r.getAs[Double]("threshold") == 2.0)
    assert(r.getAs[Double]("gini_split") == 0.0)
    assert(r.getAs[Double]("gini_base") == 0.5)
    assert(r.getAs[Long]("n_left") == 2L && r.getAs[Long]("n_right") == 2L)
    assert(r.getAs[Long]("pos_left") == 0L && r.getAs[Long]("pos_right") == 2L)
    // tie-break: an all-same-label frame scores every split 0 — the
    // SMALLEST threshold must win deterministically
    val flat = Seq((1.0, true), (2.0, true), (3.0, true)).toDF("x", "y")
    val t = StatOps.decisionStump(flat, col("x"), col("y")).collect().head
    assert(t.getAs[Double]("threshold") == 1.0)
  }

  test("decisionStump: NULL features are filtered (engine-consistent), " +
      "and the plan has NO window operator at any domain width") {
    // NULL features can't be routed by a threshold; unfiltered they also
    // sorted differently in Spark (NULLs first) vs DuckDB (NULLs last),
    // silently diverging the cumulative prefixes. The stump over a frame
    // WITH nulls must equal the stump over its non-null subset.
    val withNulls = Seq[(java.lang.Double, Boolean)](
      (1.0, false), (2.0, false), (null, true), (3.0, true),
      (null, false), (4.0, true)).toDF("x", "y")
    val clean = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("x", "y")
    val a = StatOps.decisionStump(withNulls, col("x"), col("y")).collect()
    val b = StatOps.decisionStump(clean, col("x"), col("y")).collect()
    assert(a.toSeq == b.toSeq, s"${a.toSeq} vs ${b.toSeq}")

    // r15 weak flag pin: the cumulative counts and the argmin used to
    // run over Window.orderBy(...) with NO partition key — a
    // single-partition funnel once the feature's value domain is wide
    // (distinct µs latencies ≈ distinct rows). Reworked onto the
    // prefixSums range exchange + TakeOrdered: the plan must contain no
    // window operator AT ALL, wide domain or narrow.
    val wide = (0 until 2000).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      // ~all-distinct cents: a wide value domain, one row per cent
      (((h(0) & 0xff) << 16 | (h(1) & 0xff) << 8 | (h(2) & 0xff)) / 100.0,
        (h(3) & 1) == 1)
    }.toDF("x", "y")
    val plan = StatOps.decisionStump(wide, col("x"), col("y"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"decisionStump must not plan any window operator:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"argmin must be a distributed top-1:\n$plan")
  }

  test("survivalKm: textbook curve with one censored survivor") {
    // lifetimes 0h, 1h, 2h (deaths) + one user still active at corpus
    // end (censored): S = 3/4, then 3/4·2/3 = 1/2, then 1/2·1/2 = 1/4
    def ev(u: Long, h: Int) = (u, hourTs(h), 0.0)
    val d = Seq(ev(0, 0), ev(0, 2), ev(2, 0), ev(2, 1), ev(4, 0),
      ev(6, 0), ev(6, 100)).toDF("user_id", "ts", "value")
    val got = StatOps.survivalKm(d, col("user_id"), col("ts"),
        pmod(col("user_id"), lit(2)))
      .collect().map(r => r.getAs[Long]("t_hours") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_deaths"),
          r.getAs[Double]("survival"))).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got(0L)._1 == 4L && got(0L)._2 == 1L)
    assert(math.abs(got(0L)._3 - 0.75) < 2e-6)
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._3 - 0.5) < 2e-6)
    assert(got(2L)._1 == 2L)
    assert(math.abs(got(2L)._3 - 0.25) < 2e-6)
  }

  test("survivalKm: a time where all remaining die emits exactly 0") {
    // u0 and u2 both die at t=2; the horizon-defining user u4 is
    // censored with lifetime 1 < 2, so it is NOT at risk at t=2:
    // d == n_risk there -> survival must be exactly 0, not ln(0)
    def ev(u: Long, h: Int) = (u, hourTs(h), 0.0)
    val d = Seq(ev(0, 0), ev(0, 2), ev(2, 0), ev(2, 2),
      ev(4, 199), ev(4, 200)).toDF("user_id", "ts", "value")
    val got = StatOps.survivalKm(d, col("user_id"), col("ts"), lit(0L))
      .collect().map(r => r.getAs[Long]("t_hours") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_deaths"),
          r.getAs[Double]("survival"))).toMap
    assert(got.keySet == Set(2L))
    assert(got(2L) == (2L, 2L, 0.0))
  }

  test("benford: digit extraction survives cents scaling; shares sum to 1") {
    // 0.19 -> 19 cents -> digit 1 (scaling by 100 keeps the first
    // significant digit); 912.40 -> digit 9; non-positive rows dropped;
    // 0.004 scales to cents 0 — no significant digit, excluded by the
    // domain gate rather than emitting a meaningless digit-0 bucket
    val d = Seq(0.19, 912.40, 1.0, 25.5, 0.0, -3.0, 0.004).toDF("v")
    val got = StatOps.benford(d, col("v")).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(got.keySet == Set(1, 2, 9))
    assert(got(1).getAs[Long]("observed") == 2L) // 0.19 and 1.0
    assert(got(2).getAs[Long]("observed") == 1L)
    assert(math.abs(got(1).getAs[Double]("benford_expect")
      - math.log10(2.0)) < 1e-12)
    assert(math.abs(got.values.map(_.getAs[Double]("share")).sum - 1.0) < 1e-5)
    // deviation = share - expectation, 6 dp
    val r9 = got(9)
    val want = math.floor((0.25 - math.log10(1.0 + 1.0 / 9)) * 1e6 + 0.5) / 1e6
    assert(r9.getAs[Double]("deviation") == want)
  }

  test("markovTransitions: probabilities row-normalize over lead pairs") {
    // user 1: a->b->a->b (transitions ab, ba, ab); user 2: a->a
    // from a: {b:2, a:1} -> p(a->b)=2/3; from b: {a:1} -> p=1
    val d = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "a"))
      .map { case (u, i, s) => (u, new Timestamp(i * 1000), i, s) }
      .toDF("u", "t", "i", "s")
    val got = StatOps.markovTransitions(d, col("u"), col("t"), col("i"), col("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("p"))).toMap
    assert(got(("a", "b")) == (2L, 0.666667))
    assert(got(("a", "a")) == (1L, 0.333333))
    assert(got(("b", "a")) == (1L, 1.0))
    assert(got.size == 3)
  }

  test("mutualInfo: independent factorized table has MI exactly 0") {
    // counts = row_share x col_share x N exactly -> every PMI term ln(1)=0
    val rows = for {
      (a, ra) <- Seq(("x", 1), ("y", 3))
      (b, cb) <- Seq(("u", 2), ("v", 1))
      _ <- 1 to (ra * cb * 5)
    } yield (a, b)
    val got = StatOps.mutualInfo(rows.toDF("a", "b"), col("a"), col("b"))
    val out = got.collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Double]("pmi_contrib") == 0.0))
    assert(out.forall(_.getAs[Double]("mi_total") == 0.0))
  }

  test("mutualInfo: perfectly dependent 2x2 gives MI = ln 2") {
    // a==b always, uniform: MI = H = ln 2 nats
    val d = (Seq.fill(10)(("x", "x")) ++ Seq.fill(10)(("y", "y")))
      .toDF("a", "b")
    val out = StatOps.mutualInfo(d, col("a"), col("b")).collect()
    assert(out.length == 2)
    val mi = out.head.getAs[Double]("mi_total")
    assert(math.abs(mi - math.log(2.0)) < 1e-6)
  }

  test("cramersV: perfect association 1, independence 0") {
    // a == b always, 2 classes balanced: chi2 = n, V = sqrt(n/n/1) = 1
    val dep = (Seq.fill(10)(("x", "x")) ++ Seq.fill(10)(("y", "y")))
      .toDF("a", "b")
    val r1 = StatOps.cramersV(dep, col("a"), col("b")).collect().head
    assert(r1.getAs[Long]("n") == 20L)
    assert(r1.getAs[Long]("r") == 2L && r1.getAs[Long]("c") == 2L)
    assert(r1.getAs[Double]("v") == 1.0)
    // factorized counts: every cell's contribution is exactly 0
    val ind = (for {
      (a, ra) <- Seq(("x", 1), ("y", 3)); (b, cb) <- Seq(("u", 2), ("v", 1))
      _ <- 1 to (ra * cb * 5)
    } yield (a, b)).toDF("a", "b")
    val r2 = StatOps.cramersV(ind, col("a"), col("b")).collect().head
    assert(r2.getAs[Double]("chi2") == 0.0)
    assert(r2.getAs[Double]("v") == 0.0)
  }

  test("welchTTest: equal samples give t = 0; df matches hand formula") {
    // arm F and arm O identical -> mean diff 0; var 2.5 each at n=5
    val xs = Seq(1L, 2L, 3L, 4L, 6L)
    val d = (xs.map(("g", "F", _)) ++ xs.map(("g", "O", _)))
      .toDF("grp", "arm", "x")
    val row = StatOps.welchTTest(d, col("grp"), col("arm"), "F", "O",
      col("x")).collect().head
    assert(row.getAs[Double]("t_stat") == 0.0)
    assert(row.getAs[Double]("mean_a") == row.getAs[Double]("mean_b"))
    // equal variances/sizes -> Welch df = 2(n-1) = 8
    assert(math.abs(row.getAs[Double]("df") - 8.0) < 1e-6)
  }

  test("welchTTest: groups with an arm below n=2 are dropped, not NaN") {
    val d = Seq(("g1", "F", 1L), ("g1", "F", 2L), ("g1", "O", 5L),
      ("g2", "F", 1L), ("g2", "F", 3L), ("g2", "O", 5L), ("g2", "O", 9L))
      .toDF("grp", "arm", "x")
    val got = StatOps.welchTTest(d, col("grp"), col("arm"), "F", "O",
      col("x")).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("g2"))
  }

  test("kcore: non-convergence within the round budget fails loudly") {
    // a 10-node path peels one layer per round from each end: k=2 empties
    // it in ~5 rounds; budget 2 must throw, not return a half-peeled graph
    val e = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      GraphOps.kcore(e, 2, 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("winsorize: null-boundary groups keep the old per-row " +
      "least/greatest semantics (advisor item)") {
    // group a: 2 nulls out of 20 put the p5 boundary rank on a NULL
    // (p_lo NULL). Old per-row algebra: null rows clip to p_hi
    // (greatest skips the null bound, least applies the high one),
    // non-null rows clip high only. p_hi = value at rank 19 = 17.0;
    // mean = (2*17 + (1+..+17) + 17)/20 = 204/20 = 10.2.
    // group b: all NULL -> mean NULL (sum of nulls).
    // group c: 19 nulls + one value -> both bounds NULL, the value keeps
    // itself unclipped -> 5.0/20.
    val a = (Seq[Option[Double]](None, None) ++
      (1 to 18).map(i => Some(i.toDouble))).map(v => ("a", v))
    val b = Seq.fill(3)(("b", Option.empty[Double]))
    val c = (Seq.fill(19)(Option.empty[Double]) :+ Some(5.0d)).map(v => ("c", v))
    val d = (a ++ b ++ c).toDF("grp", "v")
    val got = StatOps.winsorize(d, col("grp"), col("v")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got("a") == Some(10.2), s"got $got")
    assert(got("b") == None, s"all-null group must stay NULL: $got")
    assert(got("c") == Some(0.25), s"got $got")
  }
}
