package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for the MMR diversified re-ranker — hand fixtures,
  * independent of the DuckDB oracle (which replays the same greedy
  * ladder; these pin that the ladder implements MMR). */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  // q 0 candidates: c1 most relevant; c2 nearly as relevant but almost
  // identical to c1; c3 less relevant but diverse. λ=0.5 →
  //   step 1: c1 (rel 0.9)
  //   step 2: c2 scores .5·.88 − .5·.99 = −0.055; c3 scores
  //           .5·.60 − .5·.10 = 0.25 → c3 wins despite lower relevance
  //   step 3: only c2 remains
  private def cand =
    Seq((0L, 1L, 0.9), (0L, 2L, 0.88), (0L, 3L, 0.6))
      .toDF("q_id", "vec_id", "rel")

  private def pairs =
    Seq((0L, 1L, 2L, 0.99), (0L, 2L, 1L, 0.99),
      (0L, 1L, 3L, 0.10), (0L, 3L, 1L, 0.10),
      (0L, 2L, 3L, 0.12), (0L, 3L, 2L, 0.12))
      .toDF("q_id", "a_id", "b_id", "psim")

  test("mmrSelect: redundancy penalty promotes the diverse candidate") {
    val got = Similarity.mmrSelect(cand, pairs, 3, 0.5)
      .orderBy(col("step")).collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 3L, 2L))
    val s2 = got(1)
    assert(s2.getAs[Double]("maxsim") == 0.10) // to c1 only
    assert(math.abs(s2.getAs[Double]("mmr") - 0.25) < 1e-9)
    // step 3's maxsim is against BOTH selected: max(0.99 to c1... ) —
    // c2's max sim over {c1, c3} = 0.99
    assert(got(2).getAs[Double]("maxsim") == 0.99)
  }

  test("mmrSelect: λ=1 degenerates to pure relevance ranking") {
    val got = Similarity.mmrSelect(cand, pairs, 3, 1.0)
      .orderBy(col("step")).collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 3L))
  }

  test("mmrSelect: matches a brute-force greedy reference on hash data") {
    // deterministic pseudo-random pools (no RNG — hash arithmetic), 3
    // queries x 12 candidates, full pair matrix; the dataflow must pick
    // exactly what a sequential in-memory greedy picks
    def rel(q: Long, c: Long): Double = ((q * 31 + c * 17) % 97) / 97.0
    def psim(q: Long, a: Long, b: Long): Double =
      (((q * 7 + a * 13 + b * 13) % 89) / 89.0 + 0.0) // symmetric in (a,b)
    val qs = 0L until 3L
    val cs = 0L until 12L
    val cand = (for (q <- qs; c <- cs) yield (q, c, rel(q, c)))
      .toDF("q_id", "vec_id", "rel")
    val pairs = (for (q <- qs; a <- cs; b <- cs if a != b)
      yield (q, a, b, psim(q, a, b))).toDF("q_id", "a_id", "b_id", "psim")
    val lam = 0.7
    val k = 5
    val got = Similarity.mmrSelect(cand, pairs, k, lam)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // in-memory greedy reference
    for (q <- qs) {
      var selected = Vector.empty[Long]
      for (step <- 1 to k) {
        val remaining = cs.filterNot(selected.contains)
        val best = remaining.minBy { c =>
          val ms = if (selected.isEmpty) 0.0
            else selected.map(s => psim(q, c, s)).max
          val score = lam * rel(q, c) - (1.0 - lam) * ms
          (-score, c) // max score, then min vec_id
        }
        assert(got((q, step.toLong)) == best,
          s"q=$q step=$step: dataflow ${got((q, step.toLong))} vs ref $best")
        selected :+= best
      }
    }
  }

  test("mmrSelect: sparse pair frame — a candidate with NO pair row to " +
      "the selected set scores maxsim 0 and wins, not vanishes") {
    // c4 has no pair rows at all (the "only nonzero sims stored"
    // representation): after c1 is picked, c4's max-sim to the selected
    // set is 0 — the MOST diverse candidate. An inner join would drop it
    // from every later step; the left join must PREFER it at step 2
    // (score .5·.55 − .5·0 = 0.275 beats c3's 0.25 and c2's −0.055).
    val c = cand.unionByName(Seq((0L, 4L, 0.55)).toDF("q_id", "vec_id", "rel"))
    val got = Similarity.mmrSelect(c, pairs, 4, 0.5)
      .orderBy(col("step")).collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 4L, 3L, 2L))
    assert(got(1).getAs[Double]("maxsim") == 0.0)
  }

  test("matryoshka recall: bounded, K-capped, more dims no worse on average") {
    val got = Similarity.queries("sim_matryoshka_recall")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.length == 24) // 3 truncations x 8 queries
    got.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hits") <= 5L)
    }
    def mean(d: Int) = got.filter(_.getInt(0) == d)
      .map(_.getAs[Double]("recall")).sum / 8.0
    // on the deterministic corpus the curve is monotone in expectation
    assert(mean(32) >= mean(8),
      s"mean recall should not degrade with more dims: ${mean(8)} vs ${mean(32)}")
  }

  test("sim_recall_curve: bounded, and its k=5 point equals " +
      "sim_ann_recall's ivf aggregate") {
    val dir = "/root/testdata/sf0.001"
    val curve = Similarity.queries("sim_recall_curve")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("recall"))).toMap
    assert(curve.keySet == Set(1L, 3L, 5L))
    curve.foreach { case (k, (nq, h, rec)) =>
      assert(h <= k * nq && rec >= 0.0 && rec <= 1.0, s"k=$k: $h, $rec")
    }
    val ivf5 = Similarity.queries("sim_ann_recall")(spark, dir)
      .filter(col("method") === "ivf")
      .agg(sum(col("n_hits"))).collect().head.getLong(0)
    assert(curve(5L)._2 == ivf5,
      s"curve k=5 hits ${curve(5L)._2} != sim_ann_recall ivf total $ivf5")
  }

  test("sim_ivf_imbalance: internally consistent cell-population stats") {
    val dir = "/root/testdata/sf0.001"
    val r = Similarity.queries("sim_ivf_imbalance")(spark, dir)
      .collect().head
    val (nc, nv) = (r.getAs[Long]("n_cells"), r.getAs[Long]("n_vectors"))
    assert(nc >= 1 && nv >= nc)
    assert(r.getAs[Long]("max_cell") >= r.getAs[Long]("min_cell"))
    // load_factor >= 1 by definition (max >= mean), cv >= 0
    assert(r.getAs[Double]("load_factor") >= 1.0)
    assert(r.getAs[Double]("cv") >= 0.0)
    // the index it describes: every assigned corpus vector is counted
    val assigned = Similarity.queries("sim_ann_ivf")(spark, dir)
    assert(assigned.select(col("vec_id")).distinct().count() <= nv)
  }

  test("recallCurve: zero truth∩serve overlap emits the 3-row recall-0 " +
      "curve, not an empty frame") {
    // r15 (per advisor): the inner-join shape returned ZERO rows on a
    // total recall collapse — indistinguishable from a missing query
    val truth = Seq((0L, 10L, 1), (0L, 11L, 2), (1L, 12L, 1))
      .toDF("q_id", "vec_id", "trk")
    val ann = Seq((0L, 99L, 1), (1L, 98L, 1))
      .toDF("q_id", "vec_id", "ark")
    val got = Similarity.recallCurve(spark, truth, ann).collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 2L)
      assert(r.getAs[Long]("n_hits") == 0L)
      assert(r.getAs[Double]("recall") == 0.0)
    }
    // and EMPTY truth: still 3 rows, recall NULL (0/0 stays out of the
    // engines' divergent NaN semantics)
    val none = Similarity.recallCurve(spark,
      truth.filter(lit(false)), ann.filter(lit(false))).collect()
    assert(none.length == 3)
    none.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 0L && r.isNullAt(3))
    }
  }

  test("mmrSelect: per-query independence and the vec_id tie-break") {
    // q 1: two candidates with equal rel and equal redundancy — the
    // smaller vec_id must win step 2 deterministically
    val c = cand.unionByName(
      Seq((1L, 7L, 0.5), (1L, 9L, 0.8), (1L, 5L, 0.5))
        .toDF("q_id", "vec_id", "rel"))
    val p = pairs.unionByName(
      Seq((1L, 7L, 9L, 0.2), (1L, 9L, 7L, 0.2),
        (1L, 5L, 9L, 0.2), (1L, 9L, 5L, 0.2),
        (1L, 5L, 7L, 0.0), (1L, 7L, 5L, 0.0))
        .toDF("q_id", "a_id", "b_id", "psim"))
    val got = Similarity.mmrSelect(c, p, 2, 0.5)
      .filter(col("q_id") === 1L).orderBy(col("step")).collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(9L, 5L))
    // q 0's picks are unaffected by q 1's rows
    val q0 = Similarity.mmrSelect(c, p, 2, 0.5)
      .filter(col("q_id") === 0L).orderBy(col("step")).collect()
    assert(q0.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 3L))
  }
}
