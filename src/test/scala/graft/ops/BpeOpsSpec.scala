package graft.ops

import graft.SparkSpec

/** Value pins for the BPE kernel plus the plan shape of the count query. */
class BpeOpsSpec extends SparkSpec {

  private val rank =
    BpeOps.merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap

  test("known tokenizations under the fixture merge table") {
    // hand-derived: each step merges the lowest-rank pair, leftmost first
    // "another": th(1) -> an(3) -> er(4) => [an, o, th, er]
    assert(BpeOps.tokenCount("another", rank) == 4)
    // "the": th(1) -> the(7) => [the]
    assert(BpeOps.tokenCount("the", rank) == 1)
    // "thing": th(1) -> in(2) -> ing(15) => [th, ing]
    assert(BpeOps.tokenCount("thing", rank) == 2)
    // "and": an(3) -> and(14) => [and]
    assert(BpeOps.tokenCount("and", rank) == 1)
    // "interesting": in, er, es, st, ing merges => [in, t, er, e, st, ing]
    assert(BpeOps.tokenCount("interesting", rank) == 6)
    assert(BpeOps.tokenCount("x", rank) == 1)
    assert(BpeOps.tokenCount("", rank) == 0)
    // no applicable merges: stays character-split
    assert(BpeOps.tokenCount("zzz", rank) == 3)
  }

  test("leftmost-first tie break: repeated pairs merge non-overlapping") {
    // "ananan": an(3) applies leftmost repeatedly -> [an, an, an]; then
    // no (an,an) merge exists -> 3 tokens
    assert(BpeOps.tokenCount("ananan", rank) == 3)
  }

  test("kernel equals the exhaustive-by-rank-order formulation on random words") {
    // Independent formulation: apply each merge IN RANK ORDER, exhausting
    // all its occurrences before moving on. Equivalent to the
    // lowest-pair-first loop because a merge only creates pairs involving
    // its NEW symbol, whose earliest possible rank is higher — so once a
    // rank is exhausted it can never reappear. Random words cross-check
    // the kernel against this formulation (the claim its scaladoc makes).
    def byRankOrder(w: String): Int = {
      var syms = w.map(_.toString).toVector
      for ((l, r) <- BpeOps.merges) {
        var i = 0
        while (i < syms.length - 1) {
          if (syms(i) == l && syms(i + 1) == r)
            syms = syms.patch(i, Vector(l + r), 2) // stay at i: no overlap re-use
          else i += 1
        }
      }
      syms.length
    }
    val rnd = new scala.util.Random(42)
    val alpha = "aeiotnrsdghc" // alphabet rich in merge-table letters
    for (_ <- 1 to 2000) {
      val w = (0 until (1 + rnd.nextInt(12)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(BpeOps.tokenCount(w, rank) == byRankOrder(w),
        s"divergence on '$w'")
    }
  }

  test("fertility: lang rollup conserves the source rollup's token " +
      "totals; every word is at least one token") {
    val sf = "/root/testdata/sf0.001"
    val bySource = BpeOps.queries("text_bpe_count")(spark, sf).collect()
    val byLang = BpeOps.queries("text_tokenizer_fertility")(spark, sf)
      .collect()
    // the same corpus tokenized once, grouped two ways — totals must agree
    assert(bySource.map(_.getAs[Long]("bpe_tokens")).sum
      == byLang.map(_.getAs[Long]("bpe_tokens")).sum)
    assert(bySource.map(_.getAs[Long]("n_words")).sum
      == byLang.map(_.getAs[Long]("n_words")).sum)
    byLang.foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0,
        s"a word cannot tokenize to < 1 token: $r")
      assert(r.getAs[Double]("chars_per_token") >= 1.0,
        s"a token cannot carry < 1 char: $r")
    }
  }

  test("count query: vocab-sized kernel, broadcast join back, no cartesian") {
    val df = BpeOps.queries("text_bpe_count")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"token table must broadcast-join the corpus words:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    val rows = df.collect()
    assert(rows.length == 20 && rows.forall(_.getLong(2) > 0))
  }
}
