package graft.ops

import graft.SparkSpec

/** Pins text_bpe_train's kernel and training invariants. */
class BpeTrainSpec extends SparkSpec {

  test("applyMerge re-scans from the start (runs merge fully)") {
    // continue-after-replacement semantics would miss the second pair
    // (its leading boundary was consumed by the first match)
    assert(BpeOps.applyMerge("l r l r", "l", "r") == "lr lr")
    // overlapping run: leftmost wins, the consumed middle can't re-pair
    assert(BpeOps.applyMerge("a a a", "a", "a") == "aa a")
    // no occurrence: unchanged
    assert(BpeOps.applyMerge("x y", "a", "b") == "x y")
    // merged symbol does not re-match the pair pattern
    assert(BpeOps.applyMerge("ab a b", "a", "b") == "ab ab")
  }

  test("learned merges: dense steps, positive counts, non-increasing max") {
    val rows = graft.SparkEntry
      .queries("text_bpe_train")(spark, "/root/testdata/sf0.001")
      .orderBy("step").collect()
    assert(rows.map(_.getAs[Long]("step")).sameElements(1L to rows.length),
      "steps must be dense 1..N")
    val counts = rows.map(_.getAs[Long]("pair_count"))
    assert(counts.forall(_ > 0), "every learned merge must have support")
    // a merge only removes occurrences of existing pairs and creates
    // pairs bounded by its own count, so the argmax can never grow
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"max pair count grew across steps: ${counts.toList}")
    val pairs = rows.map(r => (r.getAs[String]("l"), r.getAs[String]("r")))
    assert(pairs.distinct.length == pairs.length,
      "the same pair cannot be learned twice (its occurrences were merged)")
  }
}
