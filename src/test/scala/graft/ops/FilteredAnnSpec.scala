package graft.ops

import graft.SparkSpec

/** Pins sim_ann_filtered's reason to exist: PRE-filtering (predicate
  * applied to the probed candidates before the top-K window) returns the
  * full K survivors per query wherever K survivors exist, while the naive
  * POST-filter of the unfiltered top-K (`post_n`) under-returns. On the
  * sf0.01 corpus every query has >= K filtered candidates in its probed
  * cells, so rows-per-query and the strict post_n < K inequality are both
  * deterministic. */
class FilteredAnnSpec extends SparkSpec {

  test("pre-filter returns K rows per query; post-filter under-returns") {
    val rows = graft.SparkEntry
      .queries("sim_ann_filtered")(spark, "/root/testdata/sf0.01")
      .collect()
    val perQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(perQ.nonEmpty, "no queries produced output")
    perQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q returned ${rs.length} rows, want K=5")
      // every returned row satisfies the predicate
      assert(rs.forall(_.getAs[Int]("label") % 3 == 0),
        s"query $q returned a row violating the predicate")
      // ranks are dense 1..K among survivors
      assert(rs.map(_.getAs[Int]("rk")).sorted.sameElements(1 to 5),
        s"query $q ranks are not dense 1..5")
    }
    // the measured under-return: for at least one query the unfiltered
    // top-K keeps fewer than K predicate rows (on this corpus: all of them)
    val postNs = perQ.values.map(_.head.getAs[Long]("post_n"))
    assert(postNs.exists(_ < 5),
      s"post-filter never under-returned (post_n values: ${postNs.toList})")
  }
}
