package graft.ops

import graft.SparkSpec

/** Pins sim_ann_delete's reason to exist beyond the oracle's exact-value
  * gate: the DV anti-mask must actually BITE (the undeleted serve returns
  * top-K rows that the deleted serve may not), and no deleted id may ever
  * appear. The query's own requires pin the in-path lifecycle mechanics
  * (metadata-only delete commit via file state, partition-pruned serve);
  * the compaction MoR ≡ CoW equivalence is pinned HERE — it is invariant
  * per corpus, so proving it on every query invocation (serving twice and
  * collecting both) doubled the query's steady cost for no information
  * (the r13 hygiene item). */
class AnnDeleteSpec extends SparkSpec {

  test("compaction preserves the serve: merge-on-read == copy-on-write") {
    // raises if serve(v3 compacted, no DV) differs from the DV-masked serve
    Similarity.annDeleteCompactVerify(spark, "/root/testdata/sf0.01")
  }

  test("deleted ids never serve; the mask visibly changes the top-K") {
    val dir = "/root/testdata/sf0.01"
    val del = graft.SparkEntry.queries("sim_ann_delete")(spark, dir).collect()
    assert(del.nonEmpty)
    assert(!del.exists(_.getAs[Long]("vec_id") % 17 == 0),
      "a deleted vector appeared in the served result")
    val base = graft.SparkEntry.queries("sim_ann_ivf")(spark, dir).collect()
    val doomedInBase = base.count(_.getAs[Long]("vec_id") % 17 == 0)
    assert(doomedInBase > 0,
      "fixture regression: the delete predicate no longer hits any " +
        "undeleted top-K slot, so the anti-mask is not behind the gate")
    // every query still gets its full K results after the delete
    val k = del.groupBy(_.getAs[Long]("q_id")).values.map(_.length).toSet
    assert(k == Set(5), s"per-query result sizes after delete: $k")
  }
}
