package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for sim_dedup_threshold_sweep — the SemDeDup threshold-governance
  * curve. The exact counts are hash-pinned against the DuckDB replay by
  * the correctness gate; these tests pin the curve's STRUCTURE and its
  * agreement with the operator it governs. */
class DedupSweepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sweep: tiers are monotone in tau, bounds hold, and the SEM_TAU " +
      "tier's drop count equals dedup_semantic's dropped count") {
    val rows = graft.SparkEntry.queries("sim_dedup_threshold_sweep")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("tau_pct")).toSeq == Seq(30L, 35L, 40L))
    // tightening tau can only shrink every tier quantity
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getAs[Long]("n_pairs") <= lo.getAs[Long]("n_pairs"))
      assert(hi.getAs[Long]("n_docs") <= lo.getAs[Long]("n_docs"))
      assert(hi.getAs[Long]("n_dropped") <= lo.getAs[Long]("n_dropped"))
    }
    rows.foreach { r =>
      val (p, d, k) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_dropped"))
      assert(d <= 2 * p, r.toString)           // pairs have 2 endpoints
      assert(k <= d, r.toString)               // losers are endpoints
      assert(k < r.getAs[Long]("n_vectors"))   // never drops everything
    }
    // the governed operator agrees: at tau = 35 (= SEM_TAU 0.35) the
    // sweep's drop count is exactly dedup_semantic's dropped total —
    // same cells, same keep-farthest rule, factored per edge
    val semDrops = graft.SparkEntry.queries("dedup_semantic")(spark, sf)
      .filter(col("dropped")).count()
    val t35 = rows.find(_.getAs[Long]("tau_pct") == 35L).get
    assert(t35.getAs[Long]("n_dropped") == semDrops,
      s"sweep@35 = ${t35.getAs[Long]("n_dropped")} vs semantic $semDrops")
  }
}
