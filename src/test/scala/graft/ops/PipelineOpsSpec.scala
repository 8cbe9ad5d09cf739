package graft.ops

import graft.SparkSpec

/** Stage-composition invariants for pipe_corpus_e2e — the exact values
  * are hash-pinned against the DuckDB full-dataflow replay by the
  * correctness gate; these tests pin the MONOTONICITY every stage must
  * preserve regardless of corpus, so a future stage reorder that keeps
  * the hash-checked corpus green but breaks the funnel logic (e.g. a
  * gate that adds documents, a quota that over-selects) fails loudly. */
class PipelineOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pipe_corpus_e2e: per-language stage funnel is monotone and the " +
      "selection respects its quota and the global budget") {
    val rows = PipelineOps.queries("pipe_corpus_e2e")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val nKept = r.getAs[Long]("n_kept")
      val nGated = r.getAs[Long]("n_gated")
      val quota = r.getAs[Long]("quota_toks")
      val nSel = r.getAs[Long]("n_selected")
      val selToks = r.getAs[Long]("sel_toks")
      val nBins = r.getAs[Long]("n_bins")
      assert(nKept <= nDocs, s"dedup added documents: $r")
      assert(nGated <= nKept, s"gate added documents: $r")
      assert(nSel <= nGated, s"mix selected beyond the gated set: $r")
      assert(selToks <= quota, s"selection exceeded its quota: $r")
      // bins are starting-offset groups of a contiguous token stream:
      // nonempty selection packs into at least 1 and at most
      // floor(sel_toks-ish / CTX)+1 bins
      if (nSel > 0) {
        assert(nBins >= 1, r.toString)
        assert(nBins <= selToks / 256L + 1L, s"too many bins: $r")
      } else assert(nBins == 0, r.toString)
    }
    // temperature quotas are floor-divided shares of the 100k budget
    assert(rows.map(_.getAs[Long]("quota_toks")).sum <= 100000L)
    // the corpus actually exercises every stage: something was deduped
    // away or gated out somewhere, and something was selected
    assert(rows.map(_.getAs[Long]("n_selected")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_gated")).sum <
      rows.map(_.getAs[Long]("n_docs")).sum,
      "gate+dedup dropped nothing — the composition is exercising " +
        "no stage interaction at this SF")
  }
}
