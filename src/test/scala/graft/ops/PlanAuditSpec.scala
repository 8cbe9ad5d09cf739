package graft.ops

import graft.SparkSpec

/** Fleet-wide physical-plan audit: no batch query may plan a Cartesian
  * product or a broadcast-nested-loop join — the two shapes that cannot
  * survive a 100 TB input. Streaming queries are excluded (their plans are
  * only materialized by execution) as are queries whose WHOLE POINT is a
  * bounded cross join against a broadcast one-row/row-tiny side, listed
  * with justification. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // justified exclusions:
  //   text_zipf          — crossJoin(broadcast(1-row total)) by construction
  //   sim_cosine_topk / sim_ann_ivf / dedup_embed_cosine / sim_centroid_cohesion
  //                      — brute-force or quantizer scoring joins against a
  //                        BROADCAST query/centroid set (bounded by design;
  //                        the LSH/IVF variants are the unbounded-scale path)
  //   cot_* fixture queries — VALUES-sized inputs
  //   text_lang_id_ngram — doc × candidate-language grid against the
  //                        BROADCAST distinct-language set (bounded)
  //   text_tfidf_topk    — crossJoin(broadcast(1-row n_docs aggregate))
  //   sim_ann_recall     — composes sim_cosine_topk (the justified
  //                        broadcast brute-force baseline) as its truth set
  private val allowNestedLoop = Set(
    "text_lang_id_ngram", "text_tfidf_topk", "sim_ann_recall",
    "text_zipf", "sim_cosine_topk", "sim_ann_ivf", "dedup_embed_cosine",
    "sim_centroid_cohesion", "cot_transform_dedup", "cot_transform_hostile",
    "cot_includes_join",
    // dedup_semantic / sim_knn_graph score vectors against the BROADCAST
    // quantizer-cell table (bounded by design, same as sim_ann_ivf)
    "dedup_semantic", "sim_knn_graph", "sim_knn_components", "rel_funnel",
    // k-means assignment scores the corpus against the BROADCAST K-row
    // centroid table each iteration — bounded by design (K ≪ corpus),
    // the same shape as sim_ann_ivf's quantizer scoring
    "sim_kmeans_train",
    // the silhouette scores the corpus against the same BROADCAST fitted
    // centroid table (one ranked pass, a and b from rk <= 2)
    "sim_silhouette",
    // graph_* cross-join a BROADCAST 1-row aggregate (node/edge count)
    // into the pipeline — the in-pipeline alternative to a driver count()
    "graph_pagerank", "graph_triangles",
    // recall curve cross-joins the BROADCAST 1-row query count into the
    // 3-row curve (same shape as the graph_* totals)
    "sim_recall_curve",
    // rel_expectations: referential branch cross-joins a BROADCAST 1-row
    // total (n_checked) into the report
    "rel_expectations",
    // heavy hitters cross-join the BROADCAST 1-row (sketch, total)
    // aggregate onto the 15 candidate keys — 64 KiB × 15 rows by design
    "rel_heavy_hitters", "stream_heavy_hitters",
    // three BROADCAST 1-row sides (two sketches + exact twin) pair up —
    // the estimate is computed on two 64 KiB arrays
    "rel_join_size_est",
    // the BROADCAST 1-row (n_docs, avgdl) collection stats join onto the
    // query-term postings
    "text_bm25_topk",
    // bloom prefilter cross-joins the BROADCAST 1-row 4 KiB bitmap onto
    // the probe side — that broadcast IS the semi-join reduction
    "rel_bloom_prefilter",
    // the 1-row weight total broadcast onto the lang-sized recipe table
    "text_mix_temperature",
    // source-count-sized (≈20-row) size/sig tables pair via a broadcast
    // `<` self-join — the matrix is |sources|², metadata-scale
    "dedup_source_overlap",
    // the BROADCAST 1-row table-stats aggregate joins onto the per-key
    // counts — the audit's whole output is top-5 rows
    "rel_skew_audit",
    // three 1-row sides (two sketches + exact twin) pair via broadcast
    // cross joins — the sketch algebra runs on k-long arrays
    "rel_kmv_setops",
    // the z-normalized query pattern is a BROADCAST 1-row array; candidate
    // subsequences stream map-side against it
    "ts_subseq_topk",
    // the BROADCAST 1-row quarantine count rides the published aggregate
    // through the hash gate
    "stream_checked_sink",
    // post_n is a BROADCAST query-count-sized aggregate joined back onto
    // the K survivors per query; candidate generation itself is the
    // IVF probed-cell equi-join (same scale path as sim_ann_ivf)
    "sim_ann_filtered",
    // the resample spans join the BROADCAST 1-row global bound(s) — the
    // series side scales and stays keyed
    "ts_resample_ffill", "ts_resample_aligned",
    // the global-prior fallback is a BROADCAST 1-row aggregate riding a
    // cross join; the encoding itself is one category-keyed window
    "rel_target_encode",
    // χ² cells cross-join the BROADCAST 1-row grand total onto the
    // category-product-sized cell table
    "rel_chi2_cells",
    // same 1-row-total broadcast pattern: MI joins the grand total and
    // the exact-decimal MI total onto the cell table; Cramér's V folds
    // the cell table to ONE row then cross-joins the 1-row dims/total;
    // Benford cross-joins the 1-row count onto the 9-row digit table
    "rel_mutual_info", "rel_cramers_v", "rel_benford",
    // the censor horizon is a BROADCAST 1-row max onto the per-user frame
    "rel_survival_km",
    // the basket total is a BROADCAST 1-row count onto the item-pair table
    "rel_basket_lift",
    // the greedy per-step argmax windows ride query-count-sized frames;
    // the candidate pool staging cross-joins the broadcast query set
    // like sim_mips_topk (bounded by design — N per query, never corpus)
    "sim_mmr_rerank",
    // candidates cross the BROADCAST query set (the brute-force recall
    // contract, as sim_mips_topk); the truth frame crosses the 3-row
    // broadcast dims literal
    "sim_matryoshka_recall",
    // zipf's own 1-row-total broadcast pattern, bigram vocabulary
    "text_bigram_topk",
    // brute-force MIPS scores candidates against the BROADCAST query set
    // — bounded by design; the IVF serve (post magnitude augmentation)
    // is the unbounded-scale path, as with sim_cosine_topk
    "sim_mips_topk",
    // top-20 islands cross-join the BROADCAST 1-row island count
    "rel_gaps_islands",
    // decile-sized (10-row) broadcast <= self-join cumulates the gains
    // table; the 1-row totals cross-join onto it — both metadata-scale
    "rel_decile_lift",
    // the two 1-row totals (n_bi, n_uni) broadcast onto the
    // vocabulary-sized PMI candidate table — zipf's own pattern
    "text_pmi_collocations",
    // the 1-row (lo, hi) doc-id bound broadcast onto the corpus scan
    // (bucket arithmetic), the ts_resample bound pattern
    "text_heaps_law",
    // the 1-row undirected-edge count m broadcast onto the
    // community-sized q_term table
    "graph_modularity",
    // reads the ivfRanked staged substrate (corpus × BROADCAST centroid
    // cells — bounded by design, sim_ann_ivf's own quantizer scoring)
    "sim_ivf_imbalance",
    // the 1-row verified-truth count broadcast onto the 3-row curve
    "dedup_lsh_curve",
    // the 1-row (lo, hi) time bound broadcast onto the corpus scan
    // (the heaps_law bound pattern)
    "rel_cuped",
    // the 3-row tau tier frame and the 1-row vector count broadcast
    // onto the cell-bounded pair table (the lsh_curve pattern)
    "sim_dedup_threshold_sweep")

  // queries whose factory launches jobs at plan build (streams, write-
  // then-read lifecycles, training loops) — the documented contract
  // lives at SparkEntry.eagerQueries; auditing their pre-execution plans
  // would be vacuous or impossible
  private val skip = graft.SparkEntry.eagerQueries

  test("eagerQueries and allowNestedLoop only name real queries") {
    // a typo'd or stale name in either set silently widens/narrows the
    // audit instead of failing it
    val known = graft.SparkEntry.queries.keySet
    val ghosts = (skip ++ allowNestedLoop).filterNot(known.contains)
    assert(ghosts.isEmpty, s"unknown query names: $ghosts")
  }

  test("no unplanned CartesianProduct / BroadcastNestedLoopJoin anywhere") {
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip.contains)
      .flatMap { name =>
        val plan = graft.SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnl = plan.contains("BroadcastNestedLoopJoin") &&
          !allowNestedLoop.contains(name)
        if (cartesian || bnl)
          Some(s"$name: cartesian=$cartesian bnl=$bnl")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
