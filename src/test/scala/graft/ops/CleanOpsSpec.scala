package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the corpus-cleaning operators (CleanOps). */
class CleanOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("text_pii_redact: injected PII is detected by kind and fully redacted") {
    val out = CleanOps.queries("text_pii_redact")(spark, sf)
    val d5 = col("doc_id") % 5
    // each injected kind is counted exactly once, on the right rows
    assert(out.filter(d5 === 0 && col("n_email") =!= 1).count() == 0)
    assert(out.filter(d5 === 1 && col("n_phone") =!= 1).count() == 0)
    assert(out.filter(d5 === 2 && col("n_ip") =!= 1).count() == 0)
    assert(out.filter(d5.isin(3, 4) && col("has_pii")).count() == 0)
    // redaction is total: no raw pattern survives, the placeholder appears
    assert(out.filter(col("redacted").rlike("@")).count() == 0)
    assert(out.filter(d5 === 0 && !col("redacted").contains("[EMAIL]")).count() == 0)
    assert(out.filter(d5 === 1 && !col("redacted").contains("[PHONE]")).count() == 0)
    assert(out.filter(d5 === 2 && !col("redacted").contains("[IP]")).count() == 0)
  }

  test("text_quality_classifier: probabilities coherent, score bounded by |w|max * n_tokens") {
    val out = CleanOps.queries("text_quality_classifier")(spark, sf)
    assert(out.filter(col("prob") <= 0.0 || col("prob") >= 1.0).count() == 0)
    assert(out.filter(col("keep") =!= (col("prob") >= 0.5)).count() == 0)
    val joined = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
      .join(out, "doc_id")
    assert(joined.filter(abs(col("raw_score")) > col("n_tok") * 3).count() == 0)
    // every document is scored (bucket join is total over 0..63)
    assert(out.count() == graft.Tables(spark, sf, "documents").count())
  }

  test("dedup_containment: exact duplicates surface as containment-1 pairs, canonical order") {
    val out = DedupOps.queries("dedup_containment")(spark, sf)
    assert(out.filter(col("d1") >= col("d2")).count() == 0)
    assert(out.filter(greatest(col("c12"), col("c21")) < 0.9).count() == 0)
    // every exact-duplicate group (n_copies > 1) implies a containment-1 pair
    val nDupGroups = DedupOps.queries("dedup_exact")(spark, sf)
      .filter(col("n_copies") > 1).count()
    assert(out.filter(col("c12") === 1.0 && col("c21") === 1.0).count() >= nDupGroups)
  }

  test("dedup_semantic: covers the corpus; every cell keeps at least one member") {
    val out = Similarity.queries("dedup_semantic")(spark, sf)
    assert(out.count() == graft.Tables(spark, sf, "embeddings").count())
    val perCell = out.groupBy(col("cell"))
      .agg(sum(when(!col("dropped"), 1L).otherwise(0L)).as("n_kept"))
    assert(perCell.filter(col("n_kept") < 1).count() == 0)
  }

  test("sim_knn_graph + sim_knn_components: cell-local edges, components honor min-label rule") {
    val g = Similarity.queries("sim_knn_graph")(spark, sf)
    // neighbors never leave the cell and src != dst
    assert(g.filter(col("src") === col("dst")).count() == 0)
    val perSrc = g.groupBy("src").agg(count(lit(1)).as("n"))
    assert(perSrc.filter(col("n") > 3).count() == 0)
    val c = Similarity.queries("sim_knn_components")(spark, sf)
    // every cluster's id equals its minimum member id
    val bad = c.groupBy("cluster_id").agg(min(col("vec_id")).as("mn"))
      .filter(col("cluster_id") =!= col("mn"))
    assert(bad.count() == 0)
  }

  test("mm_dedup: group sizes cover the corpus, keeper is a member") {
    val out = MultimodalOps.queries("mm_dedup")(spark, sf)
    val total = graft.Tables(spark, sf, "documents").count()
    assert(out.agg(sum(col("n_copies"))).head().getLong(0) == total)
    assert(out.filter(col("n_sources") < 1 || col("n_sources") > col("n_copies")).count() == 0)
  }

  test("text_line_dedup: untouched docs reconstruct their original text exactly") {
    val out = CleanOps.queries("text_line_dedup")(spark, sf)
    assert(out.filter(col("n_kept") > col("n_lines")).count() == 0)
    val joined = graft.Tables(spark, sf, "documents").join(out, "doc_id")
    // chunks rejoined on single spaces reproduce the source text verbatim
    assert(joined.filter(col("n_kept") === col("n_lines") &&
      col("cleaned") =!= col("text")).count() == 0)
    // something was actually removed somewhere (the operator is exercised)
    assert(out.filter(col("n_kept") < col("n_lines")).count() > 0)
  }
}
