package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the property that distinguishes `text_pii_tokenize` from
  * redaction: surrogates are DETERMINISTIC per value, so the same email
  * appearing in different documents maps to the same token (entity joins
  * and distinct counts survive pseudonymization), different values map to
  * different tokens, and the raw identifier is gone from the output. */
class PiiTokenizeSpec extends SparkSpec {

  test("same PII value yields the same surrogate across documents") {
    val q = graft.SparkEntry.queries("text_pii_tokenize")
    val out = q(spark, "/root/testdata/sf0.001").cache()
    // doc_id % 5 == 0 docs embed user<doc_id>@example.com — doc 0 and
    // doc 5 have DIFFERENT emails, so their tokens must differ; but the
    // derivation is deterministic, so rerunning yields identical tokens
    val tok = out.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        regexp_extract(col("tokenized"), "\\[EMAIL:[0-9a-f]{8}\\]", 0).as("t"))
    val toks = tok.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(toks.nonEmpty && toks.values.forall(_.nonEmpty),
      "every %5==0 doc must carry an email surrogate")
    assert(toks.values.toSet.size == toks.size,
      "distinct emails must map to distinct surrogates")
    val again = q(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        regexp_extract(col("tokenized"), "\\[EMAIL:[0-9a-f]{8}\\]", 0).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == toks, "surrogates must be deterministic across runs")
    // raw identifiers must not survive
    assert(out.filter(col("tokenized").rlike("@example\\.com")).count() == 0,
      "no raw email may remain in tokenized text")
    out.unpersist()
  }
}
