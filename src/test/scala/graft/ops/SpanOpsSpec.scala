package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Value pins for the token-span operators: duplicated-substring span
  * detection (window merge semantics, intra- vs cross-doc repeats) and
  * overlapping chunk extraction (coverage, overlap, tail handling). */
class SpanOpsSpec extends SparkSpec {

  import spark.implicits._

  private def spanRows(docs: Seq[(Long, String)], k: Int): Map[Long, Row] =
    SpanOps.substringSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("substringSpans: cross-doc duplicated run covered once, merged maximally") {
    // docs 1 and 2 share the 8-token run "a b c d e f g h"; with k=3 that
    // is 6 overlapping duplicated windows per doc which must merge into
    // ONE maximal span of 8 tokens. Unique prefix/suffix stays uncovered.
    val shared = "a b c d e f g h"
    val rows = spanRows(Seq(
      1L -> s"u1 u2 $shared u3 u4",
      2L -> s"v1 $shared v2",
      3L -> "w1 w2 w3 w4 w5 w6"), k = 3)
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_dup_spans") == 1)
    assert(r1.getAs[Long]("dup_tokens") == 8)
    assert(r1.getAs[Long]("n_tokens") == 12)
    val r2 = rows(2L)
    assert(r2.getAs[Long]("n_dup_spans") == 1)
    assert(r2.getAs[Long]("dup_tokens") == 8)
    // doc 3 shares nothing: zero spans, zero covered tokens
    val r3 = rows(3L)
    assert(r3.getAs[Long]("n_dup_spans") == 0)
    assert(r3.getAs[Long]("dup_tokens") == 0)
    assert(r3.getAs[Double]("dup_frac") == 0.0)
  }

  test("substringSpans: intra-document repeat counts as duplicated") {
    // "x y z" occurs twice INSIDE doc 1 — both occurrences are duplicated
    // windows even though no other document contains them. They are
    // separated by more than k, so they stay two distinct spans.
    val rows = spanRows(Seq(
      1L -> "x y z p1 p2 p3 p4 x y z",
      2L -> "q1 q2 q3 q4 q5"), k = 3)
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_dup_spans") == 2)
    assert(r1.getAs[Long]("dup_tokens") == 6)
    assert(r1.getAs[Double]("dup_frac") == 0.6)
  }

  test("substringSpans: adjacent duplicated windows bridge into one span") {
    // doc 1 contains two shared 3-gram regions whose covered intervals
    // touch ([0,2] from "a b c", [3,5] from "d e f" — next start 3 <= 0+k)
    // so the merge rule must bridge them into a single 6-token span.
    val rows = spanRows(Seq(
      1L -> "a b c d e f t1 t2",
      2L -> "z1 a b c z2 z3 d e f z4"), k = 3)
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_dup_spans") == 1)
    assert(r1.getAs[Long]("dup_tokens") == 6)
    // doc 2's two regions are separated (starts 1 and 6, gap > k - well,
    // 6 - 1 = 5 > 3) so they remain two spans of 3 tokens each there
    val r2 = rows(2L)
    assert(r2.getAs[Long]("n_dup_spans") == 2)
    assert(r2.getAs[Long]("dup_tokens") == 6)
  }

  test("substringSpans: docs shorter than k never produce spans") {
    val rows = spanRows(Seq(1L -> "a b", 2L -> "a b"), k = 3)
    assert(rows(1L).getAs[Long]("n_dup_spans") == 0)
    assert(rows(2L).getAs[Long]("n_dup_spans") == 0)
  }

  private def chunks(text: String, c: Int, s: Int): Array[Row] =
    SpanOps.chunkOverlap(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", c, s)
      .orderBy("chunk_idx").collect()

  test("chunkOverlap: coverage, overlap width, and short tail") {
    // 10 tokens, size 4, stride 3 -> last start index ceil(6/3)=2 -> starts 0,3,6: 3 chunks
    val ch = chunks("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", c = 4, s = 3)
    assert(ch.length == 3)
    assert(ch.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"))
    assert(ch.map(_.getAs[Long]("chunk_tokens")).toSeq == Seq(4L, 4L, 4L))
    // 11 tokens: starts 0,3,6,9 — the tail chunk is short but reaches the end
    val ch2 = chunks("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", c = 4, s = 3)
    assert(ch2.length == 4)
    assert(ch2.last.getAs[String]("chunk_text") == "t9 t10")
    assert(ch2.last.getAs[Long]("chunk_tokens") == 2L)
  }

  test("chunkOverlap: a doc at or under the chunk size yields exactly one chunk") {
    val ch = chunks("a b c", c = 4, s = 3)
    assert(ch.length == 1)
    assert(ch.head.getAs[String]("chunk_text") == "a b c")
    val exact = chunks("a b c d", c = 4, s = 3)
    assert(exact.length == 1)
  }

  test("chunkOverlap plan is shuffle-free (map-side only)") {
    val d = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = SpanOps.chunkOverlap(d, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
