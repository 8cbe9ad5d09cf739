package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tokens._

/** Token-span operators over the document corpus: exact substring-span
  * deduplication (the Lee et al. 2021 "Deduplicating Training Data Makes
  * Language Models Better" operation, re-expressed as a distributed
  * fingerprint join instead of a suffix array) and overlapping-window
  * chunk extraction (the RAG / context-window preprocessing step).
  *
  * Scale shapes:
  *   - Substring dedup never materializes a suffix array: every K-token
  *     window becomes a 16-byte md5 fingerprint, repeated fingerprints are
  *     found with one hash aggregate, and only the repeated subset joins
  *     back (an equi-join on the fingerprint — at 100 TB both sides
  *     shuffle-partition by the hash, no skew because md5 is uniform).
  *     Interval merging is a per-document keyed window (gaps-and-islands),
  *     so no global sort and no single-partition funnel anywhere.
  *   - Chunking is pure map-side array arithmetic (sequence + slice inside
  *     whole-stage codegen): zero shuffles; at 100 TB the scan is the cost.
  */
object SpanOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "documents")

  // ---- exact substring-span dedup ----------------------------------------

  /** Window length in tokens (Lee et al. use 50 BPE tokens at web scale;
    * 6 fits the synthetic corpus's doc lengths while still exercising
    * overlapping-span merges — the near-dup cluster shares long runs). */
  private[graft] val SPAN_K = 6

  /** PUBLIC: per-document duplicated-span statistics. A span is any run of
    * tokens covered by a K-token window whose exact text occurs >= 2 times
    * anywhere in the corpus (including within the same document). Returns
    * one row per input document: n_tokens, n_dup_spans (maximal merged
    * spans), dup_tokens (tokens covered by any duplicated window), and
    * dup_frac — the fraction a span-removal pass would delete.
    *
    * Overlapping windows with a fixed length K merge exactly when the next
    * start position is <= previous start + K, so the classic
    * gaps-and-islands lag/cumsum pair computes maximal spans without
    * materializing per-token coverage. */
  def substringSpans(d: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val t = toks(col(textCol))
    val base = d.select(col(idCol), t.as("t"))
    val grams = d
      .filter(size(t) >= k)
      .select(col(idCol),
        posexplode(shingles(col(textCol), k)).as(Seq("pos", "gram")))
      .select(col(idCol), col("pos"),
        md5(col("gram").cast("binary")).as("g"))
    // one hash aggregate over 16-byte fingerprints; >= 2 occurrences
    // ANYWHERE (cross- or intra-document) marks the window duplicated
    val rep = grams.groupBy(col("g")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2)
      .select(col("g"))
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val spans = grams.join(rep, "g")
      .select(col(idCol), col("pos"))
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1, -(k + 1)).over(wDoc) > k, 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk")).over(wDoc))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("s"), max(col("pos")).as("e"))
    val perDoc = spans.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s") + k).cast("long").as("dup_tokens"))
    base.select(col(idCol), size(col("t")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_dup_spans", "dup_tokens"))
      .withColumn("dup_frac",
        col("dup_tokens").cast("double") / col("n_tokens"))
  }

  private def substringSpansQuery(s: SparkSession, dir: String): DataFrame =
    substringSpans(docs(s, dir), "doc_id", "text", SPAN_K)
      .orderBy(col("doc_id"))

  // ---- overlapping-window chunk extraction --------------------------------

  /** Chunk size / stride in tokens (overlap = CHUNK_C - CHUNK_S). */
  private[graft] val CHUNK_C = 32
  private[graft] val CHUNK_S = 24

  /** PUBLIC: split each document into overlapping token windows — chunk i
    * covers tokens [i*stride, i*stride + size); the last chunk may be
    * shorter but always reaches the end of the document, and every
    * document yields at least one chunk. Pure map-side array arithmetic
    * (sequence + slice, codegen'd) — zero shuffles. */
  def chunkOverlap(d: DataFrame, idCol: String, textCol: String,
      size0: Int, stride: Int): DataFrame = {
    val t = toks(col(textCol))
    // last chunk index = ceil(max(n - size, 0) / stride), in exact
    // integer arithmetic (floats would drift on giant docs)
    val lastIdx = floor(
      (greatest(size(t) - size0, lit(0)) + (stride - 1))
        .cast("double") / stride).cast("int")
    d.select(col(idCol), t.as("t"), lastIdx.as("last_idx"))
      .select(col(idCol), col("t"),
        explode(sequence(lit(0), col("last_idx"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ",
          slice(col("t"), col("chunk_idx") * stride + 1, lit(size0)))
          .as("chunk_text"),
        size(slice(col("t"), col("chunk_idx") * stride + 1, lit(size0)))
          .cast("long").as("chunk_tokens"))
  }

  private def chunkQuery(s: SparkSession, dir: String): DataFrame =
    chunkOverlap(docs(s, dir), "doc_id", "text", CHUNK_C, CHUNK_S)
      .orderBy(col("doc_id"), col("chunk_idx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_substring_spans" -> substringSpansQuery,
    "text_chunk_overlap" -> chunkQuery,
  )

  // ---- DuckDB oracles -----------------------------------------------------

  val oracles: Map[String, String] = Map(
    "dedup_substring_spans" -> {
      val k = SPAN_K
      s"""WITH tt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |g0 AS (SELECT doc_id, unnest(generate_series(0, len(t) - $k)) AS pos, t
         |       FROM tt WHERE len(t) >= $k),
         |g AS (SELECT doc_id, pos, array_to_string(t[pos+1 : pos+$k], ' ') AS gram FROM g0),
         |rep AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         |d AS (SELECT g.doc_id, g.pos FROM g JOIN rep USING (gram)),
         |isl AS (SELECT doc_id, pos,
         |  CASE WHEN pos - lag(pos, 1, -${k + 1}) OVER (PARTITION BY doc_id ORDER BY pos) > $k
         |       THEN 1 ELSE 0 END AS brk FROM d),
         |isl2 AS (SELECT doc_id, pos,
         |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
         |spans AS (SELECT doc_id, island, min(pos) AS s, max(pos) AS e
         |          FROM isl2 GROUP BY 1, 2),
         |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         |        CAST(sum(e - s + $k) AS BIGINT) AS dup_tokens
         |        FROM spans GROUP BY 1)
         |SELECT tt.doc_id, CAST(len(tt.t) AS BIGINT) AS n_tokens,
         |  COALESCE(per.n_dup_spans, 0) AS n_dup_spans,
         |  COALESCE(per.dup_tokens, 0) AS dup_tokens,
         |  CAST(COALESCE(per.dup_tokens, 0) AS DOUBLE) / len(tt.t) AS dup_frac
         |FROM tt LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    "text_chunk_overlap" -> {
      val (c, st) = (CHUNK_C, CHUNK_S)
      s"""WITH tt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |ch AS (SELECT doc_id, t,
         |  unnest(generate_series(0,
         |    CAST(floor((greatest(len(t) - $c, 0) + ${st - 1}) / $st.0) AS INT))) AS chunk_idx
         |  FROM tt)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  array_to_string(t[chunk_idx*$st + 1 : chunk_idx*$st + $c], ' ') AS chunk_text,
         |  CAST(len(t[chunk_idx*$st + 1 : chunk_idx*$st + $c]) AS BIGINT) AS chunk_tokens
         |FROM ch
         |ORDER BY doc_id, chunk_idx""".stripMargin
    },
  )
}
