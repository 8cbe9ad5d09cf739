package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding token counting (the budgeting primitive of a
  * training-data pipeline: mixture weights, packing, and per-source token
  * budgets are all denominated in TOKENIZER tokens, not words — see
  * text_pack_bins / text_mix_budget, which consume counts like these).
  *
  * Algorithm (GPT-2's tokenizer, Sennrich et al. 2016): a word starts as
  * its character symbols; repeatedly merge the adjacent pair with the
  * LOWEST merge rank (leftmost occurrence first) until no adjacent pair
  * is in the merge table; the token count is the surviving symbol count.
  * The merge table here is an in-code fixture (rank = list position) so
  * the DuckDB oracle can replay the identical merges with a recursive
  * CTE over symbol lists and hash-compare the counts.
  *
  * Scale posture: counts are computed once per DISTINCT word (the
  * word-level cache every real BPE tokenizer keeps) with the merge table
  * broadcast to executors — the per-word kernel never sees the corpus,
  * and the corpus-sized side only joins the vocabulary-sized count table
  * back on the word key. At web scale the vocabulary still fits a
  * broadcast (GPT-2's own vocab is 50k; even 100 TB of text has a
  * long-tail vocab orders below corpus size); if it ever didn't, the
  * same plan runs as a shuffle join on `w`.
  */
object BpeOps {

  /** Fixture merge table, rank = position (1-based). Front-loaded with
    * high-frequency English pairs plus second-level merges ("th e",
    * "an d", "in g") so multi-level merging is actually exercised. */
  val merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"),
    ("r", "e"), ("th", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("s", "t"), ("a", "r"), ("o", "u"), ("an", "d"), ("in", "g"),
    ("t", "o"), ("e", "s"), ("i", "s"), ("i", "t"), ("a", "l"),
    ("e", "d"), ("l", "e"), ("c", "o"), ("d", "e"), ("s", "e"))

  /** BPE symbol count for one word: one merge per step — the leftmost
    * occurrence of the lowest-ranked adjacent pair — mirroring the oracle
    * CTE step-for-step (merging one occurrence at a time converges to the
    * same fixpoint as all-occurrences-per-pair, since a merge can only
    * create pairs involving the NEW symbol, whose rank is higher). */
  private[graft] def tokenCount(w: String, rank: Map[(String, String), Int]): Int = {
    var syms: Vector[String] = w.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue; var pos = -1; var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; pos = i }
        i += 1
      }
      if (pos < 0) done = true
      else {
        syms = syms.patch(pos, Vector(syms(pos) + syms(pos + 1)), 2)
        done = syms.length < 2
      }
    }
    syms.length
  }

  private def bpeCountQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // balanced: regex word-extraction explode dominates and the corpus
    // ships as one split
    val words = graft.Tables.balanced(s, dir, "documents", "doc_id")
      .select(col("doc_id"), col("source"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
    val vocab = words.select(col("w")).distinct().as[String]
    val rankB = s.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap)
    val tokPerWord = vocab.mapPartitions { it =>
      val rk = rankB.value // one table fetch per partition
      it.map(w => (w, tokenCount(w, rk).toLong))
    }.toDF("w", "n_tok")
    words.join(broadcast(tokPerWord), "w")
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_tok")).as("bpe_tokens"),
        count(lit(1)).as("n_words"))
      .orderBy(col("source"))
  }

  /** Per-document BPE token totals — the per-distinct-word kernel and
    * broadcast join of [[bpeCountQ]], then a per-doc rollup; documents
    * with no alphabetic words keep an explicit 0. */
  private[graft] def perDocTokenCounts(s: SparkSession, docsDf: DataFrame): DataFrame = {
    import s.implicits._
    val words = docsDf.select(col("doc_id"),
      explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
    val vocab = words.select(col("w")).distinct().as[String]
    val rankB = s.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap)
    val tokPerWord = vocab.mapPartitions { it =>
      val rk = rankB.value
      it.map(w => (w, tokenCount(w, rk).toLong))
    }.toDF("w", "n_tok_w")
    docsDf.select(col("doc_id"))
      .join(words.join(broadcast(tokPerWord), "w")
          .groupBy(col("doc_id")).agg(sum(col("n_tok_w")).as("n_tok")),
        Seq("doc_id"), "left")
      .withColumn("n_tok", coalesce(col("n_tok"), lit(0L)))
  }

  /** Sequence packing denominated in TOKENIZER tokens (the composition
    * the counts exist for): greedy cumulative-sum binning per language at
    * a 2048-token context budget, identical shape to text_pack_bins but
    * with BPE counts instead of whitespace counts — a single keyed window
    * over the vocabulary-joined totals. */
  private val PACK_CAP = 2048L

  private def bpePackQ(s: SparkSession, dir: String): DataFrame = {
    val docsDf = graft.Tables.balanced(s, dir, "documents", "doc_id")
    val counts = docsDf.select(col("doc_id"), col("lang"))
      .join(perDocTokenCounts(s, docsDf), "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    counts
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", ((col("cum") - col("n_tok")) / PACK_CAP).cast("long"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("bin"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_count" -> bpeCountQ,
    "text_bpe_pack" -> bpePackQ,
  )

  private def mergesListSql: String =
    merges.map { case (l, r) => s"'$l $r'" }.mkString("[", ",", "]")

  // The oracle replays the merge loop as a recursive CTE: each step finds
  // the lowest-rank adjacent pair (nullif guards list_position's 0-for-
  // absent) and merges its leftmost occurrence; a word's count is the
  // minimum symbol-list length it ever reaches (lengths strictly decrease).
  private def bpeCtes: String =
    s"""mlist AS (
       |  SELECT $mergesListSql AS ms
       |),
       |words AS (
       |  SELECT doc_id, source,
       |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents
       |),
       |uw AS (SELECT DISTINCT w FROM words),
       |bpe AS (
       |  SELECT w, string_split(w, '') AS syms FROM uw
       |  UNION ALL
       |  SELECT w, list_concat(list_concat(
       |      syms[1:pos-1], [syms[pos] || syms[pos+1]]), syms[pos+2:]) AS syms
       |  FROM (
       |    SELECT w, syms, list_position(rks, list_aggregate(rks, 'min')) AS pos
       |    FROM (
       |      SELECT w, syms,
       |        list_transform(generate_series(1, len(syms)-1),
       |          i -> nullif(list_position(ms, syms[i] || ' ' || syms[i+1]), 0)) AS rks
       |      FROM bpe, mlist
       |    )
       |  ) WHERE pos IS NOT NULL
       |),
       |ntok AS (SELECT w, min(len(syms)) AS n_tok FROM bpe GROUP BY w)""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_bpe_count" ->
      s"""WITH RECURSIVE $bpeCtes
         |SELECT source, COUNT(DISTINCT doc_id) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS bpe_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_words
         |FROM words JOIN ntok USING (w)
         |GROUP BY source ORDER BY source""".stripMargin,
    "text_bpe_pack" ->
      s"""WITH RECURSIVE $bpeCtes,
         |perdoc AS (
         |  SELECT doc_id, CAST(SUM(n_tok) AS BIGINT) AS n_tok
         |  FROM words JOIN ntok USING (w) GROUP BY doc_id
         |),
         |counts AS (
         |  SELECT d.doc_id, d.lang, coalesce(p.n_tok, 0) AS n_tok
         |  FROM documents d LEFT JOIN perdoc p USING (doc_id)
         |),
         |c AS (
         |  SELECT *, SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM counts
         |)
         |SELECT lang, CAST((cum - n_tok) // $PACK_CAP AS BIGINT) AS bin,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin,
  )
}
