package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for the training-data pipeline: n-gram
  * statistics beyond unigrams, and curriculum shard assignment (ordered
  * training shards by a difficulty score).
  *
  * Scale notes:
  *   - bigram top-k mirrors text_zipf's design — the shuffle key space is
  *     the bigram vocabulary (≪ corpus), the top-k folds to ONE array row
  *     (TakeOrdered shape), no unpartitioned window anywhere;
  *   - curriculum shards ride `Relational2.globalRank` (range repartition
  *     + per-partition offsets), so the global ordering costs one range
  *     shuffle and NO single-partition window — the exact plan you'd run
  *     to emit ordered shards from a 100 TB corpus.
  */
object CorpusOps {

  import Tokens.toks

  private val TOP_BIGRAMS = 30

  /** Corpus-wide top-k adjacent-token bigrams with collection frequency
    * and corpus share — the n>1 companion to text_zipf, and the raw
    * signal behind boilerplate phrase detection and BPE seeding. */
  /** Adjacent-token bigrams of a text column, one row per occurrence. */
  def bigrams(d: DataFrame, text: org.apache.spark.sql.Column): DataFrame =
    d.select(toks(text).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => concat(element_at(col("w"), i), lit(" "),
          element_at(col("w"), i + 1)))).as("bigram"))

  private def bigramTopkQ(s: SparkSession, dir: String): DataFrame = {
    val bg = bigrams(
      graft.Tables.balanced(s, dir, "documents", "doc_id"), col("text"))
    // staged: referenced by both the total and the top-k branch (Catalyst
    // does not dedupe common subtrees — unstaged, the corpus would
    // tokenize twice; same rationale as text_zipf's staged counts)
    val counts = Staging.staged(s, dir, "bigram_counts") {
      bg.groupBy(col("bigram")).agg(count(lit(1)).as("cf"))
    }
    val total = counts.agg(sum(col("cf")).cast("double").as("total"))
    counts.orderBy(col("cf").desc, col("bigram").asc).limit(TOP_BIGRAMS)
      .agg(array_sort(collect_list(
        struct((-col("cf")).as("k"), col("bigram").as("b"), col("cf").as("cf"))))
        .as("xs"))
      .crossJoin(broadcast(total))
      .select(col("total"), posexplode(col("xs")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.b").as("bigram"), col("col.cf").as("cf"),
        round(col("col.cf").cast("double") / col("total"), 9).as("share"))
  }

  private val SHARD_SIZE = 64L

  /** Curriculum shard manifest: order the corpus by a difficulty score
    * (here document length — swap in any score column), assign contiguous
    * fixed-size shards along that order, and emit one manifest row per
    * shard with its boundaries. This is the "write ordered training
    * shards" step of curriculum training: the global order comes from
    * `globalRank` (range shuffle + narrow rank arithmetic), and each
    * shard's rows are CONTIGUOUS in the range partitioning, so the
    * downstream shard writer streams partition-local rows. */
  def curriculumShards(d: DataFrame, score: String, id: String,
                       shardSize: Long): DataFrame =
    Relational2.globalRank(d, col(score), col(id))
      .withColumn("shard", expr(s"(__rank - 1) div $shardSize"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(score)).as("min_chars"),
        max(col(score)).as("max_chars"),
        sum(col(score)).as("sum_chars"),
        min_by(col(id), col("__rank")).as("first_doc"),
        max_by(col(id), col("__rank")).as("last_doc"))
      .orderBy(col("shard"))

  private def curriculumShardsQ(s: SparkSession, dir: String): DataFrame =
    curriculumShards(
      graft.Tables(s, dir, "documents").select(col("doc_id"), col("n_chars")),
      "n_chars", "doc_id", SHARD_SIZE)

  /** N-gram novelty scoring (the data-selection signal behind
    * dedup-aware ordering): each document's fraction of distinct bigrams
    * whose FIRST corpus occurrence (by ascending doc id — ingestion
    * order) is this document. High-novelty docs contribute new phrase
    * mass; near-zero novelty flags re-crawls and templates that exact
    * dedup misses. Plan: one distinct (doc, gram) set (staged — the
    * first-occurrence aggregate and the join-back both consume it), one
    * gram-keyed min aggregate (vocabulary-sized shuffle), one gram-keyed
    * join back; no pairwise comparison anywhere, which is what makes the
    * signal computable at corpus scale where pairwise novelty isn't. */
  private def ngramNoveltyQ(s: SparkSession, dir: String): DataFrame = {
    val dg = Staging.staged(s, dir, "novelty_doc_grams") {
      graft.Tables.balanced(s, dir, "documents", "doc_id")
        .select(col("doc_id"), toks(col("text")).as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("w")) - 1),
            i => concat(element_at(col("w"), i), lit(" "),
              element_at(col("w"), i + 1)))).as("bigram"))
        .distinct()
    }
    val first = dg.groupBy(col("bigram")).agg(min(col("doc_id")).as("first_doc"))
    dg.join(first, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (floor(col("n_novel").cast("double") / col("n_grams").cast("double")
          * lit(1e6) + lit(0.5d)).cast("double") / lit(1e6)).as("novelty"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bigram_topk" -> bigramTopkQ,
    "text_curriculum_shards" -> curriculumShardsQ,
    "text_ngram_novelty" -> ngramNoveltyQ,
  )

  val oracles: Map[String, String] = Map(
    "text_bigram_topk" ->
      s"""WITH w AS (
         |  SELECT string_split(text, ' ') AS ws FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2
         |), bg AS (
         |  SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
         |    i -> ws[i] || ' ' || ws[i + 1])) AS bigram
         |  FROM w
         |), c AS (
         |  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cf FROM bg GROUP BY 1
         |), t AS (SELECT CAST(SUM(cf) AS DOUBLE) AS total FROM c)
         |SELECT rank, bigram, cf, round(CAST(cf AS DOUBLE) / total, 9) AS share
         |FROM (
         |  SELECT ROW_NUMBER() OVER (ORDER BY cf DESC, bigram ASC) AS rank,
         |    bigram, cf FROM c
         |) CROSS JOIN t
         |WHERE rank <= $TOP_BIGRAMS ORDER BY rank""".stripMargin,
    "text_ngram_novelty" ->
      s"""WITH dg AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(generate_series(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i + 1])) AS bigram
         |  FROM (
         |    SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |    WHERE len(string_split(text, ' ')) >= 2
         |  )
         |), f AS (
         |  SELECT bigram, MIN(doc_id) AS first_doc FROM dg GROUP BY 1
         |), a AS (
         |  SELECT dg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |    CAST(SUM(CASE WHEN f.first_doc = dg.doc_id THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_novel
         |  FROM dg JOIN f USING (bigram) GROUP BY 1
         |)
         |SELECT doc_id, n_grams, n_novel,
         |  CAST(floor(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE)
         |    * 1e6 + 0.5) AS DOUBLE) / 1e6 AS novelty
         |FROM a ORDER BY doc_id""".stripMargin,
    "text_curriculum_shards" ->
      s"""WITH r AS (
         |  SELECT doc_id, n_chars,
         |    ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rk
         |  FROM documents
         |)
         |SELECT (rk - 1) // $SHARD_SIZE AS shard,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  arg_min(doc_id, rk) AS first_doc,
         |  arg_max(doc_id, rk) AS last_doc
         |FROM r GROUP BY 1 ORDER BY shard""".stripMargin,
  )
}
