package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — train/val/test assignment must be a
  * pure function of the record key (NOT `rand()` or `randomSplit`):
  * reproducible across runs, cluster sizes, and engines; stable when the
  * corpus is re-partitioned or incrementally extended (a doc's split never
  * changes when other docs are added).
  *
  * The bucket is derived from md5 of the key so both engines agree:
  * a 2-char mix of the first hex digits → 0..99. 90/5/5 split.
  */
object SplitOps {

  /** Uniform bucket 0..99, identical in Spark and DuckDB: the first 4 md5
    * hex digits as a 16-bit value, mod 100. Residual bias is 65536 % 100 =
    * 36 buckets seeing one extra value in 655 (~0.15%) — negligible, unlike
    * an ascii-code mix, whose 256 reachable combinations make the split
    * deterministically lumpy (a 90/5/5 target lands at 90.2/5.5/4.3).
    *
    * ONE md5 + one hex-parse per row (Spark `conv`, DuckDB '0x' cast) —
    * the earlier per-digit instr arithmetic referenced the md5 column four
    * times, and CollapseProject re-evaluates it per reference. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("long") % 100

  def hashBucketSql(keyExpr: String): String =
    s"(CAST('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 4) AS UBIGINT) % 100)"

  /** Split label for a key: train (<90), val (<95), test. */
  def splitLabel(key: Column): Column = {
    val b = hashBucket(key)
    when(b < 90, "train").when(b < 95, "val").otherwise("test")
  }

  def splitLabelSql(keyExpr: String): String = {
    val b = hashBucketSql(keyExpr)
    s"CASE WHEN $b < 90 THEN 'train' WHEN $b < 95 THEN 'val' ELSE 'test' END"
  }

  /** Split sizes per (split, lang) — the sanity report a pipeline checks
    * before training. */
  private def splitQ(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "documents")
      .withColumn("split", splitLabel(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"), col("lang"))

  /** Dataset mixing to a per-source token budget: the pre-training step
    * that turns N raw corpora + a mixture recipe into one training set.
    * Docs are ranked inside each source by a hash priority (deterministic
    * "random" — stable under repartition and corpus growth, same property
    * as `splitLabel`) and taken greedily until the source's token quota is
    * filled (window cumulative sum; integer tokens, so exact).
    *
    * Scale: one shuffle on `source` + a per-source sort — the same shape
    * as any top-k-per-group. A skewed source salts like any hot key; the
    * quota here is a pure function of the source, but a real recipe joins
    * a BROADCAST (source → quota) table, which changes nothing in the
    * plan. Token proxy = n_chars div 4 (the usual chars-per-token rule of
    * thumb); swap in real token counts (`text_token_count`) unchanged. */
  private def mixQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // try_cast on BOTH engines (TRY_CAST in the oracle): a malformed
    // source suffix degrades identically to NULL → the 500 default quota,
    // instead of Spark nulling while the oracle raises a conversion error
    val quota = when(
      expr("try_cast(substring(source, 4, 10) AS int)") % 2 === 0,
      1500L).otherwise(500L)
    val priority = md5(concat(lit("mix:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("source"))
      .orderBy(priority, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.Tables(s, dir, "documents")
      .withColumn("tok", expr("n_chars div 4"))
      .withColumn("cum_tokens", sum(col("tok")).over(w))
      .filter(col("cum_tokens") <= quota)
      .select(col("source"), col("doc_id"), col("tok"), col("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"))
  }

  /** Temperature-weighted mixture recipe — the multilingual pre-training
    * rule (mT5 / XLM-R style): a group's sampling weight is n_i^α with
    * α < 1, upsampling low-resource languages relative to their raw token
    * share. Emits the recipe table: per-lang raw docs/tokens, temperature
    * weight, and the integer token quota out of a 100k budget.
    *
    * α is fixed at 0.5 ON PURPOSE: IEEE-754 requires `sqrt` to be exactly
    * rounded, so Spark and DuckDB agree bit-for-bit, whereas `pow(x,0.3)`
    * carries no such guarantee and a 1-ulp disagreement could flip the
    * floor at a quota boundary. Weights are floored to integers so the
    * total and the quota division stay in exact integer arithmetic.
    * Swapping in α=0.3 is a one-line change where exactness isn't gated.
    *
    * Scale: one hash aggregate over the corpus → a lang-count-sized
    * recipe table; the 1-row weight total is a BROADCAST cross join
    * (metadata, same pattern as graph_*). Selection against the quota is
    * text_mix_budget's territory — unchanged by where the quota comes
    * from. */
  private def mixTemperatureQ(s: SparkSession, dir: String): DataFrame = {
    val per = graft.Tables(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(expr("n_chars div 4")).as("tok"))
      .withColumn("w", floor(sqrt(col("tok").cast("double"))).cast("long"))
    val tot = per.agg(sum(col("w")).as("tw"))
    per.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("tok"), col("w"),
        expr("(100000 * w) div tw").as("quota_toks"))
      .orderBy(col("lang"))
  }

  /** Deterministic WEIGHTED Bernoulli sampling: each row accepted with
    * probability proportional to its weight (here o_totalprice, capped at
    * 1), decided by comparing an md5 bucket against an integer threshold
    * derived from the weight — rand()-free, so the sample is reproducible
    * across runs/engines/partitionings and stable under corpus growth
    * (the properties quality-weighted corpus sampling needs: upweight
    * high-quality docs, keep the choice a pure function of the key).
    * All-integer compare: bucket ∈ [0,10000) vs floor(weight/50) — no
    * float threshold to disagree on. */
  private def weightedSampleQ(s: SparkSession, dir: String): DataFrame = {
    val bucket =
      conv(substring(md5(concat(lit("ws:"), col("o_orderkey").cast("string"))
        .cast("binary")), 1, 4), 16, 10).cast("long") % 10000
    val threshold = floor(col("o_totalprice") / 50.0).cast("long")
    // balanced: per-row md5 bucketing on a single-split table
    graft.Tables.balanced(s, dir, "orders", "o_orderkey")
      .filter(bucket < threshold)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_sampled"),
        graft.ops.Exact.sumD(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Corpus-build composition — the operators chained the way a real
    * pre-training data build runs them: exact dedup (keep the lowest
    * doc_id per content hash, `min_by` so the keeper's attributes ride
    * along without a second join) → deterministic split assignment →
    * per-split document/token budget report. Each stage is itself an
    * oracle-checked operator (dedup_exact / text_split_assign); this
    * query pins that they COMPOSE — one corpus scan, two hash-aggregate
    * shuffles, no driver round-trips between stages. */
  private def corpusBuildQ(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("n_chars"), col("doc_id")).as("n_chars"))
      .withColumn("split", splitLabel(col("doc_id")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("n_chars div 4")).as("n_tokens"))
      .orderBy(col("split"))

  /** Stratified EXACT-quota sampling: every stratum contributes exactly
    * ceil(n/5) rows (20%), chosen by ranking the stratum's rows on a
    * deterministic md5 priority — the complement of the Bernoulli designs
    * above (`splitLabel` / `weightedSampleQ` hit the rate only in
    * expectation; class-balanced eval sets need the quota hit exactly).
    * Quota arithmetic is all-integer ((n+4) div 5) so neither engine does
    * a float multiply.
    *
    * Scale: the rank is a per-stratum keyed window (shuffle on the
    * stratum key, sort within); quotas are a stratum-count-sized table,
    * broadcast back. Fine whenever strata are plentiful relative to
    * executors; for a FEW GIANT strata the per-stratum sort concentrates
    * — there, either accept Bernoulli (hash-threshold, no sort) or run
    * `Relational2.globalRank` per stratum. */
  private def stratifiedQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = graft.Tables(s, dir, "documents")
    val quotas = d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_stratum"))
      .withColumn("quota", expr("(n_stratum + 4) div 5"))
    val priority = md5(concat(lit("strat:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang")).orderBy(priority, col("doc_id"))
    d.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), "lang")
      .filter(col("rk") <= col("quota"))
      .select(col("lang"), col("rk"), col("doc_id"),
        col("n_stratum"), col("quota"))
      .orderBy(col("lang"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_split_assign" -> splitQ,
    "text_mix_budget" -> mixQ,
    "text_mix_temperature" -> mixTemperatureQ,
    "rel_weighted_sample" -> weightedSampleQ,
    "rel_stratified_sample" -> stratifiedQ,
    "text_corpus_build" -> corpusBuildQ,
  )

  val oracles: Map[String, String] = Map(
    "text_split_assign" ->
      s"""SELECT ${splitLabelSql("doc_id")} AS split, lang, COUNT(*) AS n,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
    "text_corpus_build" ->
      s"""WITH keep AS (
         |  SELECT MIN(doc_id) AS doc_id, arg_min(n_chars, doc_id) AS n_chars
         |  FROM documents GROUP BY md5(text)
         |)
         |SELECT ${splitLabelSql("doc_id")} AS split, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars // 4) AS BIGINT) AS n_tokens
         |FROM keep GROUP BY 1 ORDER BY split""".stripMargin,
    "rel_weighted_sample" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_sampled,
         |  ${graft.ops.Exact.sumSql("o_totalprice")} AS sum_price
         |FROM orders
         |WHERE (CAST('0x' || substr(md5('ws:' || CAST(o_orderkey AS VARCHAR)), 1, 4) AS UBIGINT) % 10000)
         |      < CAST(floor(o_totalprice / 50.0) AS BIGINT)
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "rel_stratified_sample" ->
      """WITH q AS (
        |  SELECT lang, COUNT(*) AS n_stratum, (COUNT(*) + 4) // 5 AS quota
        |  FROM documents GROUP BY 1
        |), r AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents
        |)
        |SELECT r.lang, CAST(r.rk AS BIGINT) AS rk, r.doc_id,
        |  q.n_stratum, q.quota
        |FROM r JOIN q USING (lang) WHERE r.rk <= q.quota
        |ORDER BY lang, rk""".stripMargin,
    "text_mix_budget" ->
      """WITH ranked AS (
        |  SELECT source, doc_id, n_chars // 4 AS tok,
        |    CAST(SUM(n_chars // 4) OVER (PARTITION BY source
        |      ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM documents
        |)
        |SELECT source, doc_id, tok, cum_tokens FROM ranked
        |WHERE cum_tokens <= CASE WHEN TRY_CAST(substr(source, 4) AS INTEGER) % 2 = 0
        |                         THEN 1500 ELSE 500 END
        |ORDER BY source, cum_tokens""".stripMargin,
    // exact integer arithmetic end-to-end (sqrt is IEEE-exactly-rounded,
    // weights floored to BIGINT) so the recipe hash-matches bitwise
    "text_mix_temperature" ->
      """WITH per AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars // 4) AS BIGINT) AS tok
        |  FROM documents GROUP BY lang
        |), w AS (
        |  SELECT lang, n_docs, tok,
        |    CAST(floor(sqrt(CAST(tok AS DOUBLE))) AS BIGINT) AS w
        |  FROM per
        |), tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w)
        |SELECT lang, n_docs, tok, w, (100000 * w) // tw AS quota_toks
        |FROM w CROSS JOIN tot ORDER BY lang""".stripMargin,
  )
}
