package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tokens._

/** Corpus-cleaning operators every large-scale training-data pipeline runs
  * before a token ever reaches a model: PII detection/redaction, a
  * hashed-feature quality classifier (the fastText-style keep/drop gate),
  * and corpus-frequency boilerplate-line removal (the C4 rule: drop any
  * line that repeats across too many documents).
  *
  * Scale shapes:
  *   - PII redaction is pure per-row regex work — map-side only, zero
  *     shuffles, whole-stage codegen; at 100 TB it is embarrassingly
  *     parallel and the scan is the only cost.
  *   - The classifier is explode → broadcast-join(weight table) → per-doc
  *     sum: the weight table is model-sized (fixed, tiny), so the single
  *     shuffle is the per-doc aggregate with map-side partial sums.
  *   - Line-dedup's frequency table is bounded by the distinct-line
  *     vocabulary (≪ corpus), and only the over-threshold BLOCKLIST — far
  *     smaller still — is broadcast back for the anti-join.
  */
object CleanOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "documents")

  // ---- PII detection + redaction -----------------------------------------

  /** RE2-compatible (no lookaround) so Spark's Java regex and the DuckDB
    * oracle agree byte-for-byte. */
  private[ops] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[ops] val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  private[ops] val ipRe    = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** The synthetic corpus is PII-free word-soup, so PII-bearing text is
    * DERIVED deterministically from the row (doc_id decides which PII kind
    * is appended) — the same derivation the oracle applies, so the regex
    * detection + redaction machinery is exercised on real PII shapes.
    * Same pattern as `text_decontaminate`'s benchmark subset. */
  private[ops] def piiText: Column = {
    val d = col("doc_id")
    when(d % 5 === 0, concat(col("text"), lit(" contact user"),
      d.cast("string"), lit("@example.com now")))
      .when(d % 5 === 1, concat(col("text"), lit(" call +1-555-"),
        lpad((d % 10000).cast("string"), 4, "0"), lit(" today")))
      .when(d % 5 === 2, concat(col("text"), lit(" host 10."),
        (d % 256).cast("string"), lit(".0."), (d % 100).cast("string"),
        lit(" up")))
      .otherwise(col("text"))
  }

  private[ops] val piiTextSql =
    """CASE WHEN doc_id % 5 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
      |     WHEN doc_id % 5 = 1 THEN text || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
      |     WHEN doc_id % 5 = 2 THEN text || ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) || ' up'
      |     ELSE text END""".stripMargin.replace("\n", " ")

  /** PUBLIC: append per-row PII hit counts by kind (n_email/n_phone/n_ip,
    * counted BEFORE redaction), the redacted text, and a has_pii flag.
    * Pure per-row regex work — map-side only, zero shuffles, whole-stage
    * codegen; at 100 TB it is embarrassingly parallel and the scan is the
    * only cost. Redaction applies email → phone → ip (the patterns are
    * mutually non-overlapping, so order is cosmetic). */
  def redactPii(d: DataFrame, textCol: String): DataFrame = {
    val txt = col(textCol)
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(txt, emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipRe, "[IP]")
    d.withColumn("n_email",
        size(regexp_extract_all(txt, lit(emailRe), lit(0))).cast("long"))
      .withColumn("n_phone",
        size(regexp_extract_all(txt, lit(phoneRe), lit(0))).cast("long"))
      .withColumn("n_ip",
        size(regexp_extract_all(txt, lit(ipRe), lit(0))).cast("long"))
      .withColumn("redacted", red)
      .withColumn("has_pii",
        col("n_email") + col("n_phone") + col("n_ip") > 0)
  }

  private def piiRedact(s: SparkSession, dir: String): DataFrame =
    redactPii(docs(s, dir).select(col("doc_id"), piiText.as("txt")), "txt")
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        col("redacted"), col("has_pii"))
      .orderBy(col("doc_id"))

  /** PII PSEUDONYMIZATION — the governance op redaction can't replace:
    * `[EMAIL]` destroys the value, but a deterministic surrogate
    * (`[EMAIL:1a2b3c4d]`, first 8 md5 hex chars of the match) lets
    * downstream analytics still JOIN and COUNT DISTINCT on the entity
    * while the raw identifier never leaves the scan. Same value → same
    * token corpus-wide, with no lookup table to secure (hash, not vault).
    * Pure per-row work: one combined regex pass finds matches, kind is
    * classified from the match shape, and the replacements fold over the
    * text with `aggregate` — map-side only, zero shuffles, codegen
    * end-to-end. Surrogates cannot re-match any PII pattern (no '@', no
    * leading '+', no dotted digits), so the fold order is immaterial;
    * it is pinned sorted anyway for determinism. */
  private val combinedPiiRe = s"(?:$emailRe)|(?:$phoneRe)|(?:$ipRe)"

  private def piiTokenize(s: SparkSession, dir: String): DataFrame = {
    val sep = "" // cannot occur in any PII match
    val kind = (m: Column) =>
      when(m.contains("@"), lit("EMAIL"))
        .when(m.startsWith("+"), lit("PHONE"))
        .otherwise(lit("IP"))
    docs(s, dir).select(col("doc_id"), piiText.as("txt"))
      .withColumn("ms", array_sort(array_distinct(
        regexp_extract_all(col("txt"), lit(combinedPiiRe), lit(0)))))
      .withColumn("n_pii",
        size(regexp_extract_all(col("txt"), lit(combinedPiiRe), lit(0)))
          .cast("long"))
      .withColumn("pairs", transform(col("ms"), m =>
        concat(m, lit(sep), lit("["), kind(m), lit(":"),
          substring(md5(m.cast("binary")), 1, 8), lit("]"))))
      .withColumn("tokenized", aggregate(col("pairs"), col("txt"),
        (acc, x) => org.apache.spark.sql.functions.replace(acc,
          substring_index(x, sep, 1), substring_index(x, sep, -1))))
      .select(col("doc_id"), col("tokenized"), col("n_pii"))
      .orderBy(col("doc_id"))
  }

  /** URL CANONICALIZATION — the web-corpus dedup key: the same page
    * arrives as casing variants, default-port forms, `www.` prefixes,
    * tracking-parameter decorations, shuffled query orders, and fragment
    * suffixes; deduplicating raw URLs misses all of them. `canonicalUrl`
    * lowercases scheme+host, strips `:80`, `www.`, fragments and `utm_*`
    * params, and sorts the surviving query params — pure string/array
    * Column work, map-side, codegen. The query derives 4 deterministic
    * raw variants per page from the row (same trick as `piiText`), so
    * ~4-5 raw forms collapse per canonical page and the oracle rebuilds
    * the identical derivation + canonicalization. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val host = regexp_extract(noFrag, "^[a-zA-Z]+://[^/?]+", 0)
    val host2 = regexp_replace(
      regexp_replace(lower(host), ":80$", ""),
      "^(https?://)www\\.", "$1")
    val rest = noFrag.substr(length(host) + 1, lit(1 << 20))
    val path = substring_index(rest, "?", 1)
    val query = when(instr(rest, "?") > 0,
      rest.substr(length(path) + 2, lit(1 << 20))).otherwise(lit(""))
    val params = filter(split(query, "&"),
      p => !p.startsWith("utm_") && p =!= lit(""))
    val qs = array_join(array_sort(params), "&")
    concat(host2, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  private def urlCanonicalQ(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val page = (d % 100).cast("string")
    val a = ((d % 100) % 7).cast("string")
    val b = ((d % 100) % 3).cast("string")
    val raw =
      when(d % 4 === 0, concat(lit("http://example.com/p/"), page,
        lit("?a="), a, lit("&b="), b))
      .when(d % 4 === 1, concat(lit("HTTP://EXAMPLE.COM:80/p/"), page,
        lit("?b="), b, lit("&a="), a))
      .when(d % 4 === 2, concat(lit("http://example.com/p/"), page,
        lit("?utm_campaign=z&a="), a, lit("&b="), b, lit("#frag")))
      .otherwise(concat(lit("http://www.example.com/p/"), page,
        lit("?b="), b, lit("&a="), a, lit("&utm_source=x")))
    // balanced: the regex-chain canonicalization is per-row work on a
    // single-split corpus
    graft.Tables.balanced(s, dir, "documents", "doc_id")
      .select(d.as("doc_id"), raw.as("url"))
      .withColumn("canonical", canonicalUrl(col("url")))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_raw_forms"),
        min(col("doc_id")).as("keeper_doc"))
      .orderBy(col("canonical"))
  }

  // ---- Hashed-feature quality classifier ---------------------------------

  /** Feature buckets = first 4 md5 hex digits mod N (same cross-engine-
    * deterministic trick as SplitOps.hashBucket). */
  private val CLS_BUCKETS = 64

  /** PUBLIC: linear classifier over hashed bag-of-words features — the
    * standard learned keep/drop gate (fastText-style) with the learned
    * weight VECTOR supplied as a (bucket, wgt) table, broadcast (a model is
    * always tiny relative to the corpus). Plan: explode → broadcast-join →
    * per-doc sum (one shuffle, map-side combined). Returns
    * (idCol, raw_score, prob, keep); prob is rounded to 6 dp. */
  def linearScore(d: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, nBuckets: Int, temperature: Double): DataFrame = {
    val prob = round(
      lit(1.0) / (lit(1.0) + exp(-col("raw_score").cast("double") / temperature)), 6)
    d.select(col(idCol), explode(toks(col(textCol))).as("w"))
      .withColumn("bucket",
        conv(substring(md5(col("w").cast("binary")), 1, 4), 16, 10)
          .cast("long") % nBuckets)
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("wgt")).as("raw_score"))
      .withColumn("prob", prob)
      .withColumn("keep", col("prob") >= 0.5)
  }

  /** Query wrapper: weights are a deterministic function of the bucket (a
    * stand-in for trained values; the join/score machinery is the operator
    * under test). Integer weights keep the raw score exact; the 6 dp
    * rounding makes both engines' libm agree on the sigmoid. */
  private def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val weights = s.range(0, CLS_BUCKETS.toLong)
      .select(col("id").as("bucket"), (col("id") % 7 - 3).as("wgt"))
    // balanced scan: the per-token md5 feature hashing is the query's cost,
    // and the single-row-group corpus would otherwise feed it one-threaded
    linearScore(graft.Tables.balanced(s, dir, "documents", "doc_id"),
      "doc_id", "text", weights, CLS_BUCKETS, 100.0)
      .orderBy(col("doc_id"))
  }

  // ---- Boilerplate line removal (C4-style) -------------------------------

  /** The corpus has no newlines, so a "line" is a non-overlapping LINE_K-
    * token chunk — the same partition-the-document semantics. A line is
    * boilerplate when it appears in >= LINE_THR distinct documents. */
  private val LINE_K = 3
  private val LINE_THR = 3

  /** PUBLIC: remove corpus-frequent lines from every document ("line" = a
    * non-overlapping k-token chunk; a real newline-delimited corpus would
    * split on newlines instead — same plan). Plan: posexplode →
    * per-(doc, line-no) chunk assembly (one shuffle, map-side combined) →
    * line-frequency aggregate over the line vocabulary (≪ corpus) →
    * broadcast anti-join of the over-threshold blocklist → per-doc
    * reassembly in line order. The chunk table is read by the frequency
    * build and the anti-join both, so it is materialized via `stage`
    * (Catalyst would otherwise compute it twice). Returns
    * (idCol, n_lines, n_kept, cleaned). */
  def removeFrequentLines(d: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Long,
      stage: DataFrame => DataFrame = _.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)): DataFrame = {
    val tok = d.select(col(idCol), posexplode(toks(col(textCol))).as(Seq("pos", "w")))
    val lines = stage {
      tok.withColumn("ln", floor(col("pos") / k).cast("long"))
        .groupBy(col(idCol), col("ln"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("line"))
    }
    val block = lines.groupBy(col("line"))
      .agg(count_distinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("line"))
    val kept = lines.join(broadcast(block), Seq("line"), "left_anti")
    val total = lines.groupBy(col(idCol)).agg(count(lit(1)).as("n_lines"))
    val keptAgg = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("ln"), col("line")))),
          x => x.getField("line")), " ").as("cleaned"))
    total.join(keptAgg, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  private def lineDedup(s: SparkSession, dir: String): DataFrame =
    removeFrequentLines(
      graft.Tables.balanced(s, dir, "documents", "doc_id"),
      "doc_id", "text", LINE_K, LINE_THR,
      df => Staging.staged(s, dir, s"clean_lines_$LINE_K")(df))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pii_redact" -> piiRedact,
    "text_pii_tokenize" -> piiTokenize,
    "dedup_url_canonical" -> urlCanonicalQ,
    "text_quality_classifier" -> qualityClassifier,
    "text_line_dedup" -> lineDedup,
  )

  val oracles: Map[String, String] = Map(
    "text_pii_redact" ->
      s"""WITH p AS (SELECT doc_id, $piiTextSql AS txt FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(txt, '$emailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(txt, '$phoneRe')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(txt, '$ipRe')) AS BIGINT) AS n_ip,
         |  regexp_replace(regexp_replace(regexp_replace(txt,
         |    '$emailRe', '[EMAIL]', 'g'), '$phoneRe', '[PHONE]', 'g'),
         |    '$ipRe', '[IP]', 'g') AS redacted,
         |  (len(regexp_extract_all(txt, '$emailRe'))
         |   + len(regexp_extract_all(txt, '$phoneRe'))
         |   + len(regexp_extract_all(txt, '$ipRe'))) > 0 AS has_pii
         |FROM p ORDER BY doc_id""".stripMargin,
    // identical raw-variant derivation + canonicalization steps in SQL
    "dedup_url_canonical" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'http://example.com/p/' || (doc_id % 100) ||
        |        '?a=' || ((doc_id % 100) % 7) || '&b=' || ((doc_id % 100) % 3)
        |      WHEN 1 THEN 'HTTP://EXAMPLE.COM:80/p/' || (doc_id % 100) ||
        |        '?b=' || ((doc_id % 100) % 3) || '&a=' || ((doc_id % 100) % 7)
        |      WHEN 2 THEN 'http://example.com/p/' || (doc_id % 100) ||
        |        '?utm_campaign=z&a=' || ((doc_id % 100) % 7) ||
        |        '&b=' || ((doc_id % 100) % 3) || '#frag'
        |      ELSE 'http://www.example.com/p/' || (doc_id % 100) ||
        |        '?b=' || ((doc_id % 100) % 3) || '&a=' || ((doc_id % 100) % 7) ||
        |        '&utm_source=x'
        |    END AS url
        |  FROM documents
        |), canon AS (
        |  SELECT doc_id, url, h2 || path ||
        |    CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canonical
        |  FROM (
        |    SELECT doc_id, url, h2, path,
        |      array_to_string(list_sort(list_filter(string_split(q, '&'),
        |        p -> NOT starts_with(p, 'utm_') AND p <> '')), '&') AS qs
        |    FROM (
        |      SELECT doc_id, url,
        |        regexp_replace(regexp_replace(lower(h), ':80$', ''),
        |          '^(https?://)www\.', '\1') AS h2,
        |        split_part(rest, '?', 1) AS path,
        |        CASE WHEN instr(rest, '?') > 0
        |          THEN substr(rest, length(split_part(rest, '?', 1)) + 2)
        |          ELSE '' END AS q
        |      FROM (
        |        SELECT doc_id, url,
        |          regexp_extract(u1, '^[a-zA-Z]+://[^/?]+') AS h,
        |          substr(u1, length(regexp_extract(u1, '^[a-zA-Z]+://[^/?]+')) + 1) AS rest
        |        FROM (SELECT doc_id, url,
        |                regexp_replace(url, '#.*$', '') AS u1 FROM raw)
        |      )
        |    )
        |  )
        |)
        |SELECT canonical, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT url) AS n_raw_forms, MIN(doc_id) AS keeper_doc
        |FROM canon GROUP BY canonical ORDER BY canonical""".stripMargin,
    // the oracle derives the IDENTICAL surrogates (same md5 prefix), so
    // tokenized text must match byte-for-byte
    "text_pii_tokenize" ->
      s"""WITH p AS (SELECT doc_id, $piiTextSql AS txt FROM documents),
         |m AS (SELECT doc_id, txt,
         |  list_sort(list_distinct(regexp_extract_all(txt, '$combinedPiiRe'))) AS ms,
         |  CAST(len(regexp_extract_all(txt, '$combinedPiiRe')) AS BIGINT) AS n_pii
         |  FROM p)
         |SELECT doc_id,
         |  list_reduce(
         |    list_prepend(txt, list_transform(ms, x -> x || chr(1) || '[' ||
         |      (CASE WHEN contains(x, '@') THEN 'EMAIL'
         |            WHEN starts_with(x, '+') THEN 'PHONE'
         |            ELSE 'IP' END) ||
         |      ':' || substr(md5(x), 1, 8) || ']')),
         |    (acc, x) -> replace(acc, split_part(x, chr(1), 1),
         |                        split_part(x, chr(1), 2))) AS tokenized,
         |  n_pii
         |FROM m ORDER BY doc_id""".stripMargin,
    "text_quality_classifier" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |tb AS (SELECT doc_id,
         |  CAST(CAST('0x' || substr(md5(w), 1, 4) AS UBIGINT) % $CLS_BUCKETS AS BIGINT) AS bucket
         |  FROM tok),
         |wt AS (SELECT CAST(unnest(range(0, $CLS_BUCKETS)) AS BIGINT) AS bucket),
         |wt2 AS (SELECT bucket, bucket % 7 - 3 AS wgt FROM wt),
         |sc AS (SELECT doc_id, CAST(SUM(wgt) AS BIGINT) AS raw_score
         |       FROM tb JOIN wt2 USING (bucket) GROUP BY 1)
         |SELECT doc_id, raw_score,
         |  round(1.0 / (1.0 + exp(-CAST(raw_score AS DOUBLE) / 100.0)), 6) AS prob,
         |  round(1.0 / (1.0 + exp(-CAST(raw_score AS DOUBLE) / 100.0)), 6) >= 0.5 AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,
    "text_line_dedup" ->
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |lx AS (SELECT doc_id,
         |  unnest(list_transform(range(0, CAST(ceil(len(t) / $LINE_K.0) AS BIGINT)),
         |    p -> {'ln': p, 'line': array_to_string(t[p*$LINE_K+1 : p*$LINE_K+$LINE_K], ' ')})) AS s
         |  FROM base),
         |l2 AS (SELECT doc_id, s.ln AS ln, s.line AS line FROM lx),
         |block AS (SELECT line FROM (
         |  SELECT line, COUNT(DISTINCT doc_id) AS nd FROM l2 GROUP BY 1) WHERE nd >= $LINE_THR),
         |kept AS (SELECT l2.* FROM l2 ANTI JOIN block USING (line)),
         |tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM l2 GROUP BY 1),
         |ka AS (SELECT doc_id, COUNT(*) AS n_kept,
         |       string_agg(line, ' ' ORDER BY ln) AS cleaned FROM kept GROUP BY 1)
         |SELECT t.doc_id, t.n_lines,
         |  coalesce(ka.n_kept, 0) AS n_kept, coalesce(ka.cleaned, '') AS cleaned
         |FROM tot t LEFT JOIN ka USING (doc_id) ORDER BY doc_id""".stripMargin,
  )
}
