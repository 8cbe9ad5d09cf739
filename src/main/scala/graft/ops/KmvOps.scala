package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketch with SET ALGEBRA — the
  * capability HLL lacks: HLL unions losslessly but cannot intersect;
  * MinHash gives Jaccard but not cardinalities. A KMV sketch (the k
  * smallest hash values of a set, Beyer et al., SIGMOD'07) is mergeable
  * (union = k smallest of the concatenated sketches), estimates
  * |A ∪ B| = (k-1) / h_(k) for the k-th smallest normalized hash of the
  * merged sketch, and |A ∩ B| via the fraction of the merged sketch's
  * survivors present in BOTH input sketches — so audience-overlap /
  * segment-intersection questions at 100 TB are answered from two stored
  * k-long arrays, never by rescanning either side.
  *
  * Build shape: the sketch is `graft_topk` (the bounded
  * TypedImperativeAggregate) over NEGATED hash doubles with the exact
  * 60-bit hash as the tiebreak id — map-side partials carry ≤ k pairs per
  * group through the shuffle, identical to a production sketch build. The
  * negated-double ordering equals ascending-hash ordering exactly: double
  * rounding is monotone, and hashes collapsed onto one double fall back to
  * the id tiebreak, which IS the full-precision hash.
  *
  * Hashes are the first 60 bits of md5 (15 hex chars), so the DuckDB
  * oracle derives the IDENTICAL sketch — even the estimates are bit-exact
  * doubles — and the exact distinct/intersection counts ride along as the
  * calibration columns.
  */
object KmvOps {

  private val K = 64

  private def kmvSetopsQ(s: SparkSession, dir: String): DataFrame = {
    graft.functions.TopKFunctions.register(s)
    val two60 = lit(1152921504606846976L) // 2^60, exact in double

    // set A = click user-days, set B = view user-days
    def elems = graft.Tables(s, dir, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(when(col("event_type") === "click", "A").otherwise("B").as("set_id"),
        concat(col("user_id"), lit(":"),
          date_format(col("ts"), "yyyy-MM-dd")).as("elem"))
      .distinct()

    val hashed = elems.withColumn("h",
      conv(substring(md5(col("elem").cast("binary")), 1, 15), 16, 10)
        .cast("long"))
    // bottom-k by hash == top-k by (-double(h)) with id=h tiebreak
    val sketches = hashed.groupBy(col("set_id"))
      .agg(transform(
          graft.functions.TopKFunctions.topkBy(-col("h").cast("double"), col("h"), K),
          x => x.getField("id")).as("ks"),
        count(lit(1)).as("exact_n"))
    val a = sketches.filter(col("set_id") === "A")
      .select(col("ks").as("ka"), col("exact_n").as("exact_a"))
    val b = sketches.filter(col("set_id") === "B")
      .select(col("ks").as("kb"), col("exact_n").as("exact_b"))
    // exact twins for calibration: one more hash aggregate over elems
    val exact = elems.groupBy(col("elem"))
      .agg(countDistinct(col("set_id")).as("ns"))
      .agg(count(lit(1)).as("exact_union"),
        sum(when(col("ns") === 2, 1L).otherwise(0L)).cast("long").as("exact_inter"))

    a.crossJoin(broadcast(b)).crossJoin(broadcast(exact))
      .withColumn("uk", slice(array_sort(array_distinct(
        concat(col("ka"), col("kb")))), 1, K))
      .withColumn("hk", element_at(col("uk"), K))
      .withColumn("common", size(filter(col("uk"),
        x => array_contains(col("ka"), x) && array_contains(col("kb"), x))))
      .withColumn("est_union",
        lit((K - 1).toDouble) / (col("hk").cast("double") / two60.cast("double")))
      .withColumn("est_inter",
        col("common").cast("double") * col("est_union") / lit(K.toDouble))
      .select(lit(K).as("k"), col("exact_a"), col("exact_b"),
        col("exact_union"), col("exact_inter"), col("common"),
        col("est_union"), col("est_inter"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_kmv_setops" -> kmvSetopsQ,
  )

  val oracles: Map[String, String] = Map(
    // the oracle derives the IDENTICAL sketch (same md5-60-bit hashes,
    // same k minima) plus the exact twins — estimates are bit-exact
    "rel_kmv_setops" ->
      """WITH elems AS (
        |  SELECT DISTINCT
        |    CASE WHEN event_type = 'click' THEN 'A' ELSE 'B' END AS set_id,
        |    CAST(user_id AS VARCHAR) || ':' || strftime(ts, '%Y-%m-%d') AS elem
        |  FROM events WHERE event_type IN ('click', 'view')
        |), hashes AS (
        |  SELECT set_id, ('0x' || substr(md5(elem), 1, 15))::BIGINT AS h
        |  FROM elems
        |), sk AS (
        |  SELECT set_id, list_slice(list(h ORDER BY h), 1, 64) AS ks,
        |         COUNT(*) AS exact_n
        |  FROM hashes GROUP BY set_id
        |), a AS (SELECT ks AS ka, exact_n AS exact_a FROM sk WHERE set_id = 'A'),
        |b AS (SELECT ks AS kb, exact_n AS exact_b FROM sk WHERE set_id = 'B'),
        |ex AS (
        |  SELECT COUNT(*) AS exact_union,
        |         CAST(SUM(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
        |  FROM (SELECT elem, COUNT(DISTINCT set_id) AS ns FROM elems GROUP BY elem)
        |), m AS (
        |  SELECT ka, kb, exact_a, exact_b, exact_union, exact_inter,
        |         list_slice(list_sort(list_distinct(list_concat(ka, kb))), 1, 64) AS uk
        |  FROM a, b, ex
        |), est AS (
        |  SELECT exact_a, exact_b, exact_union, exact_inter,
        |         len(list_filter(uk, x -> list_contains(ka, x) AND list_contains(kb, x))) AS common,
        |         63.0 / (CAST(uk[64] AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE)) AS est_union
        |  FROM m
        |)
        |SELECT 64 AS k, exact_a, exact_b, exact_union, exact_inter, common,
        |       est_union, CAST(common AS DOUBLE) * est_union / 64.0 AS est_inter
        |FROM est""".stripMargin,
  )
}
