package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column profiling — the first step of any training-data ingest: null
  * rates, distinct cardinalities, and ranges per column, computed in ONE
  * aggregation pass over the table (a 100 TB profile must not scan once
  * per column). Exact distincts here because the oracle checks them;
  * the same shape runs with approx_count_distinct at scale. */
object ProfileOps {

  /** One row per profiled column: nulls, distincts, min/max (as strings,
    * so heterogeneous column types stack into one result). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the single wide row into (column, n_rows, n_nulls, n_distinct, min, max)
    val perCol = cols.map(c => struct(
      lit(c).as("column"), col("__n").as("n_rows"),
      col(s"${c}__nulls").as("n_nulls"),
      col(s"${c}__distinct").as("n_distinct"),
      col(s"${c}__min").as("min_value"),
      col(s"${c}__max").as("max_value")))
    wide.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
      .orderBy(col("column"))
  }

  private def profileOrdersQ(s: SparkSession, dir: String): DataFrame =
    profile(graft.Tables(s, dir, "orders"),
      Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))

  /** Robust outlier detection via median absolute deviation — the
    * anomaly screen that, unlike z-scores, a few extreme rows cannot
    * drag. Two grouped exact-percentile passes (median, then MAD of the
    * deviations) with the group constants BROADCAST back between them,
    * then a conditional count of |x - med| > 3 * MAD. Exact percentiles
    * sort within each group — at 100 TB swap in approx_percentile
    * (same shape, documented at rel_percentile) and the pipeline loses
    * the sorts; the exact form here is what the oracle can hash. */
  private def outliersMadQ(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(s, dir, "events")
      .select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Heavy hitters via the custom Count-Min sketch aggregate
    * (graft.functions.SketchFunctions): ONE constant-size (64 KiB)
    * sketch pass over the key column replaces the full-cardinality
    * groupBy a naive heavy-hitter count needs — the exchange carries
    * D×W counters per partial, never per-key rows. The exact counts of
    * the top keys ride along (test scale; at 100 TB only candidate keys
    * get the exact second pass), the CMS estimate for each is computed
    * from the returned sketch with plain Column arithmetic (xxhash64
    * chain, no UDF), and two deterministic booleans pin the sketch
    * guarantees through the hash gate: one-sided error
    * (estimate >= exact, always) and the e/W bound at this data/hash
    * combination. The oracle expects them literally TRUE — a broken
    * hash chain or merge would flip one and hash-mismatch. */
  private def heavyHittersQ(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.SketchFunctions
    SketchFunctions.register(s)
    val keys = graft.Tables(s, dir, "orders").select(col("o_custkey"))
    val sketchAndTotal = keys.agg(
      SketchFunctions.cmsSketch(col("o_custkey")).as("sk"),
      count(lit(1)).as("total"))
    val exactTop = keys.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("o_custkey").asc)
      .limit(15)
    val est = SketchFunctions.cmsEstimate(col("sk"), col("o_custkey"))
    exactTop.crossJoin(broadcast(sketchAndTotal))
      .select(col("o_custkey"), col("n_exact"),
        (est >= col("n_exact")).as("est_ge_exact"),
        ((est - col("n_exact")).cast("double") <=
          lit(math.E) * col("total").cast("double") /
            lit(SketchFunctions.CMS_W.toDouble)).as("within_bound"))
      .orderBy(col("n_exact").desc, col("o_custkey").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_profile" -> profileOrdersQ,
    "rel_outliers_mad" -> outliersMadQ,
    "rel_heavy_hitters" -> heavyHittersQ,
  )

  val oracles: Map[String, String] = Map(
    // exact counts are the hashed content; the sketch-property booleans
    // are deterministic for this data + hash constants and must be TRUE
    "rel_heavy_hitters" ->
      """WITH c AS (
        |  SELECT o_custkey, COUNT(*) AS n_exact FROM orders GROUP BY 1
        |)
        |SELECT o_custkey, n_exact, TRUE AS est_ge_exact, TRUE AS within_bound
        |FROM c ORDER BY n_exact DESC, o_custkey LIMIT 15""".stripMargin,
    "rel_profile" -> {
      val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      val selects = cols.map(c =>
        s"""SELECT '$c' AS "column", COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_value,
           |  CAST(MAX($c) AS VARCHAR) AS max_value
           |FROM orders""".stripMargin)
      selects.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    "rel_outliers_mad" ->
      """WITH ev AS (SELECT event_type, "value" AS v FROM events),
        |med AS (
        |  SELECT event_type, quantile_cont(v, 0.5) AS med FROM ev GROUP BY 1
        |), dev AS (
        |  SELECT e.event_type, e.v, m.med, abs(e.v - m.med) AS adev
        |  FROM ev e JOIN med m USING (event_type)
        |), mad AS (
        |  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
        |)
        |SELECT d.event_type, MIN(d.med) AS med, MIN(m.mad) AS mad,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
  )
}
