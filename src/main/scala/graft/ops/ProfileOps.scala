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
    * drag. Two grouped exact-median passes (median, then MAD of the
    * deviations) with the group constants BROADCAST back between them,
    * then a conditional count of |x - med| > 3 * MAD. Both medians ride
    * `Relational2.groupedQuantiles` — a range exchange that spreads each
    * group across the cluster plus a boundary-row filter, never Spark's
    * whole-group-in-one-buffer `percentile` aggregate (the few-fat-groups
    * funnel at 100×); the kernel arithmetic is pinned bit-equal to
    * DuckDB's quantile_cont at rel_percentile, so the oracle is
    * unchanged. */
  private def outliersMadQ(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(s, dir, "events")
      .select(col("event_type"), col("value"))
    val med = Relational2.groupedQuantiles(ev, "event_type", "value",
        Seq(("med", 0.5)))
      .select(col("event_type"), col("med"))
    // dev feeds the MAD rank pass (its range sampler + its shuffle) AND
    // the final outlier count — staged so the broadcast join runs once
    // per pass instead of three times
    val dev = Staging.staged(s, dir, "mad_dev") {
      ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
    }
    val mad = Relational2.groupedQuantiles(
        dev.select(col("event_type"), col("adev")), "event_type", "adev",
        Seq(("mad", 0.5)))
      .select(col("event_type"), col("mad"))
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

  /** JOIN-SIZE ESTIMATION from sketches — the planner pre-flight that
    * decides shuffle sizing / strategy BEFORE paying for a 100 TB join:
    * |A ⋈ B| on key k equals Σ_k f_A(k)·f_B(k), and the CMS inner
    * product (AMS-style) estimates exactly that from two 64 KiB sketches
    * built in one pass per side — est_d = Σ_w cms_A[d][w]·cms_B[d][w],
    * answer = min over the D rows. Collisions only ADD mass, so the
    * estimate is one-sided (est ≥ exact, always), within e·N_A·N_B/W
    * with high probability; both properties are deterministic for this
    * data + hash chain and ride through the hash gate as literal TRUEs
    * (the oracle cannot rebuild the XXH64 chain, same contract as
    * `rel_heavy_hitters`). The exact join count is the calibration twin. */
  private def joinSizeEstQ(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.SketchFunctions
    SketchFunctions.register(s)
    val W = SketchFunctions.CMS_W
    val D = SketchFunctions.CMS_D
    // balanced scans: the sketch pass is per-row hash work directly above
    // the scan, and the single-row-group test corpus would feed each
    // side's partial aggregate one-threaded (at production file counts the
    // scans parallelize natively and the rebalance is a no-op by intent)
    val left = graft.Tables.balanced(s, dir, "events", "event_id")
      .select(col("user_id"))
    val right = graft.Tables.balanced(s, dir, "orders", "o_orderkey")
      .select(col("o_custkey"))
    val skL = left.agg(SketchFunctions.cmsSketch(col("user_id")).as("skl"),
      count(lit(1)).as("n_left"))
    val skR = right.agg(SketchFunctions.cmsSketch(col("o_custkey")).as("skr"),
      count(lit(1)).as("n_right"))
    val exact = left.join(right, col("user_id") === col("o_custkey"))
      .agg(count(lit(1)).as("exact_join_rows"))
    val rowEst = (d: Int) => aggregate(
      slice(col("prod"), d * W + 1, W), lit(0L), (acc, x) => acc + x)
    skL.crossJoin(broadcast(skR)).crossJoin(broadcast(exact))
      .withColumn("prod", zip_with(col("skl"), col("skr"), (x, y) => x * y))
      .withColumn("est", least((0 until D).map(rowEst): _*))
      .select(col("n_left"), col("n_right"), col("exact_join_rows"),
        (col("est") >= col("exact_join_rows")).as("est_ge_exact"),
        ((col("est") - col("exact_join_rows")).cast("double") <=
          lit(math.E) * col("n_left").cast("double") *
            col("n_right").cast("double") / lit(W.toDouble)).as("within_bound"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_profile" -> profileOrdersQ,
    "rel_outliers_mad" -> outliersMadQ,
    "rel_heavy_hitters" -> heavyHittersQ,
    "rel_join_size_est" -> joinSizeEstQ,
  )

  val oracles: Map[String, String] = Map(
    // exact counts are the hashed content; the sketch-property booleans
    // are deterministic for this data + hash constants and must be TRUE
    // exact twin is the hashed content; the sketch-property booleans are
    // deterministic for this data + hash chain and must be TRUE
    "rel_join_size_est" ->
      """SELECT (SELECT COUNT(*) FROM events) AS n_left,
        |       (SELECT COUNT(*) FROM orders) AS n_right,
        |       (SELECT COUNT(*) FROM events e JOIN orders o
        |          ON e.user_id = o.o_custkey) AS exact_join_rows,
        |       TRUE AS est_ge_exact, TRUE AS within_bound""".stripMargin,
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
