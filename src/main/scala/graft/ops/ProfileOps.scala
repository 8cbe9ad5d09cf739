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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_profile" -> profileOrdersQ,
    "rel_outliers_mad" -> outliersMadQ,
  )

  val oracles: Map[String, String] = Map(
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
