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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_profile" -> profileOrdersQ,
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
  )
}
