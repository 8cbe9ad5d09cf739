package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities — the co-located-join path for repeated
  * fact-to-fact joins (SURVEY §4.3 / the 100 TB posture).
  *
  * A shuffle join of two 100 TB fact tables moves both tables over the
  * network every query. Writing them bucketed (and sorted) by the join key
  * makes every subsequent equi-join on that key shuffle-free: each task
  * reads bucket i of both sides and merge-joins locally. The write-side
  * shuffle is paid once, amortized over every downstream join/aggregation
  * keyed the same way.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equi-join two tables previously bucketed on `key` — planned with no
    * shuffle exchange on either side (verify with PlanSpec / explain). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Oracle-checked end-to-end: orders and customer written bucketed by the
    * (renamed-to-common) custkey, then the co-located join + rollup. The
    * join itself plans with zero exchanges (PlanSpec asserts this for the
    * same helper); only the tiny post-join segment rollup shuffles. The
    * oracle runs the plain join on the ORIGINAL tables, proving the
    * bucketed write→read→join cycle is lossless. */
  /** The in-memory catalog forgets managed tables across JVMs while their
    * warehouse directories persist, so a later session's CREATE fails with
    * LOCATION_ALREADY_EXISTS — drop both the entry and the directory. */
  def resetTable(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists()) Fs.deleteRecursively(loc)
  }

  private def bucketedJoinQ(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import Exact._
    resetTable(s, "graft_bkt_orders")
    resetTable(s, "graft_bkt_customer")
    writeBucketed(graft.Tables(s, dir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice")),
      "graft_bkt_orders", "custkey", 8)
    writeBucketed(graft.Tables(s, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment")),
      "graft_bkt_customer", "custkey", 8)
    colocatedJoin(s, "graft_bkt_orders", "graft_bkt_customer", "custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sumD(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_bucketed_join" -> bucketedJoinQ,
  )

  val oracles: Map[String, String] = Map(
    "rel_bucketed_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n,
         |  ${Exact.sumSql("o_totalprice")} AS sum_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  )
}
