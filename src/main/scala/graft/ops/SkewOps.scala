package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Exact._

/** Skew-mitigation patterns (SURVEY §4.3 scale posture).
  *
  * A hot grouping key concentrates one reducer partition at shuffle time;
  * AQE's skew-join splitting covers joins but skewed AGGREGATION keys need
  * salting: shard each key into `nSalts` sub-keys for the partial
  * aggregate, then combine the shards. Results are identical to the
  * unsalted aggregate when every aggregate in play is commutative +
  * associative (sum/count/min/max — decimal sums here, so even float
  * summation order cannot show through).
  *
  * `saltedAgg` is the reusable operator; `rel_salted_agg` proves
  * equivalence against the plain-GROUP BY DuckDB oracle on the most skewed
  * real column in the corpus (events.event_type).
  */
object SkewOps {

  /** Two-stage salted aggregation: count + exact sum per key. */
  def saltedAgg(df: DataFrame, key: Column, value: Column, nSalts: Int): DataFrame =
    df.groupBy(key.as("k"), (monotonically_increasing_id() % nSalts).as("salt"))
      .agg(count(lit(1)).as("pn"), sum(value.cast(dec)).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).cast("double").as("sum_value"))

  private def saltedAggQ(s: SparkSession, dir: String): DataFrame =
    saltedAgg(graft.Tables(s, dir, "events"), col("event_type"), col("value"), 16)
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  /** Salted JOIN for a hot probe key: the big side gets a salt shard, the
    * small side is replicated once per shard, and the join runs on
    * (key, salt) — the hot key's rows spread over `nSalts` reducer
    * partitions instead of one. This is the manual fallback when AQE's
    * skew-join splitting can't apply (e.g. the skewed side is an
    * aggregation output, or partitions sit under the size threshold while
    * a single task still straggles). Results are identical to the plain
    * join by construction. */
  def saltedJoin(big: DataFrame, bigKey: Column, dim: DataFrame,
                 dimKey: Column, nSalts: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(monotonically_increasing_id(), lit(nSalts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1)).cast("array<long>")))
    salted.join(replicated,
      bigKey === dimKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Query: 90% of events collapse onto one hot derived key; the salted
    * join to a per-key dimension still balances. Oracle = the plain
    * unsalted join aggregate. */
  private def saltedJoinQ(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(s, dir, "events")
      .withColumn("k",
        when(col("user_id") % 10 < 9, 0L).otherwise(col("user_id")))
    val dim = ev.select(col("k")).distinct()
      .withColumn("k_attr", concat(lit("attr_"), (col("k") % 7).cast("string")))
    saltedJoin(ev, col("k"), dim.withColumnRenamed("k", "dk"), col("dk"), 8)
      .groupBy(col("k_attr"))
      .agg(count(lit(1)).as("n"), sumD(col("value")).as("sum_value"))
      .orderBy(col("k_attr"))
  }

  /** The audit that DECIDES when to salt: per-key row counts reduced to
    * the numbers a planner needs — heaviest keys with their share (basis
    * points), key count, and a table-wide skew factor (max/avg rows per
    * key, per-mille). Two hash aggregates (per-key counts partial-combine
    * map-side; the 1-row stats roll-up is metadata-sized and broadcast
    * back), then TakeOrderedAndProject for the top keys — no global sort,
    * no collect. All derived ratios are INTEGER arithmetic so both
    * engines agree bitwise. At 100 TB this is the cheap pre-flight that
    * tells you `rel_salted_join`'s nSalts before the expensive job runs. */
  private def skewAuditQ(s: SparkSession, dir: String): DataFrame = {
    val perKey = graft.Tables(s, dir, "events")
      .withColumn("key",
        when(col("user_id") % 10 < 9, 0L).otherwise(col("user_id")))
      .groupBy(col("key")).agg(count(lit(1)).as("n_rows"))
    val stats = perKey.agg(count(lit(1)).as("n_keys"),
      sum(col("n_rows")).cast("long").as("total_rows"),
      max(col("n_rows")).as("max_rows"))
    perKey.crossJoin(broadcast(stats))
      .withColumn("share_bp", expr("n_rows * 10000 DIV total_rows"))
      .withColumn("skew_pm", expr("max_rows * n_keys * 1000 DIV total_rows"))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(5)
      .select(col("key"), col("n_rows"), col("share_bp"), col("n_keys"),
        col("total_rows"), col("max_rows"), col("skew_pm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_salted_agg" -> saltedAggQ,
    "rel_salted_join" -> saltedJoinQ,
    "rel_skew_audit" -> skewAuditQ,
  )

  val oracles: Map[String, String] = Map(
    // the oracle is the UNSALTED aggregate — equivalence is the point
    "rel_salted_agg" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sumSql("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the oracle is the UNSALTED join — equivalence is the point
    "rel_salted_join" ->
      s"""WITH ev AS (
         |  SELECT *, CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id END AS k
         |  FROM events
         |), dim AS (
         |  SELECT DISTINCT k AS dk, 'attr_' || CAST(k % 7 AS VARCHAR) AS k_attr
         |  FROM ev
         |)
         |SELECT k_attr, COUNT(*) AS n, ${sumSql("value")} AS sum_value
         |FROM ev JOIN dim ON k = dk
         |GROUP BY k_attr ORDER BY k_attr""".stripMargin,
    "rel_skew_audit" ->
      """WITH pk AS (
        |  SELECT CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id END AS key,
        |         COUNT(*) AS n_rows
        |  FROM events GROUP BY 1
        |), st AS (
        |  SELECT COUNT(*) AS n_keys,
        |         CAST(SUM(n_rows) AS BIGINT) AS total_rows,
        |         MAX(n_rows) AS max_rows
        |  FROM pk
        |)
        |SELECT key, n_rows, n_rows * 10000 // total_rows AS share_bp,
        |       n_keys, total_rows, max_rows,
        |       max_rows * n_keys * 1000 // total_rows AS skew_pm
        |FROM pk, st
        |ORDER BY n_rows DESC, key LIMIT 5""".stripMargin,
  )
}
