package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-table operators: SCD2 history construction and CDC apply —
  * the change-data shapes every warehouse/lakehouse ingest pipeline runs.
  * (The reference's own D1 dedup, `task.ts:131-139`, is the degenerate
  * "keep only the latest version" case; these operators keep or fold the
  * full version chain.)
  *
  * Scale design: both operators shuffle ONCE on the entity key.
  *   - SCD2 is a single keyed window (lead) — the standard "close the
  *     previous version" formulation; no self-join, no second shuffle.
  *   - CDC apply is `max_by` over a version struct — a partial-aggregable
  *     last-wins (map-side combine shrinks each partition to one row per
  *     key BEFORE the shuffle, exactly like D1), then a filter drops
  *     tombstones. A window row_number would sort all versions per key;
  *     the aggregate form never materializes the losers.
  */
object HistoryOps {

  /** SCD2 over any version feed: appends `valid_to` (the next version's
    * `validFrom` within the same `key`, ties broken by `tieBreak`) and
    * `is_current`. One keyed window — one shuffle. */
  def scd2(df: DataFrame, key: String, validFrom: String,
           tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(validFrom), col(tieBreak))
    df.withColumn("valid_to", lead(col(validFrom), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** CDC fold over any change feed: latest change per `key` wins (version
    * order = lexicographic over `version` columns), `op` = "D" removes the
    * key, the named `attrs` of the winner survive. Partial-aggregable —
    * never sorts the losers. */
  def cdcApply(changes: DataFrame, key: String, op: String,
               attrs: Seq[String], version: Seq[String]): DataFrame =
    changes.groupBy(col(key))
      .agg(max_by(struct((op +: attrs).map(col): _*),
        struct(version.map(col): _*)).as("__last"))
      .filter(col(s"__last.$op") =!= "D")
      .select(col(key) +: (op +: attrs).map(c => col(s"__last.$c").as(c)): _*)

  /** SCD2: each order is a new version of its customer's state; close each
    * version at the next version's start. Ties on the date break by
    * orderkey so the chain is total-ordered and deterministic. */
  private def scd2Q(s: SparkSession, dir: String): DataFrame =
    scd2(graft.Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").as("valid_from")),
      "o_custkey", "valid_from", "o_orderkey")
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))

  /** CDC apply: a change feed (derived deterministically from orders —
    * ~10% deletes, ~30% updates, rest inserts; version = (date, orderkey))
    * folded to the final snapshot: latest change per key wins, deletes
    * remove the key. */
  private def cdcApplyQ(s: SparkSession, dir: String): DataFrame = {
    val changes = graft.Tables(s, dir, "orders").select(
      col("o_custkey").as("key"),
      when(col("o_orderkey") % 10 === 0, "D")
        .when(col("o_orderkey") % 10 < 4, "U").otherwise("I").as("op"),
      col("o_totalprice").as("attr"),
      col("o_orderdate").as("ver_ts"), col("o_orderkey").as("ver_seq"))
    cdcApply(changes, "key", "op", Seq("attr"), Seq("ver_ts", "ver_seq"))
      .orderBy(col("key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_scd2_history" -> scd2Q,
    "rel_cdc_apply" -> cdcApplyQ,
  )

  val oracles: Map[String, String] = Map(
    "rel_scd2_history" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM orders
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
    // oracle uses the window formulation — same semantics, different
    // (deliberately non-mirrored) plan shape
    "rel_cdc_apply" ->
      """WITH changes AS (
        |  SELECT o_custkey AS key,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'D'
        |         WHEN o_orderkey % 10 < 4 THEN 'U' ELSE 'I' END AS op,
        |    o_totalprice AS attr, o_orderdate AS ver_ts, o_orderkey AS ver_seq
        |  FROM orders
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY key
        |    ORDER BY ver_ts DESC, ver_seq DESC) AS rn
        |  FROM changes
        |)
        |SELECT key, op, attr FROM ranked
        |WHERE rn = 1 AND op <> 'D' ORDER BY key""".stripMargin,
  )
}
