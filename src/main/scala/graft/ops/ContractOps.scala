package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-contract enforcement — the expectation checks (Deequ/dbt-test
  * style) an ingest pipeline runs before publishing a table. Two rule
  * families, each in its scale-correct shape:
  *
  *   - ROW rules (null/range/domain predicates): evaluated in ONE scan —
  *     every rule becomes a conditional-count aggregate over the same
  *     pass, then the per-rule columns unpivot to (rule, n_violations)
  *     rows. N rules never cost N scans; at 100 TB that's the difference
  *     between one pass and a pass per assertion.
  *   - REFERENTIAL rules (foreign-key membership): a left-anti join
  *     against the referenced key set — broadcast when the dimension is
  *     small (customer here), shuffle-hash otherwise.
  *
  * The output is the violation REPORT (rule, n_checked, n_violations),
  * not the violating rows — the aggregate a quality gate alerts on; the
  * quarantine-split variant of the same predicates is
  * `adsbx.ConfigValidation`'s permissive path. */
object ContractOps {

  /** One-scan rule report over any table: each (name, VIOLATION
    * predicate) becomes a conditional-count aggregate in a single pass,
    * unpivoted to (rule, n_checked, n_violations) rows. */
  def rowExpectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_checked") +:
      rules.map { case (name, viol) => sum(when(viol, 1L).otherwise(0L)).as(name) }
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array(col("n_checked")),
        rules.map { case (name, _) => col(name) }.toArray,
        "rule", "n_violations")
      .select(col("rule"), col("n_checked"), col("n_violations"))
  }

  /** Streaming form of the contract gate: attach the rule aggregates as
    * OBSERVED METRICS — computed inline with whatever the stream already
    * does (no second pass, no extra shuffle; metrics ride the existing
    * tasks) and surfaced per micro-batch through
    * `StreamingQueryProgress.observedMetrics("contract")`. This is how a
    * 100 TB/day ingest watches its own quality: alert on a batch's
    * violation counts without ever running a separate audit job.
    * (`StreamObserveSpec` pins metrics == batch counts; the batch report
    * form is `rowExpectations`.) */
  def observedGate(stream: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map { case (name, viol) => sum(when(viol, 1L).otherwise(0L)).as(name) }
    stream.observe("contract", aggs.head, aggs.tail: _*)
  }

  /** Row-level rules as (name, VIOLATION predicate). */
  private def rowRules: Seq[(String, Column)] = Seq(
    "totalprice_positive" -> (col("o_totalprice") <= 0),
    "status_in_domain" -> !col("o_orderstatus").isin("F", "O", "P"),
    "date_before_2001" -> (col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
    "priority_nonnull" -> col("o_orderpriority").isNull,
  )

  private def expectationsQ(s: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables(s, dir, "orders")
    val long = rowExpectations(orders, rowRules)
    // referential rule: orphaned o_custkey values (anti join against the
    // broadcast customer key set)
    val orphans = orders.join(
        broadcast(graft.Tables(s, dir, "customer").select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(orders.agg(count(lit(1)).as("n_checked"))))
      .select(col("n_checked"), lit("custkey_references_customer").as("rule"),
        col("n_violations"))
    long.unionByName(orphans)
      .select(col("rule"), col("n_checked"), col("n_violations"))
      .orderBy(col("rule"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_expectations" -> expectationsQ,
  )

  val oracles: Map[String, String] = Map(
    "rel_expectations" ->
      """WITH rows_checked AS (SELECT COUNT(*) AS n FROM orders)
        |SELECT 'totalprice_positive' AS rule, (SELECT n FROM rows_checked) AS n_checked,
        |  COUNT(*) FILTER (WHERE o_totalprice <= 0) AS n_violations FROM orders
        |UNION ALL
        |SELECT 'status_in_domain', (SELECT n FROM rows_checked),
        |  COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')) FROM orders
        |UNION ALL
        |SELECT 'date_before_2001', (SELECT n FROM rows_checked),
        |  COUNT(*) FILTER (WHERE o_orderdate >= TIMESTAMP '2001-01-01') FROM orders
        |UNION ALL
        |SELECT 'priority_nonnull', (SELECT n FROM rows_checked),
        |  COUNT(*) FILTER (WHERE o_orderpriority IS NULL) FROM orders
        |UNION ALL
        |SELECT 'custkey_references_customer', (SELECT n FROM rows_checked),
        |  COUNT(*) FILTER (WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |FROM orders
        |ORDER BY rule""".stripMargin,
  )
}
