package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.adsbx.Dedup
import Exact._

/** Relational operator suite over the driver corpus (SURVEY §2.9): every
  * classical operator category the reference touches (projection, filter,
  * broadcast equi-join, last-wins dedup) re-exercised at corpus scale, plus
  * the standard categories a complete engine needs (semi/anti join, window
  * top-k, rollup, set ops, as-of join, sessionization, JSON/date/string
  * functions).
  *
  * Scale posture (designed for 100 TB, tested at sf0.1):
  *   - aggregations are hash aggregates with map-side partial combine;
  *   - small dimensions (part, customer, nation, region ≤ O(10^5) rows at
  *     any realistic SF of this star schema's dims) are broadcast — no
  *     shuffle of the fact table for enrichment joins;
  *   - windows partition on high-cardinality keys (user_id, event_id), never
  *     a global single-partition window;
  *   - filters/projections sit directly on the parquet scan (pushdown).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables(s, dir, name)

  // ---- queries ----------------------------------------------------------

  /** TPC-H Q1-shaped pushdown aggregation. */
  private def aggPricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumD(col("l_quantity")).as("sum_qty"),
        sumD(col("l_extendedprice")).as("sum_base_price"),
        sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avgD(col("l_quantity")).as("avg_qty"),
        avgD(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Filter + scalar projection (P5/P13-style unit conversions at scale);
    * predicates and column pruning reach the parquet scan. */
  private def filterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 47.0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") * 0.514444d).as("qty_ms"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("charge"),
        concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flag_status"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** 9-way CASE/switch (P7-style categorical mapping) + aggregation. */
  private def caseWhen(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("prio_code",
        when(col("o_orderpriority") === "1-URGENT", "U")
          .when(col("o_orderpriority") === "2-HIGH", "H")
          .when(col("o_orderpriority") === "3-MEDIUM", "M")
          .when(col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW"), "L")
          .otherwise("?"))
      .groupBy(col("prio_code"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sumD(col("o_totalprice")).as("sum_price"))
      .orderBy(col("prio_code"), col("o_orderstatus"))

  /** D1 at corpus scale: last event per user (same Dedup.lastWins operator
    * the fidelity pipeline uses; event_id = arrival order). */
  private def dedupLastWins(s: SparkSession, dir: String): DataFrame =
    Dedup.lastWins(t(s, dir, "events"), "user_id", "event_id")
      .orderBy(col("user_id"))

  /** J2 at corpus scale: broadcast equi-join enrichment of the fact table
    * by a filtered small dimension. */
  private def broadcastEnrich(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 47.0)
      .join(broadcast(t(s, dir, "part").filter(col("p_size") <= 5)),
        col("l_partkey") === col("p_partkey"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("p_name"),
        col("p_brand"), col("p_type"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Left-semi join: customers having at least one urgent order. */
  private def semiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Left-anti join: customers with no in-progress ('P') orders. */
  private def antiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Window top-k: 3 highest-value orders per market segment (broadcast the
    * customer dim onto orders, then a keyed window). */
  private def windowTopK(s: SparkSession, dir: String): DataFrame = {
    // balanced: the broadcast probe + WindowGroupLimit partial pass are
    // map-side and would serialize on the single-split scan
    val joined = graft.Tables.balanced(s, dir, "orders", "o_orderkey")
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"), "inner")
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
        col("o_totalprice"), col("c_name"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  /** ROLLUP over the geography dimension (grouping-set aggregation). */
  private def rollupGeo(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sumD(col("c_acctbal")).as("sum_bal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_cust"), col("sum_bal"))
      .orderBy(col("region"), col("nation"))

  /** CUBE over (status, priority) — all four grouping sets in one pass
    * (Expand + single hash aggregate, not four scans). */
  private def cubeQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumD(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  /** Set operations: customers with both finished and open orders
    * (INTERSECT), only-finished (EXCEPT), tagged and unioned. */
  private def setOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey")).distinct()
    f.intersect(open).withColumn("tag", lit("both"))
      .union(f.except(open).withColumn("tag", lit("f_only")))
      .select(col("tag"), col("o_custkey"))
      .orderBy(col("tag"), col("o_custkey"))
  }

  /** Multi-way star join: revenue by region and order year. Dimensions are
    * broadcast; only the two fact tables shuffle (on the orderkey). */
  private def starJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("int").as("order_year"))
      .agg(sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("order_year"))

  /** As-of join: for each sampled event, the user's most recent order at
    * event time. Equi-join on the key + range predicate, reduced per event
    * with a keyed window (scale: this is the standard distributed as-of
    * pattern — shuffle both sides by key, never a cross product). */
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    val joined = ev.join(o,
      ev("user_id") === o("o_custkey") && o("o_orderdate") <= ev("ts"), "inner")
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    joined.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("event_id"))
  }

  /** JSON field extraction + aggregation over events.props. The scan is
    * `balanced`: per-row JSON parsing is the query's cost, and the
    * single-row-group corpus would otherwise feed the parser one
    * partition (= one thread) up to the aggregation shuffle. */
  private def jsonExtract(s: SparkSession, dir: String): DataFrame =
    graft.Tables.balanced(s, dir, "events", "event_id")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sumD(col("value")).as("sum_value"))
      .orderBy(col("k"))

  /** Date/time functions: daily activity rollup. */
  private def datetimeDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sumD(col("value")).as("sum_value"))
      .orderBy(col("day"))

  /** String function battery over part names. */
  private def stringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_partkey") % 7 === 0)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 8).as("prefix8"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("snake"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  /** Sessionization (gaps-and-islands): 30-minute inactivity gap splits a
    * user's events into sessions. Batch equivalent of the streaming
    * session-window operator in graft.streaming. */
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(cum))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sumD(col("value")).as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Tumbling window aggregation (batch form of the streaming hourly
    * window; window().start == date_trunc('hour')). */
  private def hourlyWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("w_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sumD(col("value")).as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .orderBy(col("w_start"), col("event_type"))

  /** Approximate distinct (HyperLogLog++) — the constant-memory
    * alternative to countDistinct at 100 TB (no exact-distinct shuffle of
    * the key space). Sketch values can't hash-match across engines, so the
    * query asserts its own error bound instead: it emits the exact count
    * plus `within_bounds` = |approx-exact|/exact <= 5% (the sketch runs at
    * rsd 0.01, so 5% is a ±5σ envelope) and the oracle expects TRUE —
    * a drifting sketch now fails the hash check rather than going
    * unverified. */
  private def approxDistinctQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx_users") - col("exact_users")).cast("double") /
          col("exact_users").cast("double") <= 0.05).as("within_bounds"))
      .orderBy(col("event_type"))

  /** Re-aggregatable cardinality — the property `approx_count_distinct`
    * LACKS at 100 TB: its estimate is final, so every new rollup grain
    * rescans raw data. DataSketches HLL (`hll_sketch_agg`) emits a
    * MERGEABLE binary sketch instead: build one sketch per
    * (event_type, day) — the nightly-partition grain, each a few KiB of
    * metadata — then any coarser rollup (per type here; weekly, all-time,
    * cross-type in general) is `hll_union_agg` over stored sketches,
    * never a rescan of events. The union is exact over sketches (no
    * compounding), so the rolled estimate equals a direct sketch of the
    * group. Twin pattern as rel_approx_distinct: the oracle verifies the
    * exact columns; `within_bounds` (lgK=12 → rsd 1.6%, 5% ≈ 3σ) must
    * come out TRUE, so a drifting union fails the hash check. */
  private def hllReaggQ(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val daily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val rolled = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("approx_users"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(rolled, "event_type")
      .select(col("event_type"), col("exact_users"), col("n_days"),
        (abs(col("approx_users") - col("exact_users")).cast("double") /
          col("exact_users").cast("double") <= 0.05).as("within_bounds"))
      .orderBy(col("event_type"))
  }

  /** Exact interpolated percentiles (≡ Spark `percentile` ≡ DuckDB
    * `quantile_cont`) WITHOUT the whole-group buffer: Spark's exact
    * `percentile` is an ImperativeAggregate that holds every group value
    * in one task's aggregation buffer — with 3 fat groups at 100× that is
    * a single-task funnel plus an OOM cliff. `Relational2.groupedQuantiles`
    * computes the identical values from the groupedRank range exchange
    * (each group spread across the whole cluster) plus a boundary-row
    * filter; the interpolation arithmetic reproduces Percentile's kernel
    * bit-for-bit, so the quantile_cont oracle is unchanged. */
  private def percentileQ(s: SparkSession, dir: String): DataFrame =
    Relational2.groupedQuantiles(
        t(s, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice")),
        "l_returnflag", "l_extendedprice",
        Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)))
      .withColumnRenamed("__n", "n")
      .orderBy(col("l_returnflag"))

  /** Global ORDER BY + LIMIT — planned as TakeOrderedAndProject: each
    * partition keeps its local top-N, only N rows per partition reach the
    * driver-side merge; no global sort of the fact table ever runs. */
  private def topN(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)

  /** Pivot (long→wide reshape): revenue by status x priority. Values are
    * enumerated explicitly — at scale an unspecified pivot triggers a
    * distinct-values collect before planning. */
  private val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private def pivotQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot(col("o_orderpriority"), prios)
      .agg(sumD(col("o_totalprice")))
      .orderBy(col("o_orderstatus"))

  /** Window with a RANGE frame: 7-day trailing spend per customer at each
    * order (event-time range frames, not row counts — the frame the rows
    * variant cannot express when orders per day vary). */
  private def windowRange(s: SparkSession, dir: String): DataFrame = {
    val days7 = 7L * 86400L
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("ts_s"))
      .rangeBetween(-days7, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("ts_s", unix_timestamp(col("o_orderdate")))
      .withColumn("trailing_7d", sum(col("o_totalprice").cast(Exact.dec)).over(w).cast("double"))
      .withColumn("n_7d", count(lit(1)).over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"), col("trailing_7d"), col("n_7d"))
      .orderBy(col("o_orderkey"))
  }

  /** SQL entry point: the same engine surface through `spark.sql` over
    * registered views (TPC-H Q3-shaped). The SQL text below runs verbatim
    * in BOTH engines — Spark executes it here, DuckDB executes it as the
    * oracle — demonstrating ANSI-dialect interchangeability. */
  val q3Sql: String =
    s"""SELECT l_orderkey,
       |  ${sumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  o_orderdate
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '2024-06-01'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  private def sqlQ3(s: SparkSession, dir: String): DataFrame = {
    for (name <- Seq("customer", "orders", "lineitem"))
      t(s, dir, name).createOrReplaceTempView(name)
    s.sql(q3Sql)
  }

  /** Exact distinct aggregation. */
  private def countDistinctQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_orderpriority")).as("n_prio"))
      .orderBy(col("o_orderstatus"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_agg_pricing" -> aggPricing,
    "rel_filter_project" -> filterProject,
    "rel_case_when" -> caseWhen,
    "rel_dedup_lastwins" -> dedupLastWins,
    "rel_broadcast_enrich" -> broadcastEnrich,
    "rel_semi_join" -> semiJoin,
    "rel_anti_join" -> antiJoin,
    "rel_window_topk" -> windowTopK,
    "rel_rollup_geo" -> rollupGeo,
    "rel_set_ops" -> setOps,
    "rel_star_join" -> starJoin,
    "rel_asof_join" -> asofJoin,
    "rel_json_extract" -> jsonExtract,
    "rel_datetime_daily" -> datetimeDaily,
    "rel_string_funcs" -> stringFuncs,
    "rel_sessionize" -> sessionize,
    "rel_hourly_window" -> hourlyWindow,
    "rel_count_distinct" -> countDistinctQ,
    "rel_approx_distinct" -> approxDistinctQ,
    "rel_hll_reagg" -> hllReaggQ,
    "rel_percentile" -> percentileQ,
    "rel_topn" -> topN,
    "rel_pivot" -> pivotQ,
    "rel_sql_q3" -> sqlQ3,
    "rel_window_range" -> windowRange,
    "rel_cube" -> cubeQ,
  )

  val oracles: Map[String, String] = Map(
    "rel_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sumSql("l_quantity")} AS sum_qty,
         |  ${sumSql("l_extendedprice")} AS sum_base_price,
         |  ${sumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${avgSql("l_quantity")} AS avg_qty,
         |  ${avgSql("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "rel_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity * CAST(0.514444 AS DOUBLE) AS qty_ms,
        |  l_extendedprice / l_quantity AS unit_price,
        |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
        |  l_returnflag || '/' || l_linestatus AS flag_status
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 47.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "rel_case_when" ->
      s"""SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'U'
         |            WHEN o_orderpriority = '2-HIGH' THEN 'H'
         |            WHEN o_orderpriority = '3-MEDIUM' THEN 'M'
         |            WHEN o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') THEN 'L'
         |            ELSE '?' END AS prio_code,
         |  o_orderstatus, COUNT(*) AS n, ${sumSql("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1, 2 ORDER BY prio_code, o_orderstatus""".stripMargin,
    "rel_dedup_lastwins" ->
      """SELECT user_id, arg_max(ts, event_id) AS ts,
        |  arg_max(event_type, event_id) AS event_type,
        |  arg_max(value, event_id) AS value,
        |  arg_max(props, event_id) AS props
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "rel_broadcast_enrich" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_brand, p_type, l_quantity, l_extendedprice
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity >= 47.0 AND p_size <= 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "rel_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "rel_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "rel_window_topk" ->
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice, c_name FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice, c_name,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |) WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "rel_rollup_geo" ->
      s"""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
         |  COUNT(*) AS n_cust, ${sumSql("c_acctbal")} AS sum_bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)
         |ORDER BY region, nation""".stripMargin,
    "rel_set_ops" ->
      """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
        |UNION ALL
        |SELECT 'f_only' AS tag, o_custkey FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
        |ORDER BY tag, o_custkey""".stripMargin,
    "rel_star_join" ->
      s"""SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS order_year,
         |  ${sumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1, 2 ORDER BY r_name, order_year""".stripMargin,
    "rel_asof_join" ->
      """SELECT event_id, user_id, ts, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rk
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |  WHERE e.event_id % 20 = 0
        |) WHERE rk = 1 ORDER BY event_id""".stripMargin,
    "rel_json_extract" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
         |  COUNT(*) AS n, ${sumSql("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "rel_datetime_daily" ->
      s"""SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
         |  COUNT(DISTINCT user_id) AS n_users, ${sumSql("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "rel_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substring(p_name, 1, 8) AS prefix8,
        |  regexp_replace(p_name, ' ', '_', 'g') AS snake,
        |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
        |  p_brand || ':' || p_type AS brand_type
        |FROM part WHERE p_partkey % 7 = 0 ORDER BY p_partkey""".stripMargin,
    "rel_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_s
         |  FROM (SELECT user_id, event_id, ts, value,
         |          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |        FROM events)
         |), sess AS (
         |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM flagged
         |)
         |SELECT user_id, session_idx, COUNT(*) AS n_events,
         |  MIN(ts) AS session_start, MAX(ts) AS session_end,
         |  ${sumSql("value")} AS sum_value
         |FROM sess GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,
    "rel_hourly_window" ->
      s"""SELECT date_trunc('hour', ts) AS w_start, event_type, COUNT(*) AS n,
         |  ${sumSql("value")} AS sum_value, MIN(value) AS min_value, MAX(value) AS max_value
         |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "rel_count_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(*) AS n_orders, COUNT(DISTINCT o_orderpriority) AS n_prio
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the sketch side is checked by the query itself (within_bounds must
    // come out TRUE); the oracle verifies the exact twin columns
    "rel_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |  COUNT(*) AS n, TRUE AS within_bounds
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // union-of-daily-sketches is checked in-query (within_bounds TRUE);
    // the oracle verifies the exact twin and the day-grain row count
    "rel_hll_reagg" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events GROUP BY 1, 2
        |), nd AS (
        |  SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY 1
        |), ex AS (
        |  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        |  FROM events GROUP BY 1)
        |SELECT ex.event_type, ex.exact_users, nd.n_days,
        |  TRUE AS within_bounds
        |FROM ex JOIN nd USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "rel_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.9) AS p90,
        |  quantile_cont(l_extendedprice, 0.99) AS p99,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "rel_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,
    "rel_pivot" -> {
      val cols = prios.map(p =>
        s"""${sumSql(s"CASE WHEN o_orderpriority = '$p' THEN o_totalprice END")} AS "$p"""")
        .mkString(",\n  ")
      s"""SELECT o_orderstatus,
         |  $cols
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },
    "rel_sql_q3" -> q3Sql, // the SAME text Spark executes
    "rel_window_range" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE) AS trailing_7d,
        |  COUNT(*) OVER w AS n_7d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "rel_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  COUNT(*) AS n, ${sumSql("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,
  )
}
