package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical profiling operators — the data-science layer a training
  * corpus pipeline runs BEFORE committing to a mixture: per-group modes,
  * exact-sum correlation/regression, class-balance impurity, and
  * independence testing between categorical dimensions, plus ordered
  * event-sequence matching (the MATCH_RECOGNIZE shape).
  *
  * Cross-engine exactness discipline (shared with GraphOps' fixed-point
  * PageRank): every aggregate accumulates in BIGINT (exact, associative,
  * order-free), and the floating-point formula runs ONCE over those exact
  * sums with an identical expression spelling in both engines — IEEE
  * `* / - sqrt` are correctly rounded, so identical inputs through an
  * identical expression tree are bit-identical regardless of engine or
  * cluster size. Outputs are round-half-up quantized at 1e-6 via the
  * explicit floor spelling (see TimeSeriesOps) because `round()` differs
  * between engines exactly on representable midpoints.
  *
  * Scale notes per operator inline; none carries an unpartitioned window
  * over row data — windows only ever run on group-count aggregates whose
  * cardinality is the (tiny) category space.
  */
object StatOps {

  private def r6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5d)).cast("double") / lit(1e6)

  private val r6Sql: String => String =
    x => s"CAST(floor(($x) * 1e6 + 0.5) AS DOUBLE) / 1e6"

  // ---------------------------------------------------------------- mode

  /** Per-group mode with a deterministic tie-break (smaller value wins).
    * Shape at scale: ONE shuffle to the (group, value) aggregate — the
    * shuffle key space is the category product, not the corpus — then a
    * window over that tiny aggregate picks the argmax. */
  def mode(d: DataFrame, group: Column, value: Column): DataFrame = {
    val counts = d.groupBy(group.as("grp"), value.as("value"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("cnt").desc, col("value").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .withColumn("n_rows", sum(col("cnt")).over(Window.partitionBy(col("grp"))))
      .filter(col("rk") === 1)
      .select(col("grp"), col("value").as("mode_value"),
        col("cnt").as("mode_cnt"), col("n_rows"),
        r6(col("cnt").cast("double") / col("n_rows").cast("double"))
          .as("mode_share"))
  }

  private def modeQ(s: SparkSession, dir: String): DataFrame =
    mode(graft.Tables(s, dir, "orders"),
        col("o_orderpriority"), col("o_orderstatus"))
      .withColumnRenamed("grp", "o_orderpriority")
      .orderBy(col("o_orderpriority"))

  // ------------------------------------------------- correlation + OLS

  /** Pearson correlation + least-squares line per group from exact integer
    * moment sums (n, Σx, Σy, Σx², Σy², Σxy). x = quantity (integral),
    * y = extendedprice rounded to whole units. ALL moments (first- and
    * second-order) accumulate in decimal, not BIGINT: Spark's non-ANSI
    * long sum silently WRAPS on overflow while DuckDB promotes to HUGEINT,
    * so a user-supplied y large enough to push Σy or Σy² past 2⁶³ would
    * make the two engines silently diverge. The per-row cast is
    * DECIMAL(19,0) — lossless for every long (max |long| ≈ 9.2e18 < 1e19),
    * so the cast itself can never null; the product precision 19+19+1=39
    * caps to Spark's max 38, and max |long·long| ≈ 8.5e37 still fits in
    * 38 digits, so only the final SUM can overflow — and a decimal sum
    * overflow surfaces as NULL (a loud hash-gate failure), never a wrapped
    * or silently-dropped number. The double formula runs once per GROUP
    * (5 rows), never per row; map-side partial aggregation makes the
    * moment pass one reduced shuffle of 6 narrow values per group per
    * task. */
  def corrRegr(d: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    val mdec = org.apache.spark.sql.types.DecimalType(19, 0)
    val agg = d
      .select(group.as("grp"), x.cast("long").as("x"),
        floor(y + lit(0.5d)).cast("long").as("y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(mdec)).as("sx"), sum(col("y").cast(mdec)).as("sy"),
        sum(col("x").cast(mdec) * col("x").cast(mdec)).as("sxx"),
        sum(col("y").cast(mdec) * col("y").cast(mdec)).as("syy"),
        sum(col("x").cast(mdec) * col("y").cast(mdec)).as("sxy"))
    val nd = col("n").cast("double")
    def dbl(c: String) = col(c).cast("double")
    val cov = nd * dbl("sxy") - dbl("sx") * dbl("sy")
    val varx = nd * dbl("sxx") - dbl("sx") * dbl("sx")
    val vary = nd * dbl("syy") - dbl("sy") * dbl("sy")
    val slope = cov / varx
    agg.select(col("grp"), col("n"),
      r6(slope).as("slope"),
      r6((dbl("sy") - slope * dbl("sx")) / nd).as("intercept"),
      r6(cov / sqrt(varx * vary)).as("corr"))
  }

  private def corrRegrQ(s: SparkSession, dir: String): DataFrame =
    corrRegr(graft.Tables(s, dir, "lineitem"),
        col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .withColumnRenamed("grp", "l_returnflag")
      .orderBy(col("l_returnflag"))

  // -------------------------------------------------------------- gini

  /** Per-group Gini impurity of a categorical column — the class-balance
    * metric a mixture designer reads before weighting sources — plus the
    * majority class and its share. gini = 1 - Σc²/n² from exact counts;
    * one shuffle to the (group, class) aggregate, windows over it only. */
  def giniImpurity(d: DataFrame, group: Column, cls: Column): DataFrame = {
    val counts = d.groupBy(group.as("grp"), cls.as("cls"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("grp"))
    val wTop = w.orderBy(col("cnt").desc, col("cls").asc)
    counts
      .withColumn("rk", row_number().over(wTop))
      .withColumn("n", sum(col("cnt")).over(w))
      .withColumn("sc2", sum(col("cnt") * col("cnt")).over(w))
      .withColumn("n_classes", count(lit(1)).over(w))
      .filter(col("rk") === 1)
      .select(col("grp"), col("n"), col("n_classes"),
        r6(lit(1.0d) - col("sc2").cast("double")
          / (col("n").cast("double") * col("n").cast("double"))).as("gini"),
        col("cls").as("top_class"),
        r6(col("cnt").cast("double") / col("n").cast("double"))
          .as("top_share"))
  }

  private def giniQ(s: SparkSession, dir: String): DataFrame =
    giniImpurity(graft.Tables(s, dir, "documents"),
        col("source"), col("lang"))
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))

  // ------------------------------------------------------ chi² cells

  /** Pearson chi-squared contingency cells between two categoricals: one
    * row per cell with observed count, expected count, and the cell's χ²
    * contribution — emitted PER CELL (the scalar Σ would sum doubles in
    * engine-dependent order; the per-cell value is a single deterministic
    * expression over exact BIGINT marginals). Row/column marginals come
    * from re-aggregating the cell table (category-space sized) and join
    * back broadcast — no window over row data, no second corpus scan. */
  def chi2Cells(d: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = d.groupBy(a.as("a"), b.as("b"))
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("a")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("b")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"))
    def dbl(c: String) = col(c).cast("double")
    val num = dbl("o") * dbl("n") - dbl("rt") * dbl("ct")
    cells
      .join(broadcast(rt), "a").join(broadcast(ct), "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("o").as("observed"),
        r6(dbl("rt") * dbl("ct") / dbl("n")).as("expected"),
        r6(num * num / (dbl("rt") * dbl("ct") * dbl("n"))).as("chi2_contrib"))
  }

  private def chi2Q(s: SparkSession, dir: String): DataFrame =
    chi2Cells(graft.Tables(s, dir, "lineitem"),
        col("l_returnflag"), col("l_linestatus"))
      .withColumnRenamed("a", "l_returnflag")
      .withColumnRenamed("b", "l_linestatus")
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // ---------------------------------------------------- Shannon entropy

  /** Per-group Shannon entropy of a categorical column (nats) plus the
    * [0,1]-normalized form H/ln(k) — the diversity gauge that reads the
    * opposite end from gini_impurity's purity and makes groups with
    * different class counts comparable. Same plan family: ONE shuffle to
    * the (group, class) aggregate, marginals broadcast back, each term
    * (c/n)·ln(c/n) 6 dp-quantized (the PSI ln contract) and Σ'd in exact
    * DECIMAL(18,6) — order-free. Single-class groups emit norm_entropy 0
    * directly (ln(1) = 0 denominators never divide). */
  def entropyBy(d: DataFrame, group: Column, cls: Column): DataFrame = {
    val counts = d.groupBy(group.as("grp"), cls.as("cls"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.groupBy(col("grp"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_classes"))
    def dbl(c: String) = col(c).cast("double")
    val p = dbl("cnt") / dbl("n")
    val term = r6(p * log(p))
    counts.join(broadcast(tot), "grp")
      .select(col("grp"), col("n"), col("n_classes"), term.as("t"))
      .groupBy(col("grp"), col("n"), col("n_classes"))
      .agg((-sum(col("t")
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double")).as("entropy"))
      .select(col("grp"), col("n"), col("n_classes"),
        r6(col("entropy")).as("entropy"),
        when(col("n_classes") === 1, lit(0.0d))
          .otherwise(r6(col("entropy")
            / log(col("n_classes").cast("double")))).as("norm_entropy"))
  }

  private def entropyQ(s: SparkSession, dir: String): DataFrame =
    entropyBy(graft.Tables(s, dir, "documents"), col("source"), col("lang"))
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))

  // -------------------------------------------- Gini concentration

  /** Gini coefficient of a nonnegative measure across keys (the Lorenz
    * concentration: 0 = evenly spread, →1 = one key holds everything) —
    * the mixture-design diagnostic for "how concentrated is revenue /
    * token mass across customers / sources". Computed from the rank
    * identity G = (2·Σ r·x − (n+1)·Σx) / (n·Σx) over ascending-rank
    * totals.
    *
    * Shape: one corpus shuffle to the per-key totals (exact DECIMAL
    * sums of 2 dp-quantized values), then `Relational2.globalRank` —
    * a range exchange, NOT a single-partition window — ranks the
    * key-cardinality frame; the two moment sums are exact decimals and
    * the G formula is ONE double expression. EAGER: the rank
    * substrate's offset pass runs at plan build. */
  def giniConcentration(d: DataFrame, key: Column, value: Column): DataFrame = {
    val dec2 = org.apache.spark.sql.types.DecimalType(15, 2)
    val totals = d.select(key.as("k"), value.cast(dec2).as("x"))
      .groupBy(col("k")).agg(sum(col("x")).as("x"))
    val ranked = Relational2.globalRank(totals, col("x"), col("k"))
    val m = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("__rank")).as("srx"))
    def dbl(c: String) = col(c).cast("double")
    m.select(col("n").as("n_keys"),
      r6((lit(2.0d) * dbl("srx") - (dbl("n") + lit(1.0d)) * dbl("sx"))
        / (dbl("n") * dbl("sx"))).as("gini"))
  }

  private def giniConcQ(s: SparkSession, dir: String): DataFrame =
    giniConcentration(graft.Tables(s, dir, "orders"),
      col("o_custkey"), col("o_totalprice"))

  // --------------------------------------------------- basket lift

  /** Market-basket association between items co-occurring in a basket
    * (here: event types within a user-day): support, confidence and lift
    * per ordered item pair — the co-occurrence view that complements
    * rel_markov_transitions' sequence view ("what happens together"
    * vs "what happens next").
    *
    * Shape: one corpus shuffle to the distinct (basket, item) frame;
    * pairs form by a basket-keyed self-equi-join (bounded by items² per
    * basket — the item space, never the corpus); item and basket totals
    * are category-sized aggregates joined back broadcast. All three
    * metrics are single exact-BIGINT ratios.
    *
    * Skew guards (the a-priori discipline — the self-join is quadratic
    * PER BASKET KEY, the one shape a single hot key can sink):
    *   - `minSupport` prefilters items below the support threshold
    *     BEFORE the self-join (one item-space hash aggregate + semi-join
    *     — the standard frequent-itemset first pass). Pairs of
    *     sub-threshold items can never reach minSupport co-occurrences,
    *     so no reported pair is lost; n_baskets stays the UNFILTERED
    *     basket count (support keeps its usual denominator).
    *   - `maxBasketItems` REFUSES (raise_error in-plan, never a silent
    *     choke or drop) any basket whose post-filter item count would
    *     put >maxBasketItems² candidates in one task — a 10⁴-item
    *     user-day means 10⁸ pairs on one key; the caller decides whether
    *     to cap, salt, or drop that basket, not the engine.
    *
    * 10×-rehearsal (r14): 2.70× wall for 10× data with the guards in
    * place — the r13 weak flag (5.18×, the suite's worst) cleared.
    *
    * Default `minSupport = 1` reports EVERY co-occurring pair — the
    * pre-r14 API contract (r15, per advisor: the r14 guard work briefly
    * defaulted this to 2, silently dropping support-1 items/pairs for
    * existing callers; the registered rel_basket_lift query passes 2
    * explicitly and its oracle/records are unchanged). At 1 the
    * prefilter semi-join is a no-op and only maxBasketItems bounds the
    * hot-basket explosion — large-corpus callers should raise it. */
  def basketLift(d: DataFrame, basket: Column, item: Column,
                 minSupport: Long = 1L,
                 maxBasketItems: Long = 4096L): DataFrame = {
    require(minSupport >= 1 && maxBasketItems >= 1,
      s"basketLift thresholds must be >= 1 " +
        s"(got minSupport=$minSupport, maxBasketItems=$maxBasketItems)")
    // materialized once (r16 optimization): the distinct corpus pass
    // feeds THREE branches (the basket total, the per-item supports —
    // read again by the final lift joins — and the prefilter) and
    // Catalyst does not dedupe common subtrees; same for the guarded
    // frame below (both pair-join sides). EAGER — SparkEntry.eagerQueries.
    val bi0 = d.select(basket.as("bk"), item.as("it")).distinct()
      .localCheckpoint(true)
    val nb = bi0.agg(count_distinct(col("bk")).as("n_baskets"))
    val ni = bi0.groupBy(col("it")).agg(count(lit(1)).as("n_item"))
    val bi = bi0.join(ni.filter(col("n_item") >= minSupport)
      .select(col("it")), Seq("it"), "left_semi")
    // basket size as a rider on ONE bk-keyed window pass (baskets are
    // many and — post-guard — small, so the per-key funnel is harmless;
    // a groupBy + join-back would shuffle the frame twice)
    val guarded = bi
      .withColumn("bsz",
        count(lit(1)).over(Window.partitionBy(col("bk"))))
      .select(col("bk"),
        when(col("bsz") <= maxBasketItems, col("it"))
          .otherwise(raise_error(concat(
            lit("basketLift: a basket holds "), col("bsz").cast("string"),
            lit(s" items after the min-support filter (> maxBasketItems=" +
              s"$maxBasketItems) — its pair explosion would land on ONE " +
              "task; cap, salt, or drop the hot basket")))).as("it"))
      .localCheckpoint(true)
    val pairs = guarded.as("l")
      .join(guarded.as("r"), col("l.bk") === col("r.bk") &&
        col("l.it") < col("r.it"))
      .groupBy(col("l.it").as("a"), col("r.it").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    def dbl(c: String) = col(c).cast("double")
    pairs
      .join(broadcast(ni.select(col("it").as("a"), col("n_item").as("n_a"))), "a")
      .join(broadcast(ni.select(col("it").as("b"), col("n_item").as("n_b"))), "b")
      .crossJoin(broadcast(nb))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        r6(dbl("n_ab") / dbl("n_baskets")).as("support"),
        r6(dbl("n_ab") / dbl("n_a")).as("confidence"),
        r6(dbl("n_ab") * dbl("n_baskets") / (dbl("n_a") * dbl("n_b")))
          .as("lift"))
  }

  private def basketLiftQ(s: SparkSession, dir: String): DataFrame =
    basketLift(graft.Tables(s, dir, "events"),
        // numeric basket key (user, epoch-day): a LONG shuffles, hashes
        // and compares for a fraction of the string-concat form's cost,
        // and the key is engine-internal — only the grouping semantics
        // must agree with the oracle, not the key's spelling
        col("user_id") * lit(1000000L)
          + (unix_micros(date_trunc("day", col("ts"))) / lit(86400000000L))
            .cast("long"),
        col("event_type"),
        // explicit, NOT the API default: the registered query (and its
        // oracle, and the r14 records) verify the minSupport=2 a-priori
        // path; the public API defaults to the report-everything 1
        minSupport = 2L)
      .orderBy(col("a"), col("b"))

  // ----------------------------------------------- Kaplan–Meier survival

  private val KM_CENSOR_H = 24 // lookback: users active this close to the
                               // corpus end are censored, not churned

  /** Kaplan–Meier survival estimate of user lifetime (first→last activity,
    * in whole hours) with right-censoring — the retention curve read
    * off an event stream: users whose last event falls within
    * `censorHours` of the corpus end are censored (still alive), not
    * counted as churn. S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) over death times.
    *
    * Shape: one corpus shuffle to the per-user (first, last) aggregate,
    * then every frame is lifetime-bucket sized — the at-risk counts are
    * a DESCENDING cumulative window and the survival product an
    * ascending one, both over the tiny (cohort, t) aggregate, never row
    * data. Determinism: lifetimes are exact integer-microsecond
    * divisions; the product is computed as exp(Σ terms) where each term
    * ln(1 − d/n) is 6 dp-quantized and the Σ runs in exact
    * DECIMAL(18,6) (order-free); a time where ALL remaining at-risk die
    * (1 − d/n = 0) emits survival 0 directly instead of ln(0).
    *
    * Contract: `cohort` must be constant per key (it is aggregated with
    * max() — a key whose rows disagree silently lands in the larger
    * cohort; derive it from the key, as the corpus query does). */
  def survivalKm(d: DataFrame, key: Column, ts: Column, cohort: Column,
                 censorHours: Int = KM_CENSOR_H): DataFrame = {
    val perUser = d.groupBy(key.as("k"))
      .agg(max(cohort).as("cohort"),
        min(unix_micros(ts)).as("first_us"),
        max(unix_micros(ts)).as("last_us"))
    val horizon = perUser.agg(
      (max(col("last_us")) - lit(censorHours.toLong * 3600000000L))
        .as("cut_us"))
    val lives = perUser.crossJoin(broadcast(horizon))
      .select(col("cohort"),
        expr("(last_us - first_us) div 3600000000").as("t"),
        when(col("last_us") < col("cut_us"), lit(1L)).otherwise(lit(0L))
          .as("is_death"))
    val byT = lives.groupBy(col("cohort"), col("t"))
      .agg(count(lit(1)).as("cnt"), sum(col("is_death")).as("d"))
    val wRisk = Window.partitionBy(col("cohort")).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risked = byT.withColumn("n_risk", sum(col("cnt")).over(wRisk))
      .filter(col("d") > 0)
    val term = r6(log(lit(1.0d)
      - col("d").cast("double") / col("n_risk").cast("double")))
    val wSurv = Window.partitionBy(col("cohort")).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risked
      .withColumn("lterm", when(col("d") < col("n_risk"), term))
      .withColumn("csum",
        sum(col("lterm").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .over(wSurv).cast("double"))
      .select(col("cohort"), col("t").as("t_hours"), col("n_risk"),
        col("d").as("n_deaths"),
        when(col("d") === col("n_risk"), lit(0.0d))
          .otherwise(r6(exp(col("csum")))).as("survival"))
  }

  private def survivalQ(s: SparkSession, dir: String): DataFrame =
    survivalKm(graft.Tables(s, dir, "events"),
        col("user_id"), col("ts"), pmod(col("user_id"), lit(2)))
      .orderBy(col("cohort"), col("t_hours"))

  // ------------------------------------------------------ Benford audit

  /** First-significant-digit distribution vs Benford's law — the
    * fabricated-data / corruption screen an ingest pipeline runs over
    * monetary or count columns. The digit is extracted from an EXACT
    * integer (values scaled to cents and half-up-rounded to BIGINT, then
    * first char of the decimal string — double→string formatting differs
    * across engines, integer→string does not; scaling by 100 doesn't
    * move the first significant digit). One corpus shuffle to the 9-row
    * digit aggregate; expectations log10(1+1/d) are computed ONCE
    * driver-side and embedded as exact decimal literals in plan and
    * oracle. Emits observed count, share, expectation, and deviation. */
  def benford(d: DataFrame, value: Column): DataFrame = {
    val cents = floor(value * lit(100.0d) + lit(0.5d)).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    // domain gate, identical in both engines: beyond ~9e13 the cents
    // double exceeds 2^53 (digit no longer exact) and the long cast's
    // overflow semantics diverge between engines (Spark nulls, DuckDB
    // throws) — exclude loudly-by-contract rather than diverge silently.
    // The lower bound is 0.005, NOT 0: values in (0, 0.005) scale to
    // cents 0, whose "digit" 0 has no Benford expectation — it would
    // emit a meaningless bucket (NULL expect/deviation) and skew every
    // other digit's share for small-valued columns
    val counts = d.filter(value >= lit(0.005d) && value < lit(9.0e13))
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("observed"))
    val n = counts.agg(sum(col("observed")).as("n"))
    val expect = (1 to 9).map(dd =>
        when(col("digit") === dd, lit(math.log10(1.0 + 1.0 / dd))): Column)
      .reduceRight((a, b) => a.otherwise(b))
    counts.crossJoin(broadcast(n))
      .select(col("digit"), col("observed"),
        r6(col("observed").cast("double") / col("n").cast("double")).as("share"),
        expect.as("benford_expect"),
        r6(col("observed").cast("double") / col("n").cast("double") - expect)
          .as("deviation"))
  }

  private def benfordQ(s: SparkSession, dir: String): DataFrame =
    benford(graft.Tables(s, dir, "orders"), col("o_totalprice"))
      .orderBy(col("digit"))

  // ------------------------------------------------- Markov transitions

  /** First-order Markov transition table over per-key event sequences:
    * for each (state, next-state) pair, the observed transition count and
    * the row-normalized probability — the behavior model a sessionized
    * product funnel or a synthetic-data generator is fit from.
    *
    * Shape at scale: ONE keyed window (partition by the sequence key —
    * millions of keys spread the sort across the cluster) produces the
    * lead pairs; the transition aggregate shuffles on the (state, state)
    * product — the category space, not the corpus — and the row
    * normalization is a window over that tiny aggregate. Probabilities
    * are a single exact-BIGINT ratio evaluated once in doubles. */
  def markovTransitions(d: DataFrame, key: Column, ts: Column, ord: Column,
                        state: Column): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("o"))
    val cells = d.select(key.as("k"), ts.as("t"), ord.as("o"), state.as("s"))
      .withColumn("nxt", lead(col("s"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("s").as("from_state"), col("nxt").as("to_state"))
      .agg(count(lit(1)).as("cnt"))
    val wRow = Window.partitionBy(col("from_state"))
    cells
      .withColumn("row_n", sum(col("cnt")).over(wRow))
      .select(col("from_state"), col("to_state"), col("cnt"),
        r6(col("cnt").cast("double") / col("row_n").cast("double")).as("p"))
  }

  private def markovQ(s: SparkSession, dir: String): DataFrame =
    markovTransitions(graft.Tables(s, dir, "events"),
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .orderBy(col("from_state"), col("to_state"))

  // ---------------------------------------------------- mutual information

  /** Mutual information between two categorical columns, emitted per cell
    * (observed count + the cell's PMI contribution p(a,b)·ln(p(a,b)/(p(a)
    * p(b)))) with the total MI carried on every row — the
    * feature-relevance score a mixture designer ranks metadata columns by
    * (chi² asks "independent?"; MI answers "how many nats does knowing A
    * tell you about B?").
    *
    * Same plan family as chi2Cells: one shuffle to the (a, b) cell
    * aggregate, category-space marginals re-aggregated from the cells and
    * joined back broadcast. Determinism: each cell term is ONE double
    * expression over exact BIGINT counts — ln() at 6 dp is the
    * established cross-engine contract (see PSI above) — and the total
    * sums the ROUNDED terms in exact DECIMAL(18,6), so the Σ is
    * order-free where a double Σ would be engine-dependent. Unobserved
    * cells are correctly ABSENT here (lim p→0 of p·ln(p/q) is 0, so MI
    * ranges over observed cells only) — the opposite of cramersV, whose
    * χ² must complete the grid. */
  def mutualInfo(d: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = d.groupBy(a.as("a"), b.as("b"))
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("a")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("b")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"))
    def dbl(c: String) = col(c).cast("double")
    val contrib = r6((dbl("o") / dbl("n"))
      * log(dbl("o") * dbl("n") / (dbl("rt") * dbl("ct"))))
    val scored = cells
      .join(broadcast(rt), "a").join(broadcast(ct), "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("o").as("observed"),
        contrib.as("pmi_contrib"))
    val total = scored.agg(
      sum(col("pmi_contrib").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double").as("mi_total"))
    scored.crossJoin(broadcast(total))
  }

  private def mutualInfoQ(s: SparkSession, dir: String): DataFrame =
    mutualInfo(graft.Tables(s, dir, "documents"), col("lang"), col("source"))
      .withColumnRenamed("a", "lang")
      .withColumnRenamed("b", "source")
      .orderBy(col("lang"), col("source"))

  // --------------------------------------------------------- Cramér's V

  /** Cramér's V effect size between two categoricals — the bounded [0,1]
    * association strength that makes chi² values comparable across
    * tables of different size and shape: V = sqrt(χ²/n / (min(r,c)−1)).
    * Same cell/marginal plan as chi2Cells; the scalar χ² is the exact
    * DECIMAL(18,6) Σ of the 6 dp-rounded cell contributions (order-free
    * — a double Σ would be engine-dependent), and the final sqrt runs
    * once over that exact sum. Emits one row: n, r, c, chi2, v. */
  def cramersV(d: DataFrame, a: Column, b: Column): DataFrame = {
    val obs = d.groupBy(a.as("a"), b.as("b"))
      .agg(count(lit(1)).as("o"))
    // χ² ranges over the FULL r×c grid: an unobserved cell still
    // contributes (0−E)²/E = rt·ct/n — dropping zero cells understates
    // the statistic exactly when association is strongest (a perfect
    // 2×2 would read V = √½ instead of 1). The grid is the category
    // product — metadata-scale — so the completion is a broadcast
    // cross join + left join, never a corpus operation.
    // obs is category-product-sized (metadata): broadcast it EXPLICITLY —
    // left to the planner, this was a borderline auto-broadcast reading
    // run-jittering size estimates, one of r15's three plan-fingerprint
    // residuals (identical code occasionally fingerprinting differently)
    val cells = obs.select(col("a")).distinct()
      .crossJoin(broadcast(obs.select(col("b")).distinct()))
      .join(broadcast(obs), Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("o"), lit(0L)).as("o"))
    val rt = cells.groupBy(col("a")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("b")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"))
    def dbl(c: String) = col(c).cast("double")
    val num = dbl("o") * dbl("n") - dbl("rt") * dbl("ct")
    val contrib = r6(num * num / (dbl("rt") * dbl("ct") * dbl("n")))
    val dims = cells.agg(
      count_distinct(col("a")).as("r"), count_distinct(col("b")).as("c"))
    cells
      .join(broadcast(rt), "a").join(broadcast(ct), "b")
      .crossJoin(broadcast(n))
      .select(contrib.as("contrib"), col("n"))
      .groupBy(col("n"))
      .agg(sum(col("contrib")
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double").as("chi2"))
      .crossJoin(broadcast(dims))
      .select(col("n"), col("r"), col("c"), r6(col("chi2")).as("chi2"),
        r6(sqrt(col("chi2") / col("n").cast("double")
          / (least(col("r"), col("c")).cast("double") - lit(1.0d)))).as("v"))
  }

  private def cramersVQ(s: SparkSession, dir: String): DataFrame =
    cramersV(graft.Tables(s, dir, "orders"),
      col("o_orderpriority"), col("o_orderstatus"))

  // ------------------------------------------------- Mann–Whitney U test

  /** Mann–Whitney U (Wilcoxon rank-sum) with midranks and the tie
    * correction — the NONPARAMETRIC sibling of rel_welch_ttest (no
    * normality assumption; detects stochastic dominance, not just mean
    * shift), completing the two-sample family with rel_ks_drift: U₁ from
    * the sample-1 midrank sum, z under the normal approximation with the
    * Σ(t³−t) tie term, and the rank-biserial effect size 2U₁/(n₁n₂) − 1.
    *
    * Shape: pooled ranks come from `Relational2.globalRank` — ONE range
    * exchange, never a single-partition window — and every downstream
    * frame is VALUE-space sized (per-distinct-value min/max rank +
    * counts). Exactness: midranks are carried DOUBLED ((min+max) is an
    * exact integer where midrank itself is a .5 multiple), every Σ runs
    * in DECIMAL, and the z/effect formulas evaluate once in doubles over
    * those exact sums. EAGER: the rank substrate runs at plan build. */
  def mannWhitney(d: DataFrame, inA: Column, value: Column,
                  ord: Column): DataFrame = {
    val mdec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pooled = d.select(value.as("v"), ord.as("i"),
      when(inA, lit(1L)).otherwise(lit(0L)).as("a"))
    val ranked = Relational2.globalRank(pooled, col("v"), col("i"))
    val perV = ranked.groupBy(col("v")).agg(
      min(col("__rank")).as("minr"), max(col("__rank")).as("maxr"),
      count(lit(1)).as("t"), sum(col("a")).as("t1"))
    val m = perV.agg(
      sum(col("t1")).as("n1"), sum(col("t") - col("t1")).as("n2"),
      // Σ over sample-1 members of (2·midrank) = Σ t1·(minr+maxr)
      sum((col("t1").cast(mdec))
        * (col("minr") + col("maxr")).cast(mdec)).as("r1x2"),
      sum((col("t").cast(mdec) * col("t").cast(mdec) * col("t").cast(mdec)
        - col("t").cast(mdec))).as("tie3"))
    def dbl(c: String) = col(c).cast("double")
    val n1 = dbl("n1"); val n2 = dbl("n2")
    val nn = n1 + n2
    val u1 = dbl("r1x2") / lit(2.0d) - n1 * (n1 + lit(1.0d)) / lit(2.0d)
    val mu = n1 * n2 / lit(2.0d)
    val varU = n1 * n2 / lit(12.0d) *
      ((nn + lit(1.0d)) - dbl("tie3") / (nn * (nn - lit(1.0d))))
    m.filter(col("n1") >= 1 && col("n2") >= 1)
      .select(col("n1"), col("n2"),
        r6(u1).as("u_stat"),
        // all-tied pool degenerates varU to 0: emit NULL, not a 0/0 NaN
        // whose semantics differ across engines (the ksDrift guard)
        when(varU > 0.0d, r6((u1 - mu) / sqrt(varU))).as("z"),
        r6(lit(2.0d) * u1 / (n1 * n2) - lit(1.0d)).as("rank_biserial"))
  }

  private def mannWhitneyQ(s: SparkSession, dir: String): DataFrame =
    mannWhitney(
      graft.Tables(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase")),
      col("event_type") === "click", col("value"), col("event_id"))

  // -------------------------------------------------------- Welch t-test

  /** Welch's unequal-variance two-sample t-test per group: the experiment
    * readout (treatment vs control means differ?) that doesn't assume
    * pooled variance. Per group, both samples' first/second moments
    * accumulate as exact DECIMAL(18,6) sums — values keep 6 fractional
    * digits, so double-valued metrics are NOT rounded to integers —
    * (one corpus shuffle to the
    * (group, arm) aggregate — category-space); mean, sample variance,
    * the t statistic and the Welch–Satterthwaite df are then ONE double
    * expression per output over those exact sums, spelled identically in
    * both engines. Groups missing an arm or with n < 2 on either side
    * are filtered out rather than emitting NULL/NaN mid-expression
    * (double 0/0 semantics differ across engines). */
  def welchTTest(d: DataFrame, group: Column, arm: Column, armA: String,
                 armB: String, value: Column): DataFrame = {
    // moments through DECIMAL(18,6) — crossCorr's fixed-scale discipline:
    // fractional values keep 6 decimal digits (a DECIMAL(19,0) cast would
    // silently half-up-round a double-valued column to integers before
    // summing), the x·x product lands on DECIMAL(37,12) (valid in BOTH
    // engines — (19,0)² would need precision 39 in DuckDB), and the sums
    // stay exact/partition-order-free with a loud NULL on overflow,
    // never a silent wrap
    val mdec = org.apache.spark.sql.types.DecimalType(18, 6)
    // domain gate (r15, per advisor): DECIMAL(18,6) holds |x| < 1e12; a
    // larger value's cast NULLs silently on Spark while count(1) still
    // counts the row — SUM skips the NULL, so the mean/variance would be
    // quietly biased with no error (DuckDB errors instead, so only
    // direct API callers were exposed). Raise in-plan like the
    // basket-lift hot-key guard: the contract is loud, not dependent on
    // cross-engine comparison. NULL x keeps flowing (pre-existing
    // skip-NULL-in-sums semantics, unchanged).
    val xGated = when(value.isNull || abs(value.cast("double")) < lit(1.0e12d),
        value)
      .otherwise(raise_error(concat(
        lit("welchTTest: |value| >= 1e12 exceeds the DECIMAL(18,6) moment "
          + "domain (the sum would silently NULL); rescale or filter")))
    )
    val m = d.filter(arm.isin(armA, armB))
      .select(group.as("grp"), when(arm === armA, lit(0)).otherwise(lit(1)).as("arm"),
        xGated.as("x"))
      .groupBy(col("grp"), col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("x").cast(mdec)).as("sx"),
        sum(col("x").cast(mdec) * col("x").cast(mdec)).as("sxx"))
    val a0 = m.filter(col("arm") === 0).select(col("grp"),
      col("n").as("n1"), col("sx").as("sx1"), col("sxx").as("sxx1"))
    val b0 = m.filter(col("arm") === 1).select(col("grp"),
      col("n").as("n2"), col("sx").as("sx2"), col("sxx").as("sxx2"))
    def dbl(c: String) = col(c).cast("double")
    // sample variance via the n·Σx² − (Σx)² spelling over exact ints
    def meanOf(n: String, sx: String) = dbl(sx) / dbl(n)
    def varOf(n: String, sx: String, sxx: String) =
      (dbl(n) * dbl(sxx) - dbl(sx) * dbl(sx)) / (dbl(n) * (dbl(n) - lit(1.0d)))
    val v1 = varOf("n1", "sx1", "sxx1")
    val v2 = varOf("n2", "sx2", "sxx2")
    val se1 = v1 / dbl("n1")
    val se2 = v2 / dbl("n2")
    a0.join(b0, "grp")
      .filter(col("n1") >= 2 && col("n2") >= 2)
      .select(col("grp"), col("n1"), col("n2"),
        r6(meanOf("n1", "sx1")).as("mean_a"),
        r6(meanOf("n2", "sx2")).as("mean_b"),
        r6((meanOf("n1", "sx1") - meanOf("n2", "sx2"))
          / sqrt(se1 + se2)).as("t_stat"),
        r6((se1 + se2) * (se1 + se2)
          / (se1 * se1 / (dbl("n1") - lit(1.0d))
            + se2 * se2 / (dbl("n2") - lit(1.0d)))).as("df"))
  }

  private def welchQ(s: SparkSession, dir: String): DataFrame =
    welchTTest(
        graft.Tables(s, dir, "lineitem")
          .withColumn("q", col("l_quantity").cast("long")),
        col("l_returnflag"), col("l_linestatus"), "F", "O", col("q"))
      .withColumnRenamed("grp", "l_returnflag")
      .orderBy(col("l_returnflag"))

  // --------------------------------------------------------- winsorize

  /** Winsorized summary per group: clip `value` at the exact DISCRETE
    * p-low/p-high percentiles (value at rank ceil(p·n/100) — an actual
    * data value, so clipped values keep the source's 2-decimal scale and
    * the mean accumulates in EXACT decimal, partition-order-free) and
    * report the bounds + winsorized mean — the robust-mean companion to
    * rel_outliers_mad. Ranks come from `Relational2.groupedRank` — a
    * range repartition on (group, value) plus narrow per-partition
    * offset arithmetic — NOT a keyed sort window, which funnels each
    * group through one task and stops scaling when groups are few and
    * fat (the window form measured 4.8× on the 10× rehearsal with 3
    * groups; groupedRank spreads each group across the whole cluster). */
  def winsorize(d: DataFrame, group: Column, value: Column,
                pLow: Int = 5, pHigh: Int = 95): DataFrame = {
    // pLow = 0 would compute bound rank ceil(0·n/100) = 0, matching no
    // row: p_lo comes out NULL and the low-side clip silently no-ops
    // (and Spark/DuckDB least/greatest null handling has differed across
    // versions). Reject the degenerate bounds loudly instead.
    require(pLow >= 1 && pHigh <= 100 && pLow <= pHigh,
      s"winsorize percentile bounds must satisfy 1 <= pLow <= pHigh <= 100" +
        s" (got pLow=$pLow, pHigh=$pHigh)")
    val base = d.select(group.as("grp"), value.as("v"))
    val ranked = Relational2.groupedRank(base, "grp", col("v"))
      .withColumnRenamed("__grank", "rn").withColumnRenamed("__gn", "n")
    // ONE pass over the ranked frame (r16 optimization round): the former
    // shape re-scanned the SOURCE to clip every row against the broadcast
    // bounds (scan + join + second aggregate), but the winsorized sum
    // decomposes exactly by rank segment — ranks below the low bound all
    // contribute p_lo, above the high bound p_hi, the middle its own
    // value — so the bounds, the segment counts and the middle sum come
    // out of the SAME aggregate. Decimal arithmetic is exact and
    // associative, so count·CAST(bound AS DECIMAL) equals the former
    // per-row clipped decimal sum bit-for-bit. NULL values rank first and
    // clipped to p_lo under the old least/greatest NULL handling at ANY
    // rank — the v-IS-NULL disjunct reproduces that, keeping the public
    // API engine-consistent on nullable inputs.
    val loR = expr(s"($pLow * n + 99) div 100")
    val hiR = expr(s"($pHigh * n + 99) div 100")
    val dc = "decimal(15,2)"
    // Null-boundary semantics (r17, advisor item): when a group has
    // >= pLow% NULLs the row at the p_lo boundary rank is NULL (nulls
    // rank first), and the former `n_lo * p_lo` term nulled the whole
    // wins_mean where the old per-row least/greatest form stayed numeric.
    // The per-row form's null algebra, spelled per rank segment (Spark's
    // least/greatest SKIP nulls):
    //   v NULL             -> coalesce(p_lo, p_hi)   (null contribution
    //                          is ignored by the sum, like any null row)
    //   v != NULL, rn<loR  -> p_lo  (non-null below the boundary implies
    //                          the boundary row is non-null)
    //   v != NULL, mid     -> v
    //   v != NULL, rn>hiR  -> p_hi when present, else v (p_hi NULL means
    //                          every non-null row ranks above hiR: no clip)
    // and the mean is NULL only for an all-NULL group — exactly the old
    // sum-of-nulls. On null-free groups every extra term collapses to the
    // former expression bit-for-bit.
    val zero = lit(0).cast(dc)
    ranked.groupBy(col("grp")).agg(
        max(col("n")).as("n"),
        max(when(col("rn") === loR, col("v"))).as("p_lo"),
        max(when(col("rn") === hiR, col("v"))).as("p_hi"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(col("v").isNotNull && col("rn") < loR, 1L).otherwise(0L))
          .as("n_lo"),
        sum(when(col("v").isNotNull && col("rn") > hiR, 1L).otherwise(0L))
          .as("n_hi"),
        sum(when(col("v").isNotNull && col("rn") >= loR && col("rn") <= hiR,
          col("v").cast(dc))).as("mid_sum"),
        sum(when(col("v").isNotNull && col("rn") > hiR, col("v").cast(dc)))
          .as("hi_sum"))
      .select(col("grp"), col("n"), col("p_lo"), col("p_hi"),
        when(col("n_null") === col("n"), lit(null).cast("double"))
          .otherwise(r6(
            (coalesce(col("n_null") * coalesce(col("p_lo"), col("p_hi")).cast(dc), zero)
              + coalesce(col("n_lo") * col("p_lo").cast(dc), zero)
              + coalesce(col("mid_sum"), zero)
              + coalesce(when(col("p_hi").isNotNull,
                  col("n_hi") * col("p_hi").cast(dc))
                .otherwise(col("hi_sum")), zero)).cast("double")
            / col("n").cast("double"))).as("wins_mean"))
  }

  private def winsorizeQ(s: SparkSession, dir: String): DataFrame =
    winsorize(graft.Tables(s, dir, "lineitem"),
        col("l_returnflag"), col("l_extendedprice"))
      .withColumnRenamed("grp", "l_returnflag")
      .orderBy(col("l_returnflag"))

  // ------------------------------------------------- sequence matching

  /** Ordered event-sequence matching (the MATCH_RECOGNIZE / funnel-regex
    * shape, restricted to CONSECUTIVE rows): find every occurrence of the
    * exact step sequence `pattern` in each key's event stream. One keyed
    * window (lead per step) — a single shuffle on the key, no self-join,
    * no path explosion; the per-row state is |pattern| lookahead values.
    * Emits (key, start/end ids, span in µs). */
  def sequenceMatch(d: DataFrame, key: Column, order: Seq[Column],
                    step: Column, id: Column, ts: Column,
                    pattern: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val steps = pattern.zipWithIndex.map { case (p, i) =>
      (if (i == 0) step else lead(step, i).over(w)) === lit(p)
    }.reduce(_ && _)
    d.select(key.as("key"), id.as("start_id"), unix_micros(ts).as("t0"),
        lead(id, pattern.size - 1).over(w).as("end_id"),
        lead(unix_micros(ts), pattern.size - 1).over(w).as("t1"),
        steps.as("hit"))
      .filter(col("hit"))
      .select(col("key"), col("start_id"), col("end_id"),
        (col("t1") - col("t0")).as("span_us"))
  }

  private val FUNNEL = Seq("view", "click", "purchase")

  private def seqMatchQ(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(s, dir, "events")
    sequenceMatch(ev, col("user_id"),
        Seq(col("ts"), col("event_id")),
        col("event_type"), col("event_id"), col("ts"), FUNNEL)
      .withColumnRenamed("key", "user_id")
      .orderBy(col("user_id"), col("start_id"))
  }

  // ------------------------------------------------- gaps and islands

  /** Gaps-and-islands over a sparse integer key sequence: contiguous runs
    * of PRESENT keys (islands) via the classic rank-difference trick —
    * key − global_rank is constant exactly within an island. The global
    * rank rides `Relational2.globalRank` (one range exchange + narrow
    * per-partition arithmetic, no single-partition window), the island
    * fold is one hash aggregate on the constant, and only the top-`topK`
    * longest islands (len desc, start asc — deterministic) are emitted
    * with the island count alongside. The audit shape for sequence
    * completeness checks (missing orderkey ranges, log-offset holes). */
  def gapsIslands(keys: DataFrame, key: Column, topK: Int = 20): DataFrame = {
    val ranked = Relational2.globalRank(keys.select(key.as("k")).distinct(),
      col("k"))
    val islands = ranked
      .withColumn("grp", col("k") - col("__rank"))
      .groupBy(col("grp"))
      .agg(min(col("k")).as("start_key"), max(col("k")).as("end_key"),
        count(lit(1)).as("len"))
    val n = islands.agg(count(lit(1)).as("n_islands"))
    islands.orderBy(col("len").desc, col("start_key").asc).limit(topK)
      .crossJoin(broadcast(n))
      .select(col("start_key"), col("end_key"), col("len"), col("n_islands"))
  }

  private def gapsIslandsQ(s: SparkSession, dir: String): DataFrame =
    gapsIslands(graft.Tables(s, dir, "lineitem"), col("l_orderkey"))
      .orderBy(col("len").desc, col("start_key"))

  // ------------------------------------------------------- decile lift

  /** Model-evaluation gains table: rows ranked by `score` descending,
    * cut into 10 closed-form deciles (decile = (rank−1)·10 div n + 1 —
    * uniform, deterministic, spelled identically in the oracle), then
    * per-decile positives and the CUMULATIVE capture rate and lift a
    * campaign/classifier eval reads. The rank is `globalRank` (range
    * exchange, no global-sort funnel); cumulation happens on the 10-row
    * decile aggregate via a broadcast ≤ self-join — decile² = 100
    * pairs, metadata-scale. */
  def decileLift(d: DataFrame, score: Column, id: Column,
                 pos: Column): DataFrame = {
    val ranked = Relational2.globalRank(
      d.select(score.as("s"), id.as("i"),
        when(pos, 1L).otherwise(0L).as("p")),
      col("s").desc, col("i"))
    val dec = ranked
      .withColumn("decile", expr("(__rank - 1) * 10 div __n + 1"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_rows"), sum(col("p")).as("n_pos"))
    val tot = dec.agg(sum(col("n_rows")).as("tn"), sum(col("n_pos")).as("tp"))
    val cum = dec.select(col("decile").as("d2"), col("n_rows").as("nr2"),
      col("n_pos").as("np2"))
    dec.join(broadcast(cum), col("d2") <= col("decile"))
      .groupBy(col("decile"), col("n_rows"), col("n_pos"))
      .agg(sum(col("nr2")).as("cum_n"), sum(col("np2")).as("cum_pos"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_rows"), col("n_pos"),
        r6(col("cum_pos").cast("double") / col("tp").cast("double"))
          .as("capture"),
        r6((col("cum_pos").cast("double") / col("cum_n").cast("double"))
          / (col("tp").cast("double") / col("tn").cast("double")))
          .as("lift"))
      .orderBy(col("decile"))
  }

  private def decileLiftQ(s: SparkSession, dir: String): DataFrame =
    decileLift(graft.Tables(s, dir, "orders"), col("o_totalprice"),
      col("o_orderkey"), col("o_orderstatus") === "F")

  // ------------------------------------------------- distribution drift

  /** EXACT two-sample Kolmogorov–Smirnov statistic — the
    * distribution-drift monitor a continuously-fed training pipeline runs
    * between corpus versions / time windows / sources: D = sup|F̂₁ − F̂₂|
    * over the two empirical CDFs, computed exactly at every jump point.
    *
    * Scalable shape — NO prefix-scan, NO single-partition window, ONE
    * range exchange: `globalGroupedRank` attaches the global rank AND the
    * in-sample rank to every row in a single fused pass (r12 paid
    * globalRank + groupedRank — two range exchanges over the same (v, i)
    * order — plus a row-id join to recombine them; the fused kernel's
    * job 1 already counts per (partition, group), so the global offset is
    * a prefix over the same metadata). For any row, the count of sample-1
    * values ≤ it is its in-group rank if it IS sample 1, else
    * global − in-group — so both CDFs fall out of the two rank columns.
    * Tied values are absorbed per value block (max of the monotone
    * cumulative counts per distinct value) so the sup is evaluated only
    * AFTER each tie group, exactly like the textbook definition.
    * Everything is exact integer counts until two final divisions —
    * bit-identical in any engine, under any partitioning. An EMPTY sample
    * (n_ref or n_cur = 0) makes those divisions engine-dependent
    * NaN/∞ noise, so it raises in-plan instead of returning a
    * meaningless top row. EAGER (rank substrate). Returns ONE row:
    * (ks_stat, at_value, n_ref, n_cur). */
  def ksDrift(d: DataFrame, inRef: Column, value: Column,
              id: Column): DataFrame = {
    val base = d.select(value.as("v"),
        when(inRef, 1L).otherwise(0L).as("grp"), id.as("i"))
      .filter(col("v").isNotNull)
    val rg = Relational2.globalGroupedRank(base, "grp", col("v"), col("i"))
    val c1 = when(col("grp") === 1L, col("__grank"))
      .otherwise(col("__rank") - col("__grank"))
    // the sample sizes are RIDER columns — every row carries its group's
    // total (__gn) and the pooled total (__n), so n1 is a per-row
    // constant (its group total if sample 1, pooled − group total if
    // sample 0) and no second aggregate + cross join is needed
    val n1Row = when(col("grp") === 1L, col("__gn"))
      .otherwise(col("__n") - col("__gn"))
    val pv = rg
      .groupBy(col("v"))
      .agg(max(c1).as("c1"), max(col("__rank")).as("rr"),
        max(n1Row).as("n1"), max(col("__n")).as("nn"))
    val emptySample = col("n1") === 0L || col("n1") === col("nn")
    pv.select(
        when(emptySample, raise_error(lit(
          "ksDrift: empty reference or current sample — KS undefined")))
          .otherwise(
            abs(col("c1").cast("double") / col("n1").cast("double") -
              (col("rr") - col("c1")).cast("double") /
                (col("nn") - col("n1")).cast("double")))
          .as("ks_stat"),
        col("v").as("at_value"), col("n1").as("n_ref"),
        (col("nn") - col("n1")).as("n_cur"))
      .orderBy(col("ks_stat").desc, col("at_value").asc)
      .limit(1)
  }

  private def ksDriftQ(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
    ksDrift(ev, col("event_type") === "click", col("value"), col("event_id"))
  }

  /** Population Stability Index between a reference and a current sample
    * — the binned drift score model-monitoring dashboards alert on:
    * deciles of the REFERENCE distribution (exact, via `globalRank` —
    * no whole-column sort funnel) become the bins, both samples count
    * into them, PSI = Σ (q−p)·ln(q/p) with the standard 1e-6 floor on
    * empty-bin shares. Per-bin terms are rounded 6 dp before the exact
    * decimal total (ln is 1-ulp engine-dependent — the text_lm_score
    * contract); counts and shares are exact. EAGER (rank substrate +
    * boundary collect — bins−1 doubles, metadata). Emits one row per
    * bin plus the riding total. */
  def psiDrift(d: DataFrame, inRef: Column, value: Column, id: Column,
               bins: Int = 10): DataFrame = {
    val base = d.select(value.as("v"),
        when(inRef, 1L).otherwise(0L).as("grp"), id.as("i"))
      .filter(col("v").isNotNull)
    val ranked = Relational2.globalRank(base.filter(col("grp") === 1L),
      col("v"), col("i"))
    val isBound = (1 until bins).map(k =>
      col("__rank") === expr(s"($k * __n + ${bins - 1}) div $bins"))
      .reduce(_ || _)
    val bounds = ranked.filter(isBound)
      .select(col("v")).distinct().collect().map(_.getDouble(0)).sorted
    // bin = 1 + |{boundaries strictly below v}| (upper-inclusive bins)
    val binOf = (lit(1) + size(filter(
      array(bounds.map(lit(_)): _*), b => b < col("v")))).cast("long")
    val perBin = base.withColumn("bin", binOf)
      .groupBy(col("bin"))
      .agg(sum(when(col("grp") === 1L, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("grp") === 0L, 1L).otherwise(0L)).as("n_cur"))
    val tot = base.agg(
      sum(when(col("grp") === 1L, 1L).otherwise(0L)).as("t1"),
      sum(when(col("grp") === 0L, 1L).otherwise(0L)).as("t2"))
    val p = col("n_ref").cast("double") / col("t1").cast("double")
    val q = col("n_cur").cast("double") / col("t2").cast("double")
    val pf = greatest(p, lit(1e-6))
    val qf = greatest(q, lit(1e-6))
    val scored = perBin.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        p.as("p_ref"), q.as("p_cur"),
        round((qf - pf) * log(qf / pf), 6).as("psi_term"))
    val total = scored.agg(
      sum(col("psi_term").cast(Exact.dec)).cast("double").as("psi_total"))
    scored.crossJoin(broadcast(total)).orderBy(col("bin"))
  }

  private def psiDriftQ(s: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
    psiDrift(ev, col("event_type") === "click", col("value"), col("event_id"))
  }

  /** CUSUM changepoint — the drift tier's TIME axis: ksDrift/psiDrift say
    * WHETHER two populations differ; this says WHEN a metric's level
    * shifted, per key. Classic cumulative-sum statistic over the hourly
    * series: S_k = Σ_{i≤k}(x_i − x̄); the changepoint estimate is
    * argmax |S_k| (earliest hour on ties) and max |S_k| is the alert
    * magnitude.
    *
    * Scale shape: the CORPUS-sized work is ONE partial-aggregable groupBy
    * to (key, hour) buckets with exact decimal sums; every window after
    * that runs over the bucket frame — |keys| × |hours| rows, bounded by
    * the time range, keys spread across the cluster (never a
    * single-partition window). Exactness: bucket sums and the cumulative
    * sum are decimal (associative, partitioning-proof); the only doubles
    * are the mean division and the S_k subtraction, identical IEEE in
    * both engines, rounded 6 dp as the comparison contract. */
  def cusumChangepoint(d: DataFrame, key: Column, ts: Column,
      value: Column): DataFrame = {
    val hourly = d.groupBy(key.as("k"), date_trunc("hour", ts).as("h"))
      .agg(sum(value.cast(graft.ops.Exact.dec)).as("x"))
    val wAll = Window.partitionBy(col("k"))
    val wCum = Window.partitionBy(col("k")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s = hourly
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("x")).over(wAll).cast("double"))
      .withColumn("cum", sum(col("x")).over(wCum).cast("double"))
      .withColumn("kk", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("h"))).cast("long"))
      .withColumn("sk",
        round(col("cum") - col("kk") * (col("total") / col("n")), 6))
    s.withColumn("rk", row_number().over(
        Window.partitionBy(col("k")).orderBy(abs(col("sk")).desc,
          col("h").asc)))
      .filter(col("rk") === 1)
      .select(col("k"), col("n").as("n_hours"), col("h").as("cp_hour"),
        round(abs(col("sk")), 6).as("cusum_max"))
  }

  private def cusumQ(s: SparkSession, dir: String): DataFrame =
    cusumChangepoint(graft.Tables(s, dir, "events"), col("event_type"),
      col("ts"), col("value"))
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))

  // --------------------------------------------------- frequent itemsets

  /** A-priori frequent itemsets up to size 3 over (basket, item) rows —
    * the full frequent-itemset discipline rel_basket_lift's prefilter is
    * the first pass of: L1 = items with support ≥ minSupport, candidate
    * pairs form from surviving items via a basket-keyed self-join
    * (bounded by the post-filter basket size, the same guard as
    * basketLift), and candidate TRIPLES form only from FREQUENT PAIRS
    * (the (i1,i2) leg semi-joins L2 before the third item attaches; the
    * (i1,i3)/(i2,i3) edges semi-join L2 before the count). Downward
    * closure means no frequent itemset is lost AND the cubic level's
    * per-basket candidate set is bounded by frequent-pair occurrences,
    * not C(basketSize,3). Emits (size, i1, i2, i3, support) with NULL
    * padding for sizes < 3.
    *
    * Shape at scale: the pair join touches only L1-filtered items under
    * the in-plan hot-basket raise; the triple join touches only
    * L2-edge candidates; all outputs are itemset-space-sized, never
    * corpus-sized. */
  def freqItemsets(d: DataFrame, basket: Column, item: Column,
                   minSupport: Long = 2L,
                   maxBasketItems: Long = 4096L): DataFrame = {
    require(minSupport >= 1 && maxBasketItems >= 1,
      "freqItemsets thresholds must be >= 1")
    // distinct corpus pass feeds ni (itself read by L1 and the prefilter)
    // plus the guarded build — materialized once like `guarded`/`p2`
    val bi0 = d.select(basket.as("bk"), item.as("it")).distinct()
      .localCheckpoint(true)
    val ni = bi0.groupBy(col("it")).agg(count(lit(1)).as("n_item"))
    val bi = bi0.join(ni.filter(col("n_item") >= minSupport)
      .select(col("it")), Seq("it"), "left_semi")
    // materialized once (r16 optimization): the guarded frame feeds FIVE
    // plan branches (both p2 sides, both ab sides, the p3 third leg) and
    // Catalyst does not dedupe common DataFrame subtrees — unpersisted,
    // the corpus scan + distinct + support semi-join + basket window ran
    // per branch and the composed plan carried 23 parquet scans / 71
    // exchanges whose PLANNING alone was a visible share of the query
    // (334-operator tree). localCheckpoint is the kcore/linkPredict
    // discipline; the frame is post-filter (basket, item)-sized. EAGER —
    // listed in SparkEntry.eagerQueries.
    val guarded = bi
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("bk"))))
      .select(col("bk"),
        when(col("bsz") <= maxBasketItems, col("it"))
          .otherwise(raise_error(concat(
            lit("freqItemsets: a basket holds "), col("bsz").cast("string"),
            lit(s" items after the min-support filter (> maxBasketItems=" +
              s"$maxBasketItems)")))).as("it"))
      .localCheckpoint(true)
    val l1 = ni.filter(col("n_item") >= minSupport)
      .select(lit(1L).as("size"), col("it").as("i1"),
        lit(null).cast("string").as("i2"), lit(null).cast("string").as("i3"),
        col("n_item").as("support"))
    // L2 feeds l2 plus THREE downward-closure semi-joins — same
    // materialize-once reasoning as `guarded`; itemset-space-sized
    val p2 = guarded.as("a").join(guarded.as("b"),
        col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
      .groupBy(col("a.it").as("i1"), col("b.it").as("i2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .localCheckpoint(true)
    val l2 = p2.select(lit(2L).as("size"), col("i1"), col("i2"),
      lit(null).cast("string").as("i3"), col("support"))
    // Level 3 — TRUE a-priori candidate generation (r14 verdict weak flag):
    // triples extend FREQUENT PAIRS, never raw L1 items. The r14 shape
    // joined guarded³ on the basket key, so a basket with B post-filter
    // items emitted C(B,3) candidates on ONE key — the maxBasketItems
    // guard bounds the pair level (C(4096,2) ≈ 8.4M, survivable) but the
    // cubic level it also fronted could legally reach ~1.1e10 rows on a
    // single hot basket. Downward closure is the fix, not a smaller cap:
    // every edge of a frequent triple is itself a frequent pair, so
    // semi-joining (i1,i2) BEFORE the third leg attaches — and (i1,i3) /
    // (i2,i3) before the count — prunes the per-basket candidate set to
    // frequent-pair-present × L2-item extensions, the canonical a-priori
    // bound, while provably emitting the identical result set.
    val p2k = p2.select(col("i1"), col("i2"))
    val ab = guarded.as("a").join(guarded.as("b"),
        col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
      .select(col("a.bk").as("bk"), col("a.it").as("i1"),
        col("b.it").as("i2"))
      .join(p2k, Seq("i1", "i2"), "left_semi")
    val p3 = ab.as("ab").join(guarded.as("c"),
        col("ab.bk") === col("c.bk") && col("ab.i2") < col("c.it"))
      .select(col("ab.i1").as("i1"), col("ab.i2").as("i2"),
        col("c.it").as("i3"))
      .join(p2k.select(col("i1"), col("i2").as("i3")),
        Seq("i1", "i3"), "left_semi")
      .join(p2k.select(col("i1").as("i2"), col("i2").as("i3")),
        Seq("i2", "i3"), "left_semi")
      .groupBy(col("i1"), col("i2"), col("i3"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val l3 = p3.select(lit(3L).as("size"), col("i1"), col("i2"), col("i3"),
      col("support"))
    l1.unionByName(l2).unionByName(l3)
  }

  private def freqItemsetsQ(s: SparkSession, dir: String): DataFrame =
    freqItemsets(graft.Tables(s, dir, "events"),
        col("user_id") * lit(1000000L)
          + (unix_micros(date_trunc("day", col("ts"))) / lit(86400000000L))
            .cast("long"),
        col("event_type"))
      .orderBy(col("size"), col("i1"), col("i2"), col("i3"))

  // -------------------------------------------------- sample-ratio check

  /** Sample-ratio-mismatch (SRM) screen per experiment: the FIRST check
    * an A/B readout pipeline runs — if the 50/50 assignment didn't land
    * 50/50 in the observed UNITS, every downstream metric (welch_ttest,
    * mann_whitney) is reading a biased sample and must not ship. Per
    * group: distinct assignment units per arm, the χ² goodness-of-fit
    * statistic against the even split ((a−e)²/e + (b−e)²/e, e=(a+b)/2,
    * df=1), and the srm flag at the classic 3.84 (p<0.05) line. Counting
    * UNITS (not events) is the point — event-weighted counts flag heavy
    * users, not broken assignment.
    *
    * Shape: one corpus shuffle to the (group, arm, unit) distinct frame,
    * then category-sized aggregates; the χ² is one double expression
    * over exact BIGINTs, rounded 6 dp. */
  def srmCheck(d: DataFrame, group: Column, unit: Column,
               arm: Column): DataFrame = {
    val u = d.select(group.as("grp"),
        when(arm, lit(1)).otherwise(lit(0)).as("arm"), unit.as("u"))
      .distinct()
    val m = u.groupBy(col("grp"))
      .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_b"))
    def dbl(c: String) = col(c).cast("double")
    val e = (dbl("n_a") + dbl("n_b")) / lit(2.0d)
    val chi2 = (dbl("n_a") - e) * (dbl("n_a") - e) / e +
      (dbl("n_b") - e) * (dbl("n_b") - e) / e
    m.filter(col("n_a") + col("n_b") > 0)
      .select(col("grp"), col("n_a"), col("n_b"),
        r6(chi2).as("chi2"),
        when(r6(chi2) > lit(3.84d), 1L).otherwise(0L).as("srm"))
  }

  private def srmQ(s: SparkSession, dir: String): DataFrame =
    srmCheck(graft.Tables(s, dir, "events"),
        col("event_type"), col("user_id"),
        // hash-based assignment (the production shape): first md5 hex
        // char of the unit id, 0-7 → treatment — organically near-50/50,
        // so the chi2 is a REAL small-deviation statistic instead of the
        // synthetic corpus's exactly-even modulo split (which pins every
        // chi2 to 0 and exercises nothing)
        substring(md5(col("user_id").cast("string").cast("binary")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"))
      .withColumnRenamed("grp", "event_type")
      .orderBy(col("event_type"))

  // --------------------------------------------------------------- CUPED

  /** CUPED variance reduction (Deng et al., WSDM 2013) — the third leg of
    * the A/B readout stack next to rel_ab_srm (is the assignment broken?)
    * and rel_welch_ttest (is the effect significant?): regress each
    * unit's experiment-period metric Y on its PRE-period metric X and
    * read the effect off the adjusted Y′ = Y − θ(X − X̄), θ = cov(X,Y)/
    * var(X). Same units, same effect estimate in expectation, variance
    * shrunk by corr(X,Y)² — the difference between a two-week and a
    * five-day experiment. Emits per experiment: unit counts, θ, the
    * variance-reduction factor, and the raw vs CUPED-adjusted
    * treatment-control difference.
    *
    * Determinism: per-unit X/Y are exact cent sums (the benford/stump
    * quantization); the moment sums accumulate in DECIMAL(19,0) (the
    * corrRegr overflow discipline); every ratio is a double expression
    * over those exact moments, 6 dp-rounded; degenerate frames (varx or
    * vary 0, an empty arm) emit NULL in both engines — the heapsLaw
    * guard discipline. The pre/post boundary is the midpoint of the
    * observed time range, compared as `2·t < lo+hi` so neither engine
    * divides (exact BIGINT arithmetic).
    *
    * Shape at scale: one corpus shuffle to the per-(experiment, unit)
    * aggregate, then one experiment-keyed moment aggregate (map-side
    * combined); the bounds frame is a broadcast 1-row aggregate. Output
    * is experiment-count sized. */
  def cupedAdjust(d: DataFrame, group: Column, unit: Column, arm: Column,
      ts: Column, value: Column): DataFrame = {
    val mdec = org.apache.spark.sql.types.DecimalType(19, 0)
    val bounds = broadcast(d.agg(min(unix_micros(ts)).as("lo"),
      max(unix_micros(ts)).as("hi")))
    val cents = floor(value * lit(100.0d) + lit(0.5d)).cast("long")
    val per = d.crossJoin(bounds)
      .select(group.as("grp"), unit.as("u"),
        when(arm, 1).otherwise(0).as("arm"),
        when(unix_micros(ts) * 2 < col("lo") + col("hi"), cents)
          .otherwise(0L).as("xc"),
        when(unix_micros(ts) * 2 >= col("lo") + col("hi"), cents)
          .otherwise(0L).as("yc"))
      .groupBy(col("grp"), col("u"), col("arm"))
      .agg(sum(col("xc")).as("x"), sum(col("yc")).as("y"))
    val m = per.groupBy(col("grp")).agg(
      count(lit(1)).as("n_units"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
      sum(col("x").cast(mdec)).as("sx"),
      sum(col("y").cast(mdec)).as("sy"),
      sum(col("x").cast(mdec) * col("x").cast(mdec)).as("sxx"),
      sum(col("y").cast(mdec) * col("y").cast(mdec)).as("syy"),
      sum(col("x").cast(mdec) * col("y").cast(mdec)).as("sxy"),
      sum(when(col("arm") === 1, col("x")).otherwise(0L).cast(mdec)).as("sxt"),
      sum(when(col("arm") === 1, col("y")).otherwise(0L).cast(mdec)).as("syt"))
    def dbl(c: String) = col(c).cast("double")
    val nd = dbl("n_units")
    val nt = dbl("n_treat")
    val nc = nd - nt
    val cov = nd * dbl("sxy") - dbl("sx") * dbl("sy")
    val varx = nd * dbl("sxx") - dbl("sx") * dbl("sx")
    val vary = nd * dbl("syy") - dbl("sy") * dbl("sy")
    val theta = cov / varx
    // /100: cents back to metric units for the reported differences
    val diffRaw = (dbl("syt") / nt - (dbl("sy") - dbl("syt")) / nc) / 100.0d
    val diffX = (dbl("sxt") / nt - (dbl("sx") - dbl("sxt")) / nc) / 100.0d
    val armsOk = col("n_treat") > 0 && col("n_treat") < col("n_units")
    m.select(col("grp"), col("n_units"), col("n_treat"),
      when(varx > 0, r6(theta)).as("theta"),
      when(varx > 0 && vary > 0, r6(cov * cov / (varx * vary)))
        .as("var_reduction"),
      when(armsOk, r6(diffRaw)).as("diff_raw"),
      when(armsOk && varx > 0, r6(diffRaw - theta * diffX)).as("diff_cuped"))
  }

  private def cupedQ(s: SparkSession, dir: String): DataFrame =
    cupedAdjust(graft.Tables(s, dir, "events"),
      col("event_type"), col("user_id"),
      // the rel_ab_srm hash assignment: first md5 hex char 0-7 → treatment
      substring(md5(col("user_id").cast("string").cast("binary")), 1, 1)
        .isin("0", "1", "2", "3", "4", "5", "6", "7"),
      col("ts"), col("value"))
      .withColumnRenamed("grp", "event_type")
      .orderBy(col("event_type"))

  // ------------------------------------------------------ decision stump

  /** Best single-threshold split (a 1-level decision tree) of a binary
    * label on a numeric feature by weighted Gini impurity — the
    * weak-labeler / feature-screening primitive a training-data pipeline
    * runs to rank candidate quality signals (rel_gini_impurity scores a
    * GIVEN partition; this SEARCHES the threshold space). Candidate
    * thresholds are the feature quantized to cents (floor(x·100+0.5) as
    * exact BIGINT — the benford discipline: integer candidates compare
    * and group identically in both engines, and 2 dp is the resolution
    * the corpus's value column carries). For every candidate t the split
    * is `cents <= t`; left/right class counts are exact cumulative sums
    * over the per-cent aggregate; weighted Gini is a single double
    * expression over exact integers, rounded 6 dp; the argmin breaks
    * ties toward the smaller threshold. Rows with a NULL feature are
    * filtered out up front: no threshold can route them, and leaving
    * them in made the cumulative prefixes engine-DEPENDENT (Spark
    * orders NULL cents first, DuckDB last).
    *
    * Shape at scale (r16 rework — the r15 weak flag): the candidate
    * frame tracks the feature's value DOMAIN, which for the registered
    * events.value is ~100·range rows but for a generic wide-domain
    * feature (latencies in µs, prices in large units) approaches the
    * distinct-value count — so the cumulative counts now run through
    * [[Relational2.prefixSums]] (range exchange + broadcast partition
    * offsets, the globalRank discipline) instead of an unpartitioned
    * `sum over (order by c)` window, and the argmin is
    * `orderBy(...).limit(1)` (TakeOrderedAndProject — a per-partition
    * top-1 plus a driver merge of |partitions| rows) instead of an
    * unpartitioned row_number window. No single-partition funnel
    * remains at ANY domain width (StatOpsSpec pins zero WindowExec in
    * the plan). Output: one row (the trained stump). */
  def decisionStump(d: DataFrame, feature: Column, label: Column)
      : DataFrame = {
    val cents = floor(feature * lit(100.0d) + lit(0.5d)).cast("long")
    val perC = d.filter(feature.isNotNull)
      .select(cents.as("c"),
        when(label, lit(1L)).otherwise(lit(0L)).as("y"))
      .groupBy(col("c"))
      .agg(count(lit(1)).as("n_c"), sum(col("y")).as("p_c"))
    val cum = Relational2.prefixSums(perC, Seq(col("c")), Seq("n_c", "p_c"))
      .select(col("c"),
        col("__cum_n_c").as("n_l"), col("__cum_p_c").as("p_l"),
        col("__tot_n_c").as("n"), col("__tot_p_c").as("p"))
      .filter(col("n_l") < col("n")) // the max cent splits nothing off
    def dbl(c: String) = col(c).cast("double")
    val nR = dbl("n") - dbl("n_l")
    val pR = dbl("p") - dbl("p_l")
    def gini(n: Column, p: Column): Column =
      lit(1.0d) - (p / n) * (p / n) - ((n - p) / n) * ((n - p) / n)
    val wg = r6((dbl("n_l") * gini(dbl("n_l"), dbl("p_l"))
      + nR * gini(nR, pR)) / dbl("n"))
    cum.withColumn("gini_split", wg)
      .orderBy(col("gini_split").asc, col("c").asc).limit(1)
      .select(
        (col("c").cast("double") / lit(100.0d)).as("threshold"),
        col("n_l").as("n_left"), (col("n") - col("n_l")).as("n_right"),
        col("p_l").as("pos_left"), (col("p") - col("p_l")).as("pos_right"),
        col("gini_split"),
        r6(gini(dbl("n"), dbl("p"))).as("gini_base"))
  }

  private def decisionStumpQ(s: SparkSession, dir: String): DataFrame =
    decisionStump(graft.Tables(s, dir, "events"),
      col("value"), col("event_type") === "purchase")

  // ------------------------------------------------------------ wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_ks_drift" -> ksDriftQ,
    "rel_psi_drift" -> psiDriftQ,
    "ts_changepoint_cusum" -> cusumQ,
    "rel_mode_stat" -> modeQ,
    "rel_corr_regr" -> corrRegrQ,
    "rel_gini_impurity" -> giniQ,
    "rel_chi2_cells" -> chi2Q,
    "rel_benford" -> benfordQ,
    "rel_cramers_v" -> cramersVQ,
    "rel_survival_km" -> survivalQ,
    "rel_basket_lift" -> basketLiftQ,
    "rel_gini_concentration" -> giniConcQ,
    "rel_entropy" -> entropyQ,
    "rel_markov_transitions" -> markovQ,
    "rel_mutual_info" -> mutualInfoQ,
    "rel_welch_ttest" -> welchQ,
    "rel_mann_whitney" -> mannWhitneyQ,
    "rel_sequence_match" -> seqMatchQ,
    "rel_winsorize" -> winsorizeQ,
    "rel_gaps_islands" -> gapsIslandsQ,
    "rel_decile_lift" -> decileLiftQ,
    "rel_freq_itemsets" -> freqItemsetsQ,
    "rel_decision_stump" -> decisionStumpQ,
    "rel_ab_srm" -> srmQ,
    "rel_cuped" -> cupedQ,
  )

  /** rel_benford's oracle, generated from the SAME log10 expectation
    * doubles the plan embeds (exact decimal expansions round-trip). */
  private def benfordOracleSql: String = {
    def dlit(x: Double) =
      s"CAST('${new java.math.BigDecimal(x).toPlainString}' AS DOUBLE)"
    val expectCase = (1 to 9).map(d =>
      s"WHEN digit = $d THEN ${dlit(math.log10(1.0 + 1.0 / d))}")
      .mkString("\n    ")
    s"""WITH c AS (
       |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100.0 + 0.5)
       |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
       |  FROM orders WHERE o_totalprice >= 0.005 AND o_totalprice < 90000000000000.0
       |), g AS (
       |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed FROM c GROUP BY digit
       |), nn AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM g),
       |e AS (
       |  SELECT digit, observed, n,
       |    CASE $expectCase END AS expect
       |  FROM g CROSS JOIN nn
       |)
       |SELECT digit, observed,
       |  ${r6Sql("CAST(observed AS DOUBLE) / CAST(n AS DOUBLE)")} AS share,
       |  expect AS benford_expect,
       |  ${r6Sql("CAST(observed AS DOUBLE) / CAST(n AS DOUBLE) - expect")} AS deviation
       |FROM e ORDER BY digit""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // same distinct-unit counts, the chi2 expression spelled once over
    // exact BIGINTs, the same 3.84 line
    "rel_ab_srm" -> {
      val e = "((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) / 2.0)"
      val chi2 = s"(CAST(n_a AS DOUBLE) - $e) * (CAST(n_a AS DOUBLE) - $e)" +
        s" / $e + (CAST(n_b AS DOUBLE) - $e)" +
        s" * (CAST(n_b AS DOUBLE) - $e) / $e"
      s"""WITH u AS (
         |  SELECT DISTINCT event_type,
         |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
         |      IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE 0 END AS arm,
         |    user_id
         |  FROM events
         |), m AS (
         |  SELECT event_type,
         |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
         |  FROM u GROUP BY 1
         |)
         |SELECT event_type, n_a, n_b, ${r6Sql(chi2)} AS chi2,
         |  CAST(CASE WHEN ${r6Sql(chi2)} > 3.84 THEN 1 ELSE 0 END AS BIGINT)
         |    AS srm
         |FROM m WHERE n_a + n_b > 0 ORDER BY event_type""".stripMargin
    },
    // same cent-sum units, the same 2·t < lo+hi midpoint split, the same
    // md5 arm, the corrRegr moment ladder, every ratio guarded NULL on
    // degenerate frames exactly as the Spark plan
    "rel_cuped" ->
      s"""WITH b AS (
         |  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
         |  FROM events
         |), per AS (
         |  SELECT event_type AS grp, user_id AS u,
         |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
         |      IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE 0 END AS arm,
         |    CAST(SUM(CASE WHEN epoch_us(ts) * 2 < lo + hi
         |      THEN CAST(floor("value" * 100.0 + 0.5) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS x,
         |    CAST(SUM(CASE WHEN epoch_us(ts) * 2 >= lo + hi
         |      THEN CAST(floor("value" * 100.0 + 0.5) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS y
         |  FROM events CROSS JOIN b
         |  GROUP BY 1, 2, 3
         |), m AS (
         |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_units,
         |    CAST(SUM(arm) AS BIGINT) AS n_treat,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(y * y) AS BIGINT) AS syy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sxt,
         |    CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS syt
         |  FROM per GROUP BY 1
         |), f AS (
         |  SELECT grp, n_units, n_treat,
         |    CAST(n_units AS DOUBLE) AS nd, CAST(n_treat AS DOUBLE) AS nt,
         |    CAST(n_units AS DOUBLE) - CAST(n_treat AS DOUBLE) AS nc,
         |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         |    CAST(sxt AS DOUBLE) AS sxtd, CAST(syt AS DOUBLE) AS sytd,
         |    CAST(n_units AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
         |    CAST(n_units AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
         |    CAST(n_units AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
         |  FROM m
         |), g AS (
         |  SELECT *,
         |    ((sytd / nt) - ((syd - sytd) / nc)) / 100.0 AS diff_raw_u,
         |    ((sxtd / nt) - ((sxd - sxtd) / nc)) / 100.0 AS diff_x_u
         |  FROM f
         |)
         |SELECT grp AS event_type, n_units, n_treat,
         |  CASE WHEN varx > 0 THEN ${r6Sql("cov / varx")}
         |    ELSE NULL END AS theta,
         |  CASE WHEN varx > 0 AND vary > 0
         |    THEN ${r6Sql("cov * cov / (varx * vary)")}
         |    ELSE NULL END AS var_reduction,
         |  CASE WHEN n_treat > 0 AND n_treat < n_units
         |    THEN ${r6Sql("diff_raw_u")} ELSE NULL END AS diff_raw,
         |  CASE WHEN n_treat > 0 AND n_treat < n_units AND varx > 0
         |    THEN ${r6Sql("diff_raw_u - (cov / varx) * diff_x_u")}
         |    ELSE NULL END AS diff_cuped
         |FROM g ORDER BY event_type""".stripMargin,
    // same cent quantization (exact BIGINT candidates, NULL features
    // filtered in both engines), the same EXACT cumulative counts — the
    // oracle spells them as an ordered window (fine at oracle scale);
    // the Spark side computes the identical integers via the
    // prefixSums range exchange — the gini expression spelled once in
    // both engines over exact integer counts, argmin tie to smaller c
    "rel_decision_stump" -> {
      def g(n: String, p: String) = {
        val nd = s"CAST($n AS DOUBLE)"; val pd = s"CAST($p AS DOUBLE)"
        s"(1.0 - ($pd / $nd) * ($pd / $nd)" +
          s" - (($nd - $pd) / $nd) * (($nd - $pd) / $nd))"
      }
      val nl = "CAST(n_l AS DOUBLE)"
      val nr = "(CAST(n AS DOUBLE) - CAST(n_l AS DOUBLE))"
      val pr = "(CAST(p AS DOUBLE) - CAST(p_l AS DOUBLE))"
      val wg = s"($nl * ${g("n_l", "p_l")} + $nr * ${g(nr, pr)})" +
        " / CAST(n AS DOUBLE)"
      s"""WITH perc AS (
         |  SELECT CAST(floor("value" * 100 + 0.5) AS BIGINT) AS c,
         |    CAST(COUNT(*) AS BIGINT) AS n_c,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS p_c
         |  FROM events WHERE "value" IS NOT NULL GROUP BY 1
         |), cum AS (
         |  SELECT c,
         |    SUM(n_c) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS n_l,
         |    SUM(p_c) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS p_l,
         |    SUM(n_c) OVER () AS n, SUM(p_c) OVER () AS p
         |  FROM perc
         |), sc AS (
         |  SELECT c, n_l, p_l, n, p, ${r6Sql(wg)} AS gini_split
         |  FROM cum WHERE n_l < n
         |), best AS (
         |  SELECT *, row_number() OVER (ORDER BY gini_split ASC, c ASC)
         |    AS rk FROM sc
         |)
         |SELECT CAST(c AS DOUBLE) / 100.0 AS threshold,
         |  CAST(n_l AS BIGINT) AS n_left,
         |  CAST(n - n_l AS BIGINT) AS n_right,
         |  CAST(p_l AS BIGINT) AS pos_left,
         |  CAST(p - p_l AS BIGINT) AS pos_right,
         |  gini_split, ${r6Sql(g("n", "p"))} AS gini_base
         |FROM best WHERE rk = 1""".stripMargin
    },
    // same exact-integer week arithmetic (epoch_us // day // 7), same
    // the same chained conditional-min ladder; conversion ratios over the
    // the same a-priori ladder: L1 semi-join, level-k HAVING filters
    "rel_freq_itemsets" ->
      s"""WITH bi0 AS (
         |  SELECT DISTINCT user_id || ':' || date_trunc('day', ts) AS bk,
         |    event_type AS it
         |  FROM events
         |), ni AS (
         |  SELECT it, CAST(COUNT(*) AS BIGINT) AS n_item FROM bi0 GROUP BY it
         |), bi AS (
         |  SELECT bi0.bk, bi0.it FROM bi0
         |  JOIN ni ON bi0.it = ni.it AND ni.n_item >= 2
         |), p2 AS (
         |  SELECT a.it AS i1, b.it AS i2, CAST(COUNT(*) AS BIGINT) AS support
         |  FROM bi a JOIN bi b ON a.bk = b.bk AND a.it < b.it
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |), p3 AS (
         |  SELECT a.it AS i1, b.it AS i2, c.it AS i3,
         |    CAST(COUNT(*) AS BIGINT) AS support
         |  FROM bi a JOIN bi b ON a.bk = b.bk AND a.it < b.it
         |  JOIN bi c ON a.bk = c.bk AND b.it < c.it
         |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
         |)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS size, it AS i1,
         |    CAST(NULL AS VARCHAR) AS i2, CAST(NULL AS VARCHAR) AS i3,
         |    n_item AS support
         |  FROM ni WHERE n_item >= 2
         |  UNION ALL SELECT 2, i1, i2, NULL, support FROM p2
         |  UNION ALL SELECT 3, i1, i2, i3, support FROM p3
         |) ORDER BY size, i1, i2, i3""".stripMargin,
    // the same two-rank construction in window SQL: global row_number +
    // per-sample row_number give both cumulative counts, tie blocks
    // absorbed per distinct value, exact-integer until the final divisions
    "rel_ks_drift" ->
      """WITH x AS (
        |  SELECT "value" AS v,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS grp,
        |    event_id AS i
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), rk AS (
        |  SELECT v,
        |    row_number() OVER (ORDER BY v, i) AS r,
        |    CASE WHEN grp = 1
        |      THEN row_number() OVER (PARTITION BY grp ORDER BY v, i)
        |      ELSE r - row_number() OVER (PARTITION BY grp ORDER BY v, i)
        |    END AS c1
        |  FROM x
        |), pv AS (
        |  SELECT v, MAX(c1) AS c1, MAX(r) AS rr FROM rk GROUP BY v
        |), tot AS (
        |  SELECT MAX(c1) AS n1, MAX(rr - c1) AS n2 FROM pv
        |)
        |SELECT abs(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |         - CAST(rr - c1 AS DOUBLE) / CAST(n2 AS DOUBLE)) AS ks_stat,
        |  v AS at_value, n1 AS n_ref, n2 AS n_cur
        |FROM pv CROSS JOIN tot
        |ORDER BY ks_stat DESC, at_value ASC LIMIT 1""".stripMargin,
    // reference deciles via ranks, upper-inclusive bins via a correlated
    // boundary count, 1e-6 floors, 6 dp terms, exact decimal total
    // CUSUM: bucket sums and cumulative sums exact decimal; the mean
    // division and S_k subtraction are IEEE-identical doubles, rounded
    // 6 dp; argmax |S_k| with earliest-hour tie-break
    "ts_changepoint_cusum" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    SUM(CAST("value" AS DECIMAL(30,6))) AS x
        |  FROM events GROUP BY 1, 2
        |),
        |st AS (
        |  SELECT event_type,
        |    COUNT(*) OVER w_all AS n,
        |    CAST(SUM(x) OVER w_all AS DOUBLE) AS total,
        |    CAST(SUM(x) OVER w_cum AS DOUBLE) AS cum,
        |    row_number() OVER w_ord AS k, h
        |  FROM hourly
        |  WINDOW w_all AS (PARTITION BY event_type),
        |         w_cum AS (PARTITION BY event_type ORDER BY h
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         w_ord AS (PARTITION BY event_type ORDER BY h)
        |),
        |s AS (
        |  SELECT event_type, n, h, round(cum - k * (total / n), 6) AS sk
        |  FROM st
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(sk) DESC, h ASC) AS rk
        |  FROM s
        |)
        |SELECT event_type, CAST(n AS BIGINT) AS n_hours, h AS cp_hour,
        |  round(abs(sk), 6) AS cusum_max
        |FROM ranked WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "rel_psi_drift" ->
      """WITH x AS (
        |  SELECT "value" AS v,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS grp,
        |    event_id AS i
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), ref AS (
        |  SELECT v, row_number() OVER (ORDER BY v, i) AS r,
        |    COUNT(*) OVER () AS n
        |  FROM x WHERE grp = 1
        |), bnd AS (
        |  SELECT DISTINCT ref.v AS b
        |  FROM ref JOIN range(1, 10) t(k) ON ref.r = (t.k * ref.n + 9) // 10
        |), withbin AS (
        |  SELECT grp,
        |    CAST(1 + (SELECT COUNT(*) FROM bnd WHERE b < x.v) AS BIGINT) AS bin
        |  FROM x
        |), perbin AS (
        |  SELECT bin,
        |    CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM withbin GROUP BY bin
        |), tot AS (
        |  SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
        |    CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS t2
        |  FROM x
        |), scored AS (
        |  SELECT bin, n_ref, n_cur,
        |    CAST(n_ref AS DOUBLE) / CAST(t1 AS DOUBLE) AS p_ref,
        |    CAST(n_cur AS DOUBLE) / CAST(t2 AS DOUBLE) AS p_cur,
        |    round((greatest(CAST(n_cur AS DOUBLE) / CAST(t2 AS DOUBLE), 1e-6)
        |         - greatest(CAST(n_ref AS DOUBLE) / CAST(t1 AS DOUBLE), 1e-6))
        |      * ln(greatest(CAST(n_cur AS DOUBLE) / CAST(t2 AS DOUBLE), 1e-6)
        |         / greatest(CAST(n_ref AS DOUBLE) / CAST(t1 AS DOUBLE), 1e-6)), 6)
        |      AS psi_term
        |  FROM perbin CROSS JOIN tot
        |), total AS (
        |  SELECT CAST(SUM(CAST(psi_term AS DECIMAL(30,6))) AS DOUBLE)
        |    AS psi_total
        |  FROM scored
        |)
        |SELECT bin, n_ref, n_cur, p_ref, p_cur, psi_term, psi_total
        |FROM scored CROSS JOIN total ORDER BY bin""".stripMargin,
    "rel_mode_stat" ->
      s"""WITH c AS (
         |  SELECT o_orderpriority, o_orderstatus AS mode_value,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM orders GROUP BY 1, 2
         |), r AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
         |      ORDER BY cnt DESC, mode_value ASC) AS rk,
         |    CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n_rows
         |  FROM c
         |)
         |SELECT o_orderpriority, mode_value, cnt AS mode_cnt, n_rows,
         |  ${r6Sql("CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE)")} AS mode_share
         |FROM r WHERE rk = 1 ORDER BY o_orderpriority""".stripMargin,
    "rel_corr_regr" ->
      s"""WITH xy AS (
         |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
         |    CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
         |  FROM lineitem
         |), m AS (
         |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(y * y) AS BIGINT) AS syy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy
         |  FROM xy GROUP BY 1
         |), f AS (
         |  SELECT l_returnflag, n,
         |    CAST(n AS DOUBLE) AS nd,
         |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
         |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
         |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
         |  FROM m
         |)
         |SELECT l_returnflag, n,
         |  ${r6Sql("cov / varx")} AS slope,
         |  ${r6Sql("(syd - (cov / varx) * sxd) / nd")} AS intercept,
         |  ${r6Sql("cov / sqrt(varx * vary)")} AS corr
         |FROM f ORDER BY l_returnflag""".stripMargin,
    "rel_gini_impurity" ->
      s"""WITH c AS (
         |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM documents GROUP BY 1, 2
         |), r AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY cnt DESC, lang ASC) AS rk,
         |    CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n,
         |    CAST(SUM(cnt * cnt) OVER (PARTITION BY source) AS BIGINT) AS sc2,
         |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_classes
         |  FROM c
         |)
         |SELECT source, n, n_classes,
         |  ${r6Sql("1.0 - CAST(sc2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))")} AS gini,
         |  lang AS top_class,
         |  ${r6Sql("CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)")} AS top_share
         |FROM r WHERE rk = 1 ORDER BY source""".stripMargin,
    "rel_chi2_cells" ->
      s"""WITH cells AS (
         |  SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS o
         |  FROM lineitem GROUP BY 1, 2
         |), rt AS (
         |  SELECT l_returnflag, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1
         |), ct AS (
         |  SELECT l_linestatus, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1
         |), nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
         |f AS (
         |  SELECT c.l_returnflag, c.l_linestatus, c.o,
         |    CAST(c.o AS DOUBLE) AS od, CAST(r.rt AS DOUBLE) AS rtd,
         |    CAST(t.ct AS DOUBLE) AS ctd, CAST(nn.n AS DOUBLE) AS nd
         |  FROM cells c JOIN rt r USING (l_returnflag)
         |    JOIN ct t USING (l_linestatus) CROSS JOIN nn
         |)
         |SELECT l_returnflag, l_linestatus, o AS observed,
         |  ${r6Sql("rtd * ctd / nd")} AS expected,
         |  ${r6Sql("(od * nd - rtd * ctd) * (od * nd - rtd * ctd) / (rtd * ctd * nd)")} AS chi2_contrib
         |FROM f ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "rel_benford" -> benfordOracleSql,
    "rel_entropy" ->
      s"""WITH c AS (
         |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM documents GROUP BY 1, 2
         |), tot AS (
         |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS n,
         |    CAST(COUNT(*) AS BIGINT) AS n_classes
         |  FROM c GROUP BY 1
         |), terms AS (
         |  SELECT c.source, t.n, t.n_classes,
         |    ${r6Sql("(CAST(c.cnt AS DOUBLE) / CAST(t.n AS DOUBLE))" +
                     " * ln(CAST(c.cnt AS DOUBLE) / CAST(t.n AS DOUBLE))")} AS trm
         |  FROM c JOIN tot t USING (source)
         |), h AS (
         |  SELECT source, n, n_classes,
         |    -CAST(SUM(CAST(trm AS DECIMAL(18,6))) AS DOUBLE) AS entropy
         |  FROM terms GROUP BY 1, 2, 3
         |)
         |SELECT source, n, n_classes,
         |  ${r6Sql("entropy")} AS entropy,
         |  CASE WHEN n_classes = 1 THEN CAST(0.0 AS DOUBLE)
         |    ELSE ${r6Sql("entropy / ln(CAST(n_classes AS DOUBLE))")}
         |  END AS norm_entropy
         |FROM h ORDER BY source""".stripMargin,
    "rel_gini_concentration" ->
      s"""WITH t AS (
         |  SELECT o_custkey AS k,
         |    SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS x
         |  FROM orders GROUP BY 1
         |), r AS (
         |  SELECT x, row_number() OVER (ORDER BY x, k) AS rnk FROM t
         |), m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
         |    SUM(x * rnk) AS srx
         |  FROM r
         |)
         |SELECT n AS n_keys,
         |  ${r6Sql("(2.0 * CAST(srx AS DOUBLE)" +
                   " - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))" +
                   " / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))")} AS gini
         |FROM m""".stripMargin,
    // the same a-priori discipline: items below min-support (2) are
    // semi-joined out BEFORE the pair self-join, pairs below it dropped
    // after; n_baskets stays the unfiltered denominator
    "rel_basket_lift" ->
      s"""WITH bi0 AS (
         |  SELECT DISTINCT user_id || ':' || date_trunc('day', ts) AS bk,
         |    event_type AS it
         |  FROM events
         |), nb AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n_baskets FROM bi0),
         |ni AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS n_item FROM bi0 GROUP BY it),
         |bi AS (
         |  SELECT bi0.bk, bi0.it FROM bi0
         |  JOIN ni ON bi0.it = ni.it AND ni.n_item >= 2
         |),
         |p AS (
         |  SELECT l.it AS a, r.it AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
         |  FROM bi l JOIN bi r ON l.bk = r.bk AND l.it < r.it
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |)
         |SELECT a, b, n_ab, na.n_item AS n_a, nbm.n_item AS n_b,
         |  ${r6Sql("CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE)")} AS support,
         |  ${r6Sql("CAST(n_ab AS DOUBLE) / CAST(na.n_item AS DOUBLE)")} AS confidence,
         |  ${r6Sql("CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE)" +
                   " / (CAST(na.n_item AS DOUBLE) * CAST(nbm.n_item AS DOUBLE))")} AS lift
         |FROM p JOIN ni na ON p.a = na.it JOIN ni nbm ON p.b = nbm.it
         |CROSS JOIN nb ORDER BY a, b""".stripMargin,
    "rel_survival_km" ->
      s"""WITH pu AS (
         |  SELECT user_id % 2 AS cohort,
         |    MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
         |  FROM events GROUP BY user_id
         |), hz AS (
         |  SELECT MAX(last_us) - ${KM_CENSOR_H.toLong * 3600000000L} AS cut_us
         |  FROM pu
         |), lives AS (
         |  SELECT cohort, (last_us - first_us) // 3600000000 AS t,
         |    CASE WHEN last_us < cut_us THEN 1 ELSE 0 END AS is_death
         |  FROM pu CROSS JOIN hz
         |), byt AS (
         |  SELECT cohort, t, CAST(COUNT(*) AS BIGINT) AS cnt,
         |    CAST(SUM(is_death) AS BIGINT) AS d
         |  FROM lives GROUP BY 1, 2
         |), risked AS (
         |  SELECT *, CAST(SUM(cnt) OVER (PARTITION BY cohort ORDER BY t DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS n_risk
         |  FROM byt
         |), terms AS (
         |  SELECT *, CASE WHEN d < n_risk THEN
         |    ${r6Sql("ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))")}
         |  END AS lterm
         |  FROM risked WHERE d > 0
         |), cum AS (
         |  SELECT *, CAST(SUM(CAST(lterm AS DECIMAL(18,6)))
         |    OVER (PARTITION BY cohort ORDER BY t ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS csum
         |  FROM terms
         |)
         |SELECT cohort, t AS t_hours, n_risk, d AS n_deaths,
         |  CASE WHEN d = n_risk THEN CAST(0.0 AS DOUBLE)
         |    ELSE ${r6Sql("exp(csum)")} END AS survival
         |FROM cum ORDER BY cohort, t""".stripMargin,
    "rel_cramers_v" ->
      s"""WITH obs AS (
         |  SELECT o_orderpriority AS a, o_orderstatus AS b,
         |    CAST(COUNT(*) AS BIGINT) AS o
         |  FROM orders GROUP BY 1, 2
         |), cells AS (
         |  SELECT ra.a, rb.b, COALESCE(obs.o, 0) AS o
         |  FROM (SELECT DISTINCT a FROM obs) ra
         |  CROSS JOIN (SELECT DISTINCT b FROM obs) rb
         |  LEFT JOIN obs ON obs.a = ra.a AND obs.b = rb.b
         |), rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
         |ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
         |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
         |dims AS (
         |  SELECT CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
         |    CAST(COUNT(DISTINCT b) AS BIGINT) AS c
         |  FROM cells
         |), f AS (
         |  SELECT
         |    ${r6Sql("(CAST(cl.o AS DOUBLE) * CAST(nn.n AS DOUBLE)" +
                     " - CAST(rr.rt AS DOUBLE) * CAST(tt.ct AS DOUBLE))" +
                     " * (CAST(cl.o AS DOUBLE) * CAST(nn.n AS DOUBLE)" +
                     " - CAST(rr.rt AS DOUBLE) * CAST(tt.ct AS DOUBLE))" +
                     " / (CAST(rr.rt AS DOUBLE) * CAST(tt.ct AS DOUBLE)" +
                     " * CAST(nn.n AS DOUBLE))")} AS contrib
         |  FROM cells cl JOIN rt rr USING (a) JOIN ct tt USING (b) CROSS JOIN nn
         |), chi AS (
         |  SELECT CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE) AS chi2
         |  FROM f
         |)
         |SELECT n, r, c,
         |  ${r6Sql("chi2")} AS chi2,
         |  ${r6Sql("sqrt(chi2 / CAST(n AS DOUBLE) / (CAST(least(r, c) AS DOUBLE) - 1.0))")} AS v
         |FROM chi CROSS JOIN nn CROSS JOIN dims""".stripMargin,
    "rel_markov_transitions" ->
      s"""WITH seq AS (
         |  SELECT event_type AS s,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS nxt
         |  FROM events
         |), cells AS (
         |  SELECT s AS from_state, nxt AS to_state,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
         |), r AS (
         |  SELECT *, CAST(SUM(cnt) OVER (PARTITION BY from_state) AS BIGINT)
         |    AS row_n
         |  FROM cells
         |)
         |SELECT from_state, to_state, cnt,
         |  ${r6Sql("CAST(cnt AS DOUBLE) / CAST(row_n AS DOUBLE)")} AS p
         |FROM r ORDER BY from_state, to_state""".stripMargin,
    "rel_mutual_info" ->
      s"""WITH cells AS (
         |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
         |  FROM documents GROUP BY 1, 2
         |), rt AS (
         |  SELECT lang, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1
         |), ct AS (
         |  SELECT source, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1
         |), nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
         |scored AS (
         |  SELECT c.lang, c.source, c.o AS observed,
         |    ${r6Sql("(CAST(c.o AS DOUBLE) / CAST(nn.n AS DOUBLE))" +
                      " * ln(CAST(c.o AS DOUBLE) * CAST(nn.n AS DOUBLE)" +
                      " / (CAST(r.rt AS DOUBLE) * CAST(t.ct AS DOUBLE)))")}
         |      AS pmi_contrib
         |  FROM cells c JOIN rt r USING (lang)
         |    JOIN ct t USING (source) CROSS JOIN nn
         |), tot AS (
         |  SELECT CAST(SUM(CAST(pmi_contrib AS DECIMAL(18,6))) AS DOUBLE)
         |    AS mi_total
         |  FROM scored
         |)
         |SELECT lang, source, observed, pmi_contrib, mi_total
         |FROM scored CROSS JOIN tot ORDER BY lang, source""".stripMargin,
    "rel_mann_whitney" ->
      s"""WITH x AS (
         |  SELECT "value" AS v, event_id AS i,
         |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |), rk AS (
         |  SELECT v, a, row_number() OVER (ORDER BY v, i) AS r FROM x
         |), perv AS (
         |  SELECT v, CAST(MIN(r) AS BIGINT) AS minr,
         |    CAST(MAX(r) AS BIGINT) AS maxr,
         |    CAST(COUNT(*) AS BIGINT) AS t, CAST(SUM(a) AS BIGINT) AS t1
         |  FROM rk GROUP BY v
         |), m AS (
         |  SELECT CAST(SUM(t1) AS BIGINT) AS n1,
         |    CAST(SUM(t - t1) AS BIGINT) AS n2,
         |    SUM(CAST(t1 AS DECIMAL(38,0))
         |      * CAST(minr + maxr AS DECIMAL(38,0))) AS r1x2,
         |    SUM(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0))
         |      * CAST(t AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0))) AS tie3
         |  FROM perv
         |), f AS (
         |  SELECT n1, n2,
         |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
         |    CAST(r1x2 AS DOUBLE) AS r1x2d, CAST(tie3 AS DOUBLE) AS tie3d
         |  FROM m WHERE n1 >= 1 AND n2 >= 1
         |)
         |SELECT n1, n2,
         |  ${r6Sql("r1x2d / 2.0 - n1d * (n1d + 1.0) / 2.0")} AS u_stat,
         |  CASE WHEN n1d * n2d / 12.0 * ((n1d + n2d + 1.0)
         |      - tie3d / ((n1d + n2d) * (n1d + n2d - 1.0))) > 0.0
         |    THEN ${r6Sql("(r1x2d / 2.0 - n1d * (n1d + 1.0) / 2.0 - n1d * n2d / 2.0)" +
                   " / sqrt(n1d * n2d / 12.0 * ((n1d + n2d + 1.0)" +
                   " - tie3d / ((n1d + n2d) * (n1d + n2d - 1.0))))")}
         |  END AS z,
         |  ${r6Sql("2.0 * (r1x2d / 2.0 - n1d * (n1d + 1.0) / 2.0) / (n1d * n2d) - 1.0")} AS rank_biserial
         |FROM f""".stripMargin,
    "rel_welch_ttest" ->
      s"""WITH m AS (
         |  SELECT l_returnflag AS grp,
         |    CASE WHEN l_linestatus = 'F' THEN 0 ELSE 1 END AS arm,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,6))) AS sx,
         |    SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,6))
         |      * CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,6))) AS sxx
         |  FROM lineitem WHERE l_linestatus IN ('F', 'O') GROUP BY 1, 2
         |), j AS (
         |  SELECT a.grp,
         |    a.n AS n1, CAST(a.sx AS DOUBLE) AS sx1, CAST(a.sxx AS DOUBLE) AS sxx1,
         |    b.n AS n2, CAST(b.sx AS DOUBLE) AS sx2, CAST(b.sxx AS DOUBLE) AS sxx2,
         |    CAST(a.n AS DOUBLE) AS n1d, CAST(b.n AS DOUBLE) AS n2d
         |  FROM m a JOIN m b USING (grp)
         |  WHERE a.arm = 0 AND b.arm = 1 AND a.n >= 2 AND b.n >= 2
         |), f AS (
         |  SELECT grp, n1, n2,
         |    sx1 / n1d AS m1, sx2 / n2d AS m2,
         |    ((n1d * sxx1 - sx1 * sx1) / (n1d * (n1d - 1.0))) / n1d AS se1,
         |    ((n2d * sxx2 - sx2 * sx2) / (n2d * (n2d - 1.0))) / n2d AS se2,
         |    n1d, n2d
         |  FROM j
         |)
         |SELECT grp AS l_returnflag, n1, n2,
         |  ${r6Sql("m1")} AS mean_a,
         |  ${r6Sql("m2")} AS mean_b,
         |  ${r6Sql("(m1 - m2) / sqrt(se1 + se2)")} AS t_stat,
         |  ${r6Sql("(se1 + se2) * (se1 + se2) / (se1 * se1 / (n1d - 1.0) + se2 * se2 / (n2d - 1.0))")} AS df
         |FROM f ORDER BY l_returnflag""".stripMargin,
    "rel_gaps_islands" ->
      """WITH k AS (
        |  SELECT DISTINCT l_orderkey AS k FROM lineitem
        |), r AS (
        |  SELECT k, k - ROW_NUMBER() OVER (ORDER BY k) AS grp FROM k
        |), isl AS (
        |  SELECT MIN(k) AS start_key, MAX(k) AS end_key,
        |    CAST(COUNT(*) AS BIGINT) AS len
        |  FROM r GROUP BY grp
        |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_islands FROM isl)
        |SELECT start_key, end_key, len, n_islands
        |FROM (SELECT * FROM isl ORDER BY len DESC, start_key LIMIT 20)
        |CROSS JOIN n ORDER BY len DESC, start_key""".stripMargin,
    "rel_decile_lift" ->
      s"""WITH r AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS p,
         |    ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         |    COUNT(*) OVER () AS n
         |  FROM orders
         |), dec AS (
         |  SELECT (rn - 1) * 10 // n + 1 AS decile,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(p) AS BIGINT) AS n_pos
         |  FROM r GROUP BY 1
         |), tot AS (
         |  SELECT CAST(SUM(n_rows) AS BIGINT) AS tn,
         |    CAST(SUM(n_pos) AS BIGINT) AS tp FROM dec
         |), cum AS (
         |  SELECT a.decile, a.n_rows, a.n_pos,
         |    CAST(SUM(b.n_rows) AS BIGINT) AS cum_n,
         |    CAST(SUM(b.n_pos) AS BIGINT) AS cum_pos
         |  FROM dec a JOIN dec b ON b.decile <= a.decile
         |  GROUP BY 1, 2, 3
         |)
         |SELECT decile, n_rows, n_pos,
         |  ${r6Sql("CAST(cum_pos AS DOUBLE) / CAST(tp AS DOUBLE)")} AS capture,
         |  ${r6Sql("(CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE))")} AS lift
         |FROM cum CROSS JOIN tot ORDER BY decile""".stripMargin,
    "rel_winsorize" ->
      s"""WITH b AS (
         |  SELECT l_returnflag AS grp, l_extendedprice AS v FROM lineitem
         |), r AS (
         |  SELECT grp, v,
         |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
         |  FROM b
         |), k AS (
         |  SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
         |    MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN v END) AS p_lo,
         |    MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN v END) AS p_hi
         |  FROM r GROUP BY grp
         |), c AS (
         |  SELECT b.grp, k.n, k.p_lo, k.p_hi,
         |    CAST(least(greatest(b.v, k.p_lo), k.p_hi) AS DECIMAL(15,2)) AS cv
         |  FROM b JOIN k USING (grp)
         |)
         |SELECT grp AS l_returnflag, n, p_lo, p_hi,
         |  ${r6Sql("CAST(SUM(cv) AS DOUBLE) / CAST(n AS DOUBLE)")} AS wins_mean
         |FROM c GROUP BY grp, n, p_lo, p_hi ORDER BY l_returnflag""".stripMargin,
    "rel_sequence_match" ->
      s"""WITH led AS (
         |  SELECT user_id, event_id AS start_id, epoch_us(ts) AS t0,
         |    event_type AS s0,
         |    lead(event_type, 1) OVER w AS s1,
         |    lead(event_type, 2) OVER w AS s2,
         |    lead(event_id, 2) OVER w AS end_id,
         |    lead(epoch_us(ts), 2) OVER w AS t1
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |)
         |SELECT user_id, start_id, end_id, t1 - t0 AS span_us
         |FROM led
         |WHERE s0 = '${FUNNEL(0)}' AND s1 = '${FUNNEL(1)}' AND s2 = '${FUNNEL(2)}'
         |ORDER BY user_id, start_id""".stripMargin,
  )
}
