package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GeoJoinRewrite: the naive proximity join and its rewritten form must be
  * row-identical, and the rewrite must change the JOIN STRATEGY, not the
  * answer. */
class GeoJoinRewriteSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  // small deterministic point cloud with clustered + isolated points,
  // including pairs straddling cell boundaries
  private def pts(idBase: Long): DataFrame = {
    import spark.implicits._
    (0 until 60).map { i =>
      val lat = (i % 10) * 0.05 + (i % 7) * 0.011
      val lon = (i % 12) * 0.05 + (i % 5) * 0.013
      (idBase + i, lat, lon)
    }.toDF("id", "lat", "lon")
  }

  private def naive(): DataFrame = {
    val a = pts(0).select(col("id").as("e1"), col("lat").as("lat1"), col("lon").as("lon1"))
    val b = pts(1000).select(col("id").as("e2"), col("lat").as("lat2"), col("lon").as("lon2"))
    GeoWithin.register(spark)
    a.join(b, GeoWithin.within(col("lat1"), col("lon1"),
      col("lat2"), col("lon2"), lit(0.05)))
      .select(col("e1"), col("e2"))
  }

  private def collectPairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("the rewrite preserves the naive join's rows exactly") {
    val prev = spark.experimental.extraOptimizations
    val without = collectPairs(naive())
    spark.experimental.extraOptimizations = prev :+ GeoJoinRewrite
    try {
      val withRule = naive()
      val plan = withRule.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule must remove the nested-loop join:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
      assert(collectPairs(withRule) == without)
      assert(without.nonEmpty, "fixture must produce qualifying pairs")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("without the rule the same plan nested-loops (the claim's baseline)") {
    // geo_join_rule installs the rule SESSION-WIDE (by design — a
    // restored-away rule would miss every downstream re-optimization), so
    // the baseline measurement explicitly removes it for the check
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev.filterNot(_ == GeoJoinRewrite)
    try {
      val plan = naive().queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("duplicate-free: each qualifying pair matches on exactly one cell key") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ GeoJoinRewrite
    try {
      val rows = naive().collect()
      assert(rows.length == rows.distinct.length,
        "the 9-key explode must not duplicate result rows")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("a foldable composite threshold still takes the grid path; t <= 0 falls back") {
    val a = pts(0).select(col("id").as("e1"), col("lat").as("lat1"), col("lon").as("lon1"))
    val b = pts(1000).select(col("id").as("e2"), col("lat").as("lat2"), col("lon").as("lon2"))
    GeoWithin.register(spark)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ GeoJoinRewrite
    try {
      // lit(0.05) * lit(1.0) is foldable but NOT a raw Literal — the rule
      // must still rewrite (pre-fix it silently nested-looped)
      val composite = a.join(b, GeoWithin.within(col("lat1"), col("lon1"),
        col("lat2"), col("lon2"), lit(0.05) * lit(1.0))).select(col("e1"), col("e2"))
      val plan = composite.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"foldable threshold must take the grid rewrite:\n$plan")
      assert(collectPairs(composite) == collectPairs(naive()))
      // a non-positive cell size has no pigeonhole guarantee: keep the
      // original join rather than rewriting into a broken grid
      val zero = a.join(b, GeoWithin.within(col("lat1"), col("lon1"),
        col("lat2"), col("lon2"), lit(0.0))).select(col("e1"), col("e2"))
      val zeroPlan = zero.queryExecution.executedPlan.toString
      assert(zeroPlan.contains("BroadcastNestedLoopJoin") || zeroPlan.contains("CartesianProduct"))
      assert(zero.count() == 0L)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("the unrewritten-join diagnostic fires on a non-foldable threshold") {
    // the rule's worst failure mode is a SILENT fallback to the nested
    // loop; GeoJoinRewrite counts every GeoWithin join it leaves
    // unrewritten, and this negative spec pins that the counter moves
    val a = pts(0).select(col("id").as("e1"), col("lat").as("lat1"),
      col("lon").as("lon1"), (col("lat") * 0 + 0.05).as("t1"))
    val b = pts(1000).select(col("id").as("e2"), col("lat").as("lat2"), col("lon").as("lon2"))
    GeoWithin.register(spark)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ GeoJoinRewrite
    try {
      val before = GeoJoinRewrite.fallbackCount.get()
      // per-row threshold column: correct to evaluate, impossible to grid
      val df = a.join(b, GeoWithin.within(col("lat1"), col("lon1"),
        col("lat2"), col("lon2"), col("t1"))).select(col("e1"), col("e2"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
        "non-foldable threshold must keep the original join")
      assert(GeoJoinRewrite.fallbackCount.get() > before,
        "the fallback diagnostic must fire when a GeoWithin join is left unrewritten")
      assert(collectPairs(df) == collectPairs(naive()),
        "the fallback must still answer correctly")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("the knn mirrored-cell shape (self-join, id inequality) rewrites too") {
    // geo_knn_radius builds its grid by hand; the SAME query written
    // naively — one point set self-joined on GeoWithin plus an id
    // inequality — must take the rewrite, covering the optimizer tier's
    // second spatial shape
    val p = pts(0)
    val a = p.select(col("id").as("e1"), col("lat").as("lat1"), col("lon").as("lon1"))
    val b = p.select(col("id").as("e2"), col("lat").as("lat2"), col("lon").as("lon2"))
    GeoWithin.register(spark)
    def knn(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val d2 = (col("lat1") - col("lat2")) * (col("lat1") - col("lat2")) +
        (col("lon1") - col("lon2")) * (col("lon1") - col("lon2"))
      val w = Window.partitionBy(col("e1")).orderBy(col("dist2").asc, col("e2").asc)
      a.join(b, GeoWithin.within(col("lat1"), col("lon1"),
          col("lat2"), col("lon2"), lit(0.05)) && col("e1") =!= col("e2"))
        .select(col("e1"), col("e2"), d2.as("dist2"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("e1"), col("e2"), col("rk").cast("long").as("rk"))
    }
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev.filterNot(_ == GeoJoinRewrite)
    val baseline = knn().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.experimental.extraOptimizations =
      prev.filterNot(_ == GeoJoinRewrite) :+ GeoJoinRewrite
    try {
      val rewritten = knn()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"self-join knn shape must take the grid rewrite:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == baseline && got.nonEmpty)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("GraftExtensions installs the function and the rule at session build") {
    // fresh session over the SAME SparkContext (GraftExtensionsSpec's
    // pattern — .stop() would kill the shared context)
    val fresh = try org.apache.spark.sql.SparkSession.builder()
      .master(spark.sparkContext.master)
      .withExtensions(new graft.functions.GraftExtensions)
      .create()
    finally {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    }
    fresh.range(3).createOrReplaceTempView("l")
    fresh.range(3).createOrReplaceTempView("r")
    val out = fresh.sql(
      """SELECT l.id AS a, r.id AS b FROM l JOIN r
        |ON graft_geo_within(CAST(l.id AS DOUBLE), 0.0d,
        |                    CAST(r.id AS DOUBLE), 0.0d, 1.5d)""".stripMargin)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"injected rule must rewrite the SQL join:\n$plan")
    // |id_l - id_r| < 1.5 → neighbors and self
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for (i <- 0L until 3L; j <- 0L until 3L if math.abs(i - j) < 1.5)
      yield (i, j)).toSet
    assert(got == want)
  }
}
