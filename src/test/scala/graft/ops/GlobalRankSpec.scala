package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Value-level pin for Relational2.globalRank: every rank must equal
  * `row_number() OVER (ORDER BY key, tiebreak)` — rank-for-rank, on a real
  * table. This is the check the round-4 regression lacked: the plan-shape
  * test stayed green while RangePartitioner re-sampled different bounds in
  * the counts job vs the ranking job and 14,520/15,000 ranks came out
  * wrong. globalRank now pins one RDD lineage (one shuffle, one set of
  * bounds), and this spec fails the build if that determinism ever slips. */
class GlobalRankSpec extends SparkSpec {

  test("globalRank ≡ row_number() over (order by totalprice, orderkey) on orders") {
    val df = graft.Tables(spark, "/root/testdata/sf0.01", "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val ranked = Relational2.globalRank(df,
      col("o_totalprice"), col("o_orderkey"))
    val truth = df.withColumn("rn",
      row_number().over(Window.orderBy(col("o_totalprice"), col("o_orderkey")))
        .cast("long"))
    val n = df.count()
    val joined = ranked.join(truth, Seq("o_orderkey", "o_totalprice")).cache()
    try {
      assert(joined.count() == n, "rank join lost rows")
      val mismatched = joined.filter(col("__rank") =!= col("rn")).count()
      assert(mismatched == 0, s"$mismatched/$n ranks differ from row_number()")
      val badN = joined.filter(col("__n") =!= lit(n)).count()
      assert(badN == 0, "__n must equal the total row count on every row")
    } finally joined.unpersist()
  }

  test("rank ≡ row_number holds at every shuffle-partition count") {
    // the round-4 bug was partition-boundary arithmetic; sweep partition
    // counts (1 = degenerate single range, 7 = uneven split) to pin the
    // offset math under different boundary placements
    import org.apache.spark.sql.expressions.Window
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val truth = df.withColumn("rn",
      row_number().over(Window.orderBy(col("o_totalprice"), col("o_orderkey")))
        .cast("long"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try for (parts <- Seq("1", "7", "32")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val ranked = Relational2.globalRank(df,
        col("o_totalprice"), col("o_orderkey"))
      val bad = ranked.join(truth, Seq("o_orderkey", "o_totalprice"))
        .filter(col("__rank") =!= col("rn")).count()
      assert(bad == 0, s"$bad wrong ranks at shuffle.partitions=$parts")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("globalRank is dense, 1-based, and stable across repeated evaluation") {
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val ranked = Relational2.globalRank(df,
      col("o_totalprice"), col("o_orderkey")).cache()
    try {
      val n = ranked.count()
      val agg = ranked.agg(min("__rank"), max("__rank"),
        countDistinct("__rank")).collect()(0)
      assert(agg.getLong(0) == 1L && agg.getLong(1) == n &&
        agg.getLong(2) == n, s"ranks not a dense 1..$n permutation: $agg")
    } finally ranked.unpersist()
  }

  test("groupedRank ≡ row_number() over (partition by flag order by price, keys)") {
    val df = graft.Tables(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
    val ranked = Relational2.groupedRank(df, "l_returnflag",
      col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val truth = df.withColumn("rn",
      row_number().over(Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))).cast("long"))
      .withColumn("gn", count(lit(1))
        .over(Window.partitionBy(col("l_returnflag"))))
    val n = df.count()
    val joined = ranked.join(truth,
      Seq("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"))
      .cache()
    try {
      assert(joined.count() == n, "grouped rank join lost rows")
      assert(joined.filter(col("__grank") =!= col("rn")).count() == 0,
        "grouped ranks differ from the keyed row_number()")
      assert(joined.filter(col("__gn") =!= col("gn")).count() == 0,
        "group totals differ from the keyed count()")
    } finally joined.unpersist()
  }

  test("globalGroupedRank fused ≡ global row_number AND keyed row_number") {
    // the fused kernel (one range exchange on the keys, groups interleaved
    // within partitions) must agree with BOTH window truths at once —
    // exactly what ksDrift consumed as two separate kernels plus a join
    val df = graft.Tables(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
    val ranked = Relational2.globalGroupedRank(df, "l_returnflag",
      col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val ord = Window.orderBy(col("l_extendedprice"), col("l_orderkey"),
      col("l_linenumber"))
    val grp = Window.partitionBy(col("l_returnflag"))
    val truth = df
      .withColumn("rn", row_number().over(ord).cast("long"))
      .withColumn("grn", row_number().over(grp.orderBy(
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")))
        .cast("long"))
      .withColumn("gn", count(lit(1)).over(grp))
    val n = df.count()
    val joined = ranked.join(truth,
      Seq("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"))
      .cache()
    try {
      assert(joined.count() == n, "fused rank join lost rows")
      assert(joined.filter(col("__rank") =!= col("rn")).count() == 0,
        "fused global ranks differ from row_number()")
      assert(joined.filter(col("__grank") =!= col("grn")).count() == 0,
        "fused grouped ranks differ from the keyed row_number()")
      assert(joined.filter(col("__n") =!= lit(n)).count() == 0,
        "__n must equal the total row count on every row")
      assert(joined.filter(col("__gn") =!= col("gn")).count() == 0,
        "__gn differs from the keyed count()")
    } finally joined.unpersist()
  }

  test("globalGroupedRank: string + null group keys, uneven partitions") {
    import spark.implicits._
    // unique values — the range keys must be a total order for rank
    // identity (the globalRank contract); groups interleave in the order
    val df = Seq((Option("a"), 3L), (None, 1L), (Option("a"), 4L),
      (None, 2L), (Option("b"), 5L), (Option("a"), 6L)).toDF("g", "v")
      .repartition(4) // force multi-partition input
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try for (parts <- Seq("1", "3", "32")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val got = Relational2.globalGroupedRank(df, "g", col("v"))
        .collect()
        .map(r => (Option(r.getString(0)), r.getLong(1)) ->
          (r.getLong(2), r.getLong(4), r.getLong(5))).toMap
      // global order by v: 1(null) 2(null) 3(a) 4(a) 5(b) 6(a)
      assert(got == Map(
        (None, 1L) -> (1L, 1L, 2L), (None, 2L) -> (2L, 2L, 2L),
        (Option("a"), 3L) -> (3L, 1L, 3L), (Option("a"), 4L) -> (4L, 2L, 3L),
        (Option("b"), 5L) -> (5L, 1L, 1L), (Option("a"), 6L) -> (6L, 3L, 3L)),
        s"at shuffle.partitions=$parts: $got")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("groupedRank: null group keys rank as their own contiguous group") {
    import spark.implicits._
    val df = Seq((Option("a"), 3L), (None, 1L), (Option("a"), 1L),
      (None, 2L), (Option("b"), 5L)).toDF("g", "v")
      .repartition(4) // force multi-partition input
    val got = Relational2.groupedRank(df, "g", col("v"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      (Option("a"), 1L) -> (1L, 2L), (Option("a"), 3L) -> (2L, 2L),
      (None, 1L) -> (1L, 2L), (None, 2L) -> (2L, 2L),
      (Option("b"), 5L) -> (1L, 1L)))
  }
}
