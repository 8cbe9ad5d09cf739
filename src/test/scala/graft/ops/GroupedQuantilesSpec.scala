package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The migration contract of the exact-percentile family: the
  * groupedRank-substrate computation must equal Spark's own `percentile`
  * ImperativeAggregate BIT-FOR-BIT — on skewed group sizes, heavy value
  * ties, single-row and two-row groups, and integral interpolation
  * positions (the shapes where an off-by-one in the rank arithmetic or a
  * different interpolation spelling would show). The DuckDB oracle pins
  * one corpus; this pins the kernel itself. */
class GroupedQuantilesSpec extends SparkSpec {

  import spark.implicits._

  private val ps = Seq(("p25", 0.25), ("p50", 0.5), ("p90", 0.9), ("p99", 0.99))

  private def check(rows: Seq[(String, Double)]): Unit = {
    val df = rows.toDF("g", "v").repartition(5) // spread groups over partitions
    val got = Relational2.groupedQuantiles(df, "g", "v", ps)
      .orderBy("g").collect()
      .map(r => (r.getString(0), ps.indices.map(i => r.getDouble(i + 1)),
        r.getLong(ps.size + 1)))
    val want = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.25)).as("p25"),
        percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.9)).as("p90"),
        percentile(col("v"), lit(0.99)).as("p99"),
        count(lit(1)).as("n"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), ps.indices.map(i => r.getDouble(i + 1)),
        r.getLong(ps.size + 1)))
    assert(got.toSeq == want.toSeq) // == on doubles: bit-equality demanded
  }

  test("pseudo-random skewed groups match Spark's percentile exactly") {
    val rows = (0 until 5000).map { i =>
      val g = s"g${(i * i) % 7}" // skewed group sizes
      val v = ((i * 2654435761L) % 100000L).toDouble / 7.0
      (g, v)
    }
    check(rows)
  }

  test("heavy ties, tiny groups, and integral positions") {
    val ties = (0 until 400).map(i => ("t", (i % 3).toDouble)) // 3 distinct values
    val single = Seq(("s", 42.5))
    val pair = Seq(("p", 1.0), ("p", 2.0))
    // 5 rows: position p50 = 0.5*(5-1) = 2.0 integral — no interpolation
    val integral = (1 to 5).map(i => ("i", i.toDouble))
    check(ties ++ single ++ pair ++ integral)
  }

  test("null values are ignored like the native aggregate") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None), ("b", Some(5.0))).toDF("g", "v")
    val got = Relational2.groupedQuantiles(df, "g", "v", Seq(("p50", 0.5)))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 2.0, 2L), ("b", 5.0, 1L)))
  }
}
