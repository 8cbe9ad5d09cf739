package graft.tmp

import org.apache.spark.sql.SparkSession

/** FULL-SUITE scale rehearsal: every SparkEntry query at sf0.1 and the
  * synthesized sf1 (tools/gen_sf1.py), min-of-2 per dir, ratio recorded
  * to BENCH_SF1_FULL.json. Complements BenchSf1 (heavy set, min-of-3):
  * this run answers "does ANY query blow up super-linearly at 10x data",
  * not just the known-heavy tail. */
object FullSf1 {
  private val PASSES = 2

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val queries = graft.SparkEntry.queries.keys.toSeq.sorted
    def run(name: String, dir: String): Double = {
      graft.ops.Staging.clear(spark)
      val t0 = System.nanoTime()
      try { graft.SparkEntry.queries(name)(spark, dir).count() }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[sf1full] $name @ $dir failed: $e"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val dirs = Seq("/root/testdata/sf0.1", "/tmp/testdata_sf1")
    def minOk(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ >= 0); if (ok.isEmpty) -1.0 else ok.min
    }
    val measured = queries.map { q =>
      val p01 = (1 to PASSES).map(_ => run(q, dirs(0)))
      val p1 = (1 to PASSES).map(_ => run(q, dirs(1)))
      val (s01, s1) = (minOk(p01), minOk(p1))
      val ratio = if (s01 > 0 && s1 > 0) s1 / s01 else -1.0
      println(f"SF1FULL $q%-28s sf0.1=$s01%7.2f s  sf1=$s1%7.2f s  ratio=$ratio%6.2f")
      val json = f""""$q":{"sf01_sec":$s01%.2f,"sf1_sec":$s1%.2f,"ratio":$ratio%.2f}"""
      (q, ratio, s1, json)
    }
    val rows = measured.map(_._4)
    val (worstQ, worstR, _, _) = measured.maxBy(_._2)
    val notes =
      if (measured.exists(_._2 < 0)) "FAILURES present; see -1 ratios"
      else f"all ${measured.size} queries green at sf1; worst ratio $worstR%.1fx = $worstQ " +
        "(fixed-cost queries sit near 1x; per-pair scans scale with candidates)"
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(" ")
      catch { case scala.util.control.NonFatal(_) => "unavailable" }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_SF1_FULL.json"),
      rows.mkString(
        s"""{"metric":"scale_rehearsal_full","stat":"min_of_$PASSES","sf1_dir":"${dirs(1)}","generator":"tools/gen_sf1.py","load":"${loadavg()}","notes":"$notes","queries":{""",
        ",", "}}"))
    spark.stop()
  }
}
