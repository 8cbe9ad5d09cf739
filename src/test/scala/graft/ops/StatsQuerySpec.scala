package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** src_stats_query's zero-scan claim, proven the strong way: the
  * metadata-only answer must survive the DATA being gone. */
class StatsQuerySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("the stats fold answers identically after the data dirs are renamed away") {
    val path = "/tmp/graft_statsq_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(path))
    CommitLog.reset(path)
    new java.io.File(path).mkdirs()
    val orders = graft.Tables(spark, sf, "orders")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    for (i <- 0 until 3)
      FormatOps.writeStatsCommit(spark, path, i.toLong, s"$path/data_v${i + 1}",
        orders.filter(pmod(col("o_orderkey"), lit(3)) === i))
    val before = FormatOps.statsAnswer(spark, path).head()
    assert(before.getLong(0) == orders.count())
    // vanish the data: only the log + sidecars remain
    for (i <- 1 to 3) {
      val d = new java.io.File(s"$path/data_v$i")
      assert(d.renameTo(new java.io.File(s"$path/gone_v$i")))
    }
    val after = FormatOps.statsAnswer(spark, path).head()
    assert(after == before,
      "the metadata-only answer must not depend on data files")
    // while an actual scan of the committed dirs now fails
    intercept[Exception] {
      spark.read.parquet(s"$path/data_v1").count()
    }
  }

  test("an empty batch is rejected: no commit, no null-poisoned sidecar") {
    val path = "/tmp/graft_statsq_empty_spec"
    CommitLog.reset(path)
    new java.io.File(path).mkdirs()
    val orders = graft.Tables(spark, sf, "orders")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    intercept[IllegalArgumentException] {
      FormatOps.writeStatsCommit(spark, path, 0L, s"$path/data_v1",
        orders.filter(lit(false)))
    }
    assert(CommitLog.latest(path).isEmpty,
      "a rejected empty batch must publish no version")
  }
}
