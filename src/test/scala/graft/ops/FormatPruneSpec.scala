package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FormatPruneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("manifest pruning selects a strict subset of files") {
    val path = s"/tmp/graft-test-manifest-${System.nanoTime()}"
    graft.Tables(spark, sf, "orders")
      .repartitionByRange(16, col("o_orderdate"))
      .write.mode("overwrite").parquet(path)
    val (files, total) = FormatOps.manifestPrune(spark, path,
      java.sql.Timestamp.valueOf("1997-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    assert(files.nonEmpty, "some files must overlap the window")
    assert(files.size < total,
      s"pruning must drop files: kept ${files.size} of $total")
    // no qualifying row lost: pruned read == full filtered read
    val pruned = spark.read.parquet(files: _*)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp")).count()
    val full = spark.read.parquet(path)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp")).count()
    assert(pruned == full)
  }

  test("compaction reduces file count and preserves rows") {
    val path = s"/tmp/graft-test-compact-${System.nanoTime()}"
    val ev = graft.Tables(spark, sf, "events").select("event_id", "value")
    ev.repartition(32).write.mode("overwrite").parquet(s"$path/small")
    val nSmall = spark.read.parquet(s"$path/small").inputFiles.length
    spark.read.parquet(s"$path/small").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/big")
    val big = spark.read.parquet(s"$path/big")
    assert(big.inputFiles.length < nSmall)
    assert(big.count() == ev.count())
  }
}
