package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev tool: warm-time one query — `TimeOne <sfDir> <name> [reps]` runs
  * the named SparkEntry query `reps` times (first run = warmup) under the
  * Bench session config and prints each run's seconds. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Fs.pointStreamCheckpointsAtTmpfs(spark)
    (0 to reps).foreach { i =>
      graft.ops.Staging.clear(spark)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timeone] $name run=$i rows=$n sec=$sec%.2f" +
        (if (i == 0) " (warmup)" else ""))
    }
    graft.ops.Fs.cleanupAppScratch(spark)
    spark.stop()
  }
}
