package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev tool: time one query GROSS and print the per-substrate staging
  * breakdown its run triggered — `StagingProbe <sfDir> <name> [reps]`.
  * Same accounting as Bench's instrumented passes (staging cleared per
  * rep, every staged build timed against its key). */
object StagingProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 2
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
    graft.ops.Staging.setInstrumented(true)
    (0 to reps).foreach { i =>
      graft.ops.Staging.clear(spark)
      graft.ops.Staging.drainBuildLog()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val built = graft.ops.Staging.drainBuildLog()
      val charged = built.map(_._2).sum
      println(f"[probe] $name run=$i rows=$n gross=$sec%.2f " +
        f"net=${sec - charged}%.2f" + (if (i == 0) " (warmup)" else ""))
      built.sortBy(-_._2).foreach { case (k, s) =>
        println(f"[probe]   staged $k%-24s $s%.2f")
      }
    }
    graft.ops.Fs.cleanupAppScratch(spark)
    spark.stop()
  }
}
