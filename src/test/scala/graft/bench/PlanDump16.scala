package graft.bench

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool: write `plans/r16/<query>_<suffix>.txt` normalized physical
  * plans for the optimization round's before/after evidence.
  * Usage: `PlanDump16 <sfDir> <outDir> <suffix> <query>[,<query>...]`
  * Runs under the Bench session config (local[$SPARK_GRAFT_CPUS], shuffle
  * width = cpus) so the dumped shapes match the bench's; plans are
  * normalized by graft.PlanNorm — the same normalizer Bench's plan
  * fingerprints use — so two dumps diff cleanly across commits. */
object PlanDump16 {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
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
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      try {
        val plan = graft.SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.executedPlan.toString
        Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"),
          graft.PlanNorm.normalize(plan))
        println(s"[plandump16] wrote ${n}_$suffix.txt")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"[plandump16] $n FAILED: ${e.getMessage}")
      }
    }
    graft.ops.Fs.cleanupAppScratch(spark)
    spark.stop()
  }
}
