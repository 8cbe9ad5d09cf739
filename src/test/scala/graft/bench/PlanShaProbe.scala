package graft.bench

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Fresh-JVM probe for Bench's plan-fingerprint determinism: prints the
  * NORMALIZED executed-plan text (via [[graft.PlanNorm]] — the exact
  * normalization Bench.shaOfPlan applies, shared, not copied) for a
  * query subset, to a file — run twice in separate JVMs and diff to find
  * residual run-variant tokens the normalizer misses. */
object PlanShaProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/plansha_probe.txt")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("rel_count_distinct", "rel_profile", "rel_cramers_v")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      sb.append(s"===== $n =====\n")
      sb.append(graft.PlanNorm.normalize(
        df.queryExecution.executedPlan.toString))
      sb.append("\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    spark.stop()
  }
}
