package graft.tmp

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev probe for Bench's plan-fingerprint determinism: prints the
  * NORMALIZED executed-plan text (the exact normalization Bench.shaOfPlan
  * applies) for a query subset, to a file — run twice in separate JVMs
  * and diff to find residual run-variant tokens the normalizer misses. */
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
    def norm(s: String): String = s
      .replaceAll("\\${1,3}Lambda\\$?\\d*/0x[0-9a-f]+(@[0-9a-f]+)?", "LAMBDA")
      .replaceAll("#\\d+[A-Za-z]*", "#")
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("app(lication)?[-_][0-9]+", "app")
      .replaceAll("local-\\d+", "local")
      .replaceAll("graft_[a-z0-9_]*", "graft_scratch")
      .replaceAll("/tmp/[^\\s,\\)\\]]*", "/tmp/_")
      .replaceAll("\\d+ paths", "N paths")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics()")
      .replaceAll("StorageLevel\\([^)]*\\)", "StorageLevel()")
      .replaceAll("size=[0-9.]+ [KMGT]?i?B", "size=")
      .replaceAll("rows=\\d+", "rows=")
    val sb = new StringBuilder
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      sb.append(s"===== $n =====\n")
      sb.append(norm(df.queryExecution.executedPlan.toString))
      sb.append("\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    spark.stop()
  }
}
