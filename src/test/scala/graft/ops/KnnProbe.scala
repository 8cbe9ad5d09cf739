package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev probe (r17): decompose the knn_edges staged build — ivf_ranked
  * substrate vs the salted per-cell self-join + top-k vs the serve.
  * Usage: `KnnProbe <sfDir> [reps]` under the Bench session config. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
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
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[knnprobe] $tag rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    (0 to reps).foreach { i =>
      Staging.clear(spark)
      println(s"[knnprobe] --- rep $i ${if (i == 0) "(warmup)" else ""}")
      time("ivf_ranked") {
        Similarity.ivfRanked(spark, sfDir).count()
      }
      // knn_edges build with ivf_ranked warm: invoke the consumer query,
      // which serves from the just-built staging
      time("knn_edges+serve") {
        graft.SparkEntry.queries("sim_knn_graph")(spark, sfDir).count()
      }
      time("serve_only") {
        graft.SparkEntry.queries("sim_knn_graph")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
