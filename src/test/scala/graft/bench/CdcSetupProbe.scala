package graft.bench
import org.apache.spark.sql.SparkSession

/** Scratch: decompose stream_change_feed's wall — setup (feed staging)
  * vs stream run — by timing the factory twice with a pre-warmed scan. */
object CdcSetupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Fs.pointStreamCheckpointsAtTmpfs(spark)
    val sf = "/root/testdata/sf0.1"
    graft.Tables(spark, sf, "orders").count() // warm
    for (q <- Seq("stream_change_feed", "stream_change_feed",
        "stream_log_source", "stream_log_source")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf).count()
      println(f"PROBE $q ${(System.nanoTime()-t0)/1e9}%5.2f s")
    }
    spark.stop()
  }
}
