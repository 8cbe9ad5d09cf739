package graft.tmp
import org.apache.spark.sql.SparkSession
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val ckpt = args.headOption.getOrElse("none")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (ckpt != "none") b.config("spark.sql.streaming.checkpointLocation", ckpt)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = Seq("stream_outer_join", "stream_txn_sink", "stream_session_window", "stream_stream_join")
    for (q <- qs) {
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
        (System.nanoTime()-t0)/1e9
      }
      println(f"PROBE $q%-24s median=${times.sorted.apply(1)}%.2f s  (ckpt=$ckpt)")
    }
    spark.stop()
  }
}
