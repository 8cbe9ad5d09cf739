package graft.bench
import org.apache.spark.sql.SparkSession

/** Scratch: where does the stream-family fixed floor go? Wall-time each
  * stream query at sf0.1 and dump per-batch durationMs from the last run's
  * progress via a listener. */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Fs.pointStreamCheckpointsAtTmpfs(spark)
    val sf = "/root/testdata/sf0.1"
    val progress = scala.collection.mutable.ArrayBuffer[(String, String)]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          progress += ((e.progress.name, e.progress.durationMs.toString))
        override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    val qs = args.headOption.map(_.split(",").toSeq).getOrElse(
      graft.SparkEntry.queries.keys.filter(_.startsWith("stream_")).toSeq.sorted)
    // warm the JVM/session on one query
    graft.SparkEntry.queries(qs.head)(spark, sf).count()
    var total = 0.0
    for (q <- qs) {
      progress.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf).count()
      val dt = (System.nanoTime() - t0) / 1e9
      total += dt
      // parse durationMs maps: {k=v, ...}
      val parsed = progress.toSeq.map(_._2).map { s =>
        s.stripPrefix("{").stripSuffix("}").split(",\\s*").map { kv =>
          val Array(k, v) = kv.split("="); k -> v.toLong
        }.toMap
      }
      val nb = parsed.size
      def tot(k: String) = parsed.map(_.getOrElse(k, 0L)).sum
      val trig = tot("triggerExecution") / 1000.0
      println(f"FLOOR $q%-28s $dt%6.2f s  batches=$nb trig=$trig%5.2f " +
        f"addBatch=${tot("addBatch")/1000.0}%5.2f plan=${tot("queryPlanning")/1000.0}%5.2f " +
        f"wal=${(tot("walCommit")+tot("commitOffsets"))/1000.0}%5.2f " +
        f"startStop=${dt - trig}%5.2f")
    }
    println(f"FLOOR total ${total}%6.2f s over ${qs.size} queries")
    spark.stop()
  }
}
