package graft.bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: pin append-mode watermark emission semantics empirically.
  * Prints max event ts, then the windows an append+watermark hourly agg
  * emits, so the oracle's eviction predicate (`end <= wm` vs `end < wm`)
  * is measured, not guessed. */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables(spark, dir, "events")
    ev.agg(max(col("ts")), min(col("ts"))).show(false)
    val agg = graft.streaming.StreamOps.eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    val out = graft.streaming.StreamOps.runToMemory(agg, "append")
    println("APPEND emitted windows (max w_start):")
    out.agg(max(col("w_start")), count(lit(1))).show(false)
    // batch truth: all windows
    ev.groupBy(date_trunc("hour", col("ts")).as("w_start"))
      .agg(count(lit(1))).agg(max(col("w_start")), count(lit(1))).show(false)
    spark.stop()
  }
}
