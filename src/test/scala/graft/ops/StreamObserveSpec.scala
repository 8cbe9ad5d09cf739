package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import scala.collection.concurrent.TrieMap

/** Streaming contract gate: `ContractOps.observedGate` metrics, summed
  * over all micro-batches of a run, must equal the batch rule counts —
  * observed metrics ride the stream's own tasks (no audit pass). */
class StreamObserveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("observed per-batch contract metrics sum to the batch counts") {
    val rules = Seq(
      "low_value" -> (col("value") < 1.0),
      "error_type" -> (col("event_type") === "error"))
    val totals = TrieMap.empty[String, Long]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        Option(e.progress.observedMetrics.get("contract")).foreach { row =>
          row.schema.fieldNames.foreach { f =>
            totals.updateWith(f)(v => Some(v.getOrElse(0L) + row.getAs[Long](f)))
          }
        }
      }
    }
    spark.streams.addListener(listener)
    try {
      val gated = ContractOps.observedGate(
        graft.streaming.StreamOps.eventsStream(spark, sf), rules)
      val q = gated.writeStream.format("noop")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val ev = graft.Tables(spark, sf, "events")
      val nRows = ev.count()
      // listener delivery is async, and an AvailableNow run may split into
      // several micro-batches each with its own progress event — waiting
      // for "non-empty" would race a multi-batch run and read partial
      // sums. Wait until the summed n_rows reaches the full input count
      // (it can never overshoot: each row is observed exactly once).
      val deadline = System.currentTimeMillis() + 30000
      while (totals.getOrElse("n_rows", 0L) < nRows &&
             System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val expect = ev.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("value") < 1.0, 1L).otherwise(0L)).as("low_value"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("error_type")
      ).collect()(0)
      assert(totals.getOrElse("n_rows", -1L) == expect.getAs[Long]("n_rows"))
      assert(totals.getOrElse("low_value", -1L) == expect.getAs[Long]("low_value"))
      assert(totals.getOrElse("error_type", -1L) == expect.getAs[Long]("error_type"))
    } finally spark.streams.removeListener(listener)
  }
}
