package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stateful restart recovery: a checkpointed streaming aggregation stopped
  * mid-corpus and restarted must (1) resume from its committed offsets —
  * never re-reading consumed input — and (2) recover its STATE, so the
  * final aggregate equals the batch aggregate over everything. This is
  * the crash-recovery half of the exactly-once contract (the sink half is
  * pinned by VersionedSinkSpec / stream_txn_sink). */
class RestartRecoverySpec extends SparkSpec {

  test("a stateful aggregation resumes from checkpointed offsets and state") {
    import org.apache.spark.sql.types._
    val root = "/tmp/graft_restart_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(root))
    val (in, cp) = (s"$root/in", s"$root/cp")
    new java.io.File(in).mkdirs()

    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    import spark.implicits._
    def writeChunk(rows: Seq[(String, Long)]): Unit =
      rows.toDF("k", "v").coalesce(1).write.mode("append").parquet(in)

    def runOnce(): (Long, Map[String, Long]) = {
      val name = s"graft_restart_${System.nanoTime()}"
      val agg = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val consumed = q.recentProgress.map(_.numInputRows).sum
      val state = spark.table(name).collect()
        .map(r => r.getString(0) -> (r.getLong(1) * 1000000 + r.getLong(2))).toMap
      (consumed, state)
    }

    writeChunk(Seq(("x", 1L), ("y", 2L)))
    writeChunk(Seq(("x", 10L)))
    val (consumed1, state1) = runOnce()
    assert(consumed1 == 3, s"first run must consume the 3 staged rows, got $consumed1")
    assert(state1 == Map("x" -> (2L * 1000000 + 11), "y" -> (1L * 1000000 + 2)))

    // the "crash": the query is gone; new data lands while it's down
    writeChunk(Seq(("y", 5L), ("z", 7L)))
    val (consumed2, state2) = runOnce()
    // offsets recovered: only the NEW rows are read...
    assert(consumed2 == 2, s"restart must read only the 2 new rows, got $consumed2")
    // ...and state recovered: the aggregate still covers EVERYTHING
    assert(state2 == Map(
      "x" -> (2L * 1000000 + 11),
      "y" -> (2L * 1000000 + 7),
      "z" -> (1L * 1000000 + 7)),
      s"recovered state must equal the batch aggregate, got $state2")
  }
}
