package graft.sources

import graft.SparkSpec
import graft.ops.CommitLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** LogSource: the commit log as a streaming source (offsets = versions). */
class LogSourceSpec extends SparkSpec {

  private def freshTable(tag: String): String = {
    val t = s"/tmp/graft_logsrc_spec_$tag"
    // wipe the WHOLE table dir: CommitLog.reset clears only the log, and a
    // stale streaming checkpoint ($t/_cp) from a previous JVM run would
    // make the "resumed subscriber" correctly read nothing
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(t))
    CommitLog.reset(t)
    t
  }

  private def commitLines(table: String, expected: Long,
                          lines: Seq[String]): CommitLog.Commit = {
    val dir = s"$table/chunk_v${expected + 1}"
    import spark.implicits._
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    CommitLog.commit(table, expected, dir)
  }

  private def drain(table: String, checkpoint: String): Seq[(Long, String)] = {
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream.format(LogSource.NAME)
      .option("maxVersionsPerTrigger", 1).load(table)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => sink.add((r.getLong(0), r.getString(2))))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    sink.asScala.toSeq.sorted
  }

  test("batch read returns every committed chunk line with its version") {
    val t = freshTable("batch")
    commitLines(t, 0L, Seq("a", "b"))
    commitLines(t, 1L, Seq("c"))
    val got = spark.read.format(LogSource.NAME).load(t)
      .select(col("version"), col("line"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got == Seq((1L, "a"), (1L, "b"), (2L, "c")))
  }

  test("a resumed subscriber reads only commits past its checkpointed version") {
    val t = freshTable("resume")
    val cp = s"$t/_cp"
    commitLines(t, 0L, Seq("a", "b"))
    commitLines(t, 1L, Seq("c"))
    assert(drain(t, cp) == Seq((1L, "a"), (1L, "b"), (2L, "c")))
    // new commits land while the subscriber is down
    commitLines(t, 2L, Seq("d"))
    commitLines(t, 3L, Seq("e"))
    // the resumed run must start from the checkpointed offset: versions
    // 1-2 are NOT re-read (exactly-once over the log), only 3-4 arrive
    assert(drain(t, cp) == Seq((3L, "d"), (4L, "e")))
    // nothing new → an empty run, offsets never rewind
    assert(drain(t, cp) == Seq.empty)
  }

  test("maxVersionsPerTrigger bounds each micro-batch to one commit") {
    val t = freshTable("bound")
    val cp = s"$t/_cp"
    for (i <- 0 until 3) commitLines(t, i.toLong, Seq(s"v${i + 1}"))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = spark.readStream.format(LogSource.NAME)
      .option("maxVersionsPerTrigger", 1).load(t)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val vs = b.collect().map(_.getLong(0)).toSeq
        if (vs.nonEmpty) batches.add(vs)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val got = batches.asScala.toSeq
    assert(got.size == 3, s"3 commits must arrive as 3 bounded micro-batches: $got")
    assert(got.forall(_.distinct.size == 1), s"one version per batch: $got")
  }

  test("batch version-range options bound the read inclusively") {
    val t = freshTable("range")
    commitLines(t, 0L, Seq("a"))
    commitLines(t, 1L, Seq("b"))
    commitLines(t, 2L, Seq("c"))
    def readRange(opts: (String, String)*): Set[String] = {
      val r = opts.foldLeft(spark.read.format(LogSource.NAME)) {
        case (b, (k, v)) => b.option(k, v)
      }
      r.load(t).select(col("line")).collect().map(_.getString(0)).toSet
    }
    assert(readRange() == Set("a", "b", "c"))
    assert(readRange("startingVersion" -> "2") == Set("b", "c"))
    assert(readRange("endingVersion" -> "2") == Set("a", "b"))
    assert(readRange("startingVersion" -> "2", "endingVersion" -> "2") == Set("b"))
    assert(readRange("startingVersion" -> "4") == Set())
  }

  test("a table without a commit log fails loudly") {
    val bare = "/tmp/graft_logsrc_spec_bare"
    new java.io.File(bare).mkdirs()
    val e = intercept[IllegalArgumentException] {
      spark.read.format(LogSource.NAME).load(bare).collect()
    }
    assert(e.getMessage.contains("_commits"))
  }
}
