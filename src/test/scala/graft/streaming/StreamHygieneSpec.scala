package graft.streaming

import graft.SparkSpec

/** Pins the session-hygiene contracts the r9 sf1 rehearsal had to
  * discover the hard way: (a) stream queries must not leave their memory
  * sinks registered (a long session would pin every buffered result table
  * on the heap), and (b) `Fs.cleanupAppScratch` must empty every scratch
  * directory this application created — tmpfs checkpoints/stream scratch
  * AND the staged serve indexes under java.io.tmpdir. */
class StreamHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no graft_stream_* temp views survive a stream query run") {
    // one plain-sink query and one through the second (published-log)
    // resolution path — both must unregister their sinks
    graft.SparkEntry.queries("stream_hourly_window")(spark, dir).count()
    graft.SparkEntry.queries("stream_dedup_lastwins")(spark, dir).count()
    val leaked = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_stream_"))
    assert(leaked.isEmpty,
      s"stream sink temp views leaked: ${leaked.mkString(", ")}")
  }

  test("cleanupAppScratch empties every scratch root of this app") {
    val appId = spark.sparkContext.applicationId
    // materialize scratch in all three classes: a stream checkpoint
    // (tmpfs), a stream scratch dir, and a staged serve index (/tmp)
    graft.SparkEntry.queries("stream_hourly_window")(spark, dir).count()
    new java.io.File(
      graft.ops.Fs.streamScratchDir(spark, "graft_hygiene")).mkdirs()
    graft.SparkEntry.queries("text_hybrid_rrf")(spark, dir).count()
    val roots = Seq(
      new java.io.File("/dev/shm"),
      new java.io.File(System.getProperty("java.io.tmpdir", "/tmp")))
      .filter(_.isDirectory)
    def mine(): Seq[String] = roots.flatMap { base =>
      Option(base.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
        .map(_.getName)
        .filter(n => n.startsWith("graft_") && n.contains(appId))
    }
    assert(mine().nonEmpty, "expected live scratch dirs before cleanup")
    graft.ops.Fs.cleanupAppScratch(spark)
    assert(mine().isEmpty,
      s"scratch survived cleanupAppScratch: ${mine().mkString(", ")}")
    // the staged index PATH is still cached in Staging but its files are
    // gone — drop the staged values so later suites rebuild cleanly
    graft.ops.Staging.clear(spark)
  }
}
