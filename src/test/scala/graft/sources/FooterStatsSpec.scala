package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A local filesystem registered under a scheme ONLY the Spark session's
  * hadoopConfiguration knows about — footer reads through it succeed iff
  * FooterStats ships the SESSION conf into its tasks (the seam a real
  * cluster needs for credentials / custom fs impls). */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

/** FooterStats must report exactly what a row scan would — the footer is
  * the same data's metadata — while never reading row data. The bloom
  * side must have NO false negatives (planted keys always keep their
  * file) and genuinely skip files for keys outside them. */
class FooterStatsSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_fstat_$name"
    graft.ops.Fs.deleteRecursively(new java.io.File(d))
    d
  }

  test("footer min/max/rows equal the row-scan manifest") {
    val path = tmp("minmax")
    import spark.implicits._
    val df = (1L to 10000L).map(i => (i, i * 3 % 997)).toDF("k", "v")
    df.repartitionByRange(8, col("k")).write.parquet(path)
    val files = spark.read.parquet(path).inputFiles.toSeq
    val footer = FooterStats.longMinMax(spark, files, Seq("k", "v"))
      .orderBy(col("file")).collect()
    val scan = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"), min(col("k")), max(col("k")),
        min(col("v")), max(col("v")))
      .orderBy(col("file")).collect()
    assert(footer.length == 8 && footer.length == scan.length)
    footer.zip(scan).foreach { case (f, sc) =>
      assert(f.getString(0) == sc.getString(0))
      (1 to 5).foreach(i => assert(f.getLong(i) == sc.getLong(i),
        s"col $i of ${f.getString(0)}"))
    }
    assert(FooterStats.rowCount(spark, files) == 10000L)
  }

  test("timestamp (TIMESTAMP_MICROS) footer bounds match the row scan") {
    val path = tmp("ts")
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      (0L until 1000L).map(i => (i, i * 86400L))
        .toDF("k", "secs")
        .withColumn("ts", timestamp_seconds(col("secs"))).drop("secs")
        .repartitionByRange(4, col("ts")).write.parquet(path)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val files = spark.read.parquet(path).inputFiles.toSeq
    val footer = FooterStats.longMinMax(spark, files, Seq("ts"))
      .select(col("file"), timestamp_micros(col("ts_lo")).as("lo"),
        timestamp_micros(col("ts_hi")).as("hi"))
      .orderBy(col("file")).collect()
    val scan = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .orderBy(col("file")).collect()
    footer.zip(scan).foreach { case (f, sc) =>
      assert(f.getTimestamp(1) == sc.getTimestamp(1) &&
        f.getTimestamp(2) == sc.getTimestamp(2), f.getString(0))
    }
  }

  test("INT96 timestamps (no footer stats) degrade to NULL bounds, not lies") {
    val path = tmp("int96")
    import spark.implicits._
    // INT96 is the session default the harness overrides per-write; a
    // table written without the override must surface as "unknown", so
    // planners keep the file instead of mis-pruning
    assert(spark.conf.get("spark.sql.parquet.outputTimestampType") == "INT96")
    (0L until 100L).map(i => (i, i * 86400L)).toDF("k", "secs")
      .withColumn("ts", timestamp_seconds(col("secs"))).drop("secs")
      .coalesce(1).write.parquet(path)
    val files = spark.read.parquet(path).inputFiles.toSeq
    val r = FooterStats.longMinMax(spark, files, Seq("ts", "k")).head()
    assert(r.isNullAt(2) && r.isNullAt(3), "INT96 must yield NULL bounds")
    assert(r.getLong(4) == 0L && r.getLong(5) == 99L, "longs keep real bounds")
  }

  test("multi-row-group files fold stats and blooms across ALL groups") {
    val path = tmp("multirg")
    import spark.implicits._
    // force several row groups inside ONE file: tiny block size + one task
    (1L to 50000L).map(i => (i, s"payload_$i" * 4)).toDF("k", "p")
      .coalesce(1)
      .write
      .option("parquet.block.size", (64 * 1024).toString)
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.bloom.filter.expected.ndv#k", "50000")
      .parquet(path)
    val files = spark.read.parquet(path).inputFiles.toSeq
    assert(files.size == 1)
    val nGroups = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(files.head),
        new org.apache.hadoop.conf.Configuration())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.size finally r.close()
    }
    assert(nGroups > 1, s"need several row groups, got $nGroups")
    // min must come from the FIRST group, max from the LAST
    val st = FooterStats.longMinMax(spark, files, Seq("k")).head()
    assert(st.getLong(1) == 50000L && st.getLong(2) == 1L &&
      st.getLong(3) == 50000L)
    // a key in any group keeps the file; absent keys may drop it
    assert(FooterStats.bloomKeep(spark, files, "k", Seq(1L)).size == 1)
    assert(FooterStats.bloomKeep(spark, files, "k", Seq(49999L)).size == 1)
  }

  test("string and double footer bounds match the row scan") {
    val path = tmp("typed")
    import spark.implicits._
    val df = (1 to 4000)
      .map(i => (f"key_$i%06d", i / 7.0 - 100.0, i.toLong))
      .toDF("sk", "dv", "k")
    df.repartitionByRange(6, col("k")).write.parquet(path)
    val files = spark.read.parquet(path).inputFiles.toSeq
    val bin = FooterStats.binaryMinMax(spark, files, Seq("sk"))
      .orderBy(col("file")).collect()
    val dbl = FooterStats.doubleMinMax(spark, files, Seq("dv"))
      .orderBy(col("file")).collect()
    val scan = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("sk")), max(col("sk")), min(col("dv")), max(col("dv")))
      .orderBy(col("file")).collect()
    bin.zip(scan).foreach { case (f, sc) =>
      assert(f.getString(2) == sc.getString(1) &&
        f.getString(3) == sc.getString(2), s"string bounds ${f.getString(0)}")
    }
    dbl.zip(scan).foreach { case (f, sc) =>
      assert(f.getDouble(2) == sc.getDouble(3) &&
        f.getDouble(3) == sc.getDouble(4), s"double bounds ${f.getString(0)}")
    }
    // a physical-type mismatch (reading a string column with the long
    // helper) must degrade to NULL bounds — keep the file, never lie
    val wrong = FooterStats.longMinMax(spark, files, Seq("sk")).head()
    assert(wrong.isNullAt(2) && wrong.isNullAt(3),
      "wrong-typed stats must yield NULL bounds")
  }

  test("the SESSION's hadoop conf reaches the footer tasks (fs seam)") {
    val path = tmp("confseam")
    import spark.implicits._
    (1L to 100L).map(i => (i, i * 2)).toDF("k", "v")
      .coalesce(1).write.parquet(path)
    val local = spark.read.parquet(path).inputFiles.toSeq
    // register the scheme ONLY in the session conf: the old executor-side
    // `new Configuration()` would throw "No FileSystem for scheme"
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    try {
      val aliased = local.map(f => "graftfs://" + new java.net.URI(f).getPath)
      assert(FooterStats.rowCount(spark, aliased) == 100L)
      val st = FooterStats.longMinMax(spark, aliased, Seq("k")).head()
      assert(st.getLong(2) == 1L && st.getLong(3) == 100L,
        "bounds must come back through the session-registered scheme")
    } finally
      spark.sparkContext.hadoopConfiguration.unset("fs.graftfs.impl")
  }

  test("parquet-native bloom filters: no false negatives, real skipping") {
    val path = tmp("bloom")
    import spark.implicits._
    // 16 files of 1000 disjoint keys each; bloom filter per file
    (0L until 16000L).map(i => (i, s"p$i")).toDF("k", "p")
      .repartitionByRange(16, col("k"))
      .write
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.bloom.filter.expected.ndv#k", "1000")
      .parquet(path)
    val files = spark.read.parquet(path).inputFiles.toSeq
    assert(files.size == 16)
    // planted keys: every probe's file must survive (no false negatives)
    val probes = Seq(5L, 7777L, 15999L)
    val kept = FooterStats.bloomKeep(spark, files, "k", probes)
    val truth = spark.read.parquet(files: _*)
      .filter(col("k").isin(probes: _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(kept.toSet),
      s"files holding probe keys must be kept: missing ${truth -- kept.toSet}")
    // fpp 1% at the declared NDV: 3 probes should keep ~3 files, not 16
    assert(kept.size < 8, s"bloom must skip most files, kept ${kept.size}/16")
    // keys absent from the whole table: everything may be skipped
    val none = FooterStats.bloomKeep(spark, files, "k", Seq(1000000L, 2000000L))
    assert(none.size < 8, s"absent keys kept ${none.size}/16")
    // a column with no bloom filter answers "maybe" everywhere
    val noIdx = FooterStats.bloomKeep(spark, files, "nope", Seq(1L))
    assert(noIdx.size == 16)
  }
}
