package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The driver's corpus has shipped `events.ts` under different physical
  * parquet types across rounds — INT64 TIMESTAMP(NANOS) (reads as long
  * under `nanosAsLong`) through round 5, native TIMESTAMP_NTZ(micros)
  * from round 6. The round-6 regression: the streaming source hard-coded
  * the nanos schema, so the micros corpus was divided by 1000 again and
  * every event time collapsed 1000× — six stream queries went red while
  * every batch query stayed green (Tables.events already adapted).
  *
  * This spec pins the contract for BOTH loaders across all three
  * vintages: identical TIMESTAMP values out, microsecond precision
  * intact, and the stream accepts a watermark (TIMESTAMP_NTZ would be
  * rejected by EventTimeWatermark outright). */
class CorpusVintageSpec extends SparkSpec {

  // microsecond-precision instants — a scale error (×1000 either way)
  // or precision truncation shifts these visibly
  private val microsTs = Seq(
    1709296496789123L, // 2024-03-01T12:34:56.789123Z
    1709296496789124L,
    1709300096000001L, // +1h, .000001
    1709383000500000L) // next day

  private def writeVintage(name: String, tsField: StructField,
                           tsValue: Long => Any): String = {
    val dir = s"/tmp/graft_vintage_$name"
    val stage = s"$dir/_stage"
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField,
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rows = microsTs.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, tsValue(us), (i % 2).toLong, "click", i * 1.5, null)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(stage)
    // the real corpus is a single FILE named events.parquet (the stream
    // side glob-filters on that exact name) — promote the part file
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(s"$dir/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  private lazy val vintages: Map[String, String] = Map(
    "nanos" -> writeVintage("nanos", StructField("ts", LongType),
      us => us * 1000L),
    "ntz" -> writeVintage("ntz", StructField("ts", TimestampNTZType),
      us => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)),
    "tst" -> writeVintage("tst", StructField("ts", TimestampType),
      us => java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)))

  private def batchTs(dir: String): Map[Long, Long] =
    graft.Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("Tables.events normalizes every corpus vintage to the same TIMESTAMP values") {
    for ((name, dir) <- vintages) {
      val df = graft.Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"vintage $name: expected TIMESTAMP, got ${df.schema("ts").dataType}")
      val got = batchTs(dir)
      val want = microsTs.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap
      assert(got == want, s"vintage $name: ts values drifted: $got")
    }
  }

  test("normalizeTs honors its column argument regardless of the column's name") {
    import spark.implicits._
    // pre-fix, the nanos branch hard-coded the name `ts` via expr("ts div
    // 1000") — a caller passing any other column failed analysis or
    // silently resolved against a different column
    val got = Seq((7L, 1709296496789123000L)).toDF("event_id", "raw")
      .select(graft.Tables.normalizeTs(LongType, col("raw")).as("t"))
      .select(unix_micros(col("t"))).head().getLong(0)
    assert(got == 1709296496789123L)
  }

  test("eventsStream matches the batch loader and accepts a watermark on every vintage") {
    for ((name, dir) <- vintages) {
      // watermark + stateful agg: would throw EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
      // if the stream ever surfaces TIMESTAMP_NTZ again
      val agg = StreamOps.eventsStream(spark, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(col("event_id"))
        .agg(max(unix_micros(col("ts"))).as("us"))
      val got = StreamOps.runToMemory(agg, "complete")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == batchTs(dir),
        s"vintage $name: stream ts diverged from batch")
    }
  }
}
