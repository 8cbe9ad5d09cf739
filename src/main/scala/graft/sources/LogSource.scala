package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.CommitLog

/** The commit-log table as a STREAMING SOURCE — the read-side symmetric of
  * the versioned streaming sinks (`stream_txn_sink`, `stream_versioned_sink`
  * publish versions; this subscribes to them). Offsets ARE commit versions:
  * each micro-batch covers the payload of versions `(start, end]`, so a
  * subscriber consumes exactly the commits that landed since its last
  * checkpoint — the "table as a stream" semantic production lakehouse
  * formats expose (Delta's startingVersion reader, described here from the
  * OCC protocol's first principles).
  *
  * Contract: a streamed table is APPEND-ONLY — each commit's payload is
  * that version's delta (the txn-sink pattern). Snapshot-per-version tables
  * subscribe to the change feed instead (`stream_change_feed`), which diffs
  * versions into deltas first.
  *
  * Rows are the TRANSPORT layer, like `SnapshotSource`: (version, chunk
  * file, JSONL line); schema application is downstream `from_json` —
  * schema-on-read against the schema the LOG versions (src_schema_log),
  * not this source. Planning is metadata-only through the checkpointed log
  * (`CommitLog.entries` = hint + checkpoint + tail reads, never a payload
  * scan), and each chunk FILE is one input partition, so a subscriber over
  * a 1000-file backlog scans with full parallelism.
  *
  * Scale posture: offsets never rewind (a vacuumed history cannot shift
  * them — versions are absolute, not positional); per-trigger admission is
  * bounded by `maxVersionsPerTrigger`, so a subscriber recovering a long
  * backlog processes it as bounded micro-batches instead of one
  * unbounded batch.
  */
class LogSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LogSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(s"${LogSource.NAME}: .load(tablePath) is required"))
    // a commit-log table MUST have a log — failing loudly beats a
    // misconfigured subscriber "succeeding" on zero commits forever
    if (!Files.isDirectory(Paths.get(path, "_commits")))
      throw new IllegalArgumentException(
        s"${LogSource.NAME}: '$path' has no _commits log")
    val maxV = Option(properties.get("maxVersionsPerTrigger")).map(_.toLong)
    val fromV = Option(properties.get("startingVersion")).map(_.toLong)
    val toV = Option(properties.get("endingVersion")).map(_.toLong)
    new LogTable(path, maxV, fromV, toV)
  }
}

object LogSource {
  val NAME = "graft.sources.LogSource"

  val schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false),
    StructField("line", StringType, nullable = false)))

  /** Data files of one payload dir: non-hidden, no Spark markers. */
  private[sources] def listChunkFiles(dir: String): Seq[Path] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter { f =>
          val n = f.getFileName.toString
          !n.startsWith("_") && !n.startsWith(".")
        }
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
  }

  /** One partition per chunk file of every version in (from, to]. */
  private[sources] def planVersions(tablePath: String, from: Long,
      to: Long): Array[InputPartition] =
    CommitLog.entries(tablePath)
      .filter(c => c.version > from && c.version <= to)
      .flatMap(c => CommitLog.payloadDirs(c.dataDir)
        .flatMap(d => listChunkFiles(d))
        .map(f => LogChunkPartition(c.version, f.toString)))
      .toArray[InputPartition]
}

private class LogTable(path: String, maxV: Option[Long],
    fromV: Option[Long], toV: Option[Long]) extends Table with SupportsRead {
  override def name(): String = s"commitlog($path)"
  override def schema(): StructType = LogSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LogScan(path, maxV, fromV, toV)
}

private class LogScan(path: String, maxV: Option[Long],
    fromV: Option[Long], toV: Option[Long]) extends Scan {
  override def readSchema(): StructType = LogSource.schema
  override def toBatch: Batch = new LogBatch(path, fromV, toV)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LogMicroBatchStream(path, maxV)
}

/** Batch read: the payload of versions `[startingVersion, endingVersion]`
  * (both INCLUSIVE, Delta's reader semantics) — defaults to 1..latest,
  * i.e. the whole table. A bounded range is "give me the changes between
  * two versions, as a batch": the incremental-consumption shape without
  * standing up a stream. */
private class LogBatch(path: String, fromV: Option[Long],
    toV: Option[Long]) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val latest = CommitLog.latest(path).map(_.version).getOrElse(0L)
    LogSource.planVersions(path,
      fromV.map(_ - 1L).getOrElse(0L),
      toV.map(math.min(_, latest)).getOrElse(latest))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    LogChunkReaderFactory
}

private case class LogChunkPartition(version: Long, file: String)
    extends InputPartition

private object LogChunkReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LogChunkPartition]
    new PartitionReader[InternalRow] {
      // Stream line-by-line: one line resident per next()/get() cycle, so
      // per-task memory is O(1) in chunk size — a materialized
      // readAllLines would scale with the chunk at odds with the source's
      // 100 TB posture.
      private var reader: java.io.BufferedReader = _
      private var current: String = _
      override def next(): Boolean = {
        if (reader == null)
          reader = Files.newBufferedReader(Paths.get(p.file), StandardCharsets.UTF_8)
        current = reader.readLine()
        current != null
      }
      override def get(): InternalRow = InternalRow(
        p.version, UTF8String.fromString(p.file), UTF8String.fromString(current))
      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}

/** Offset = committed VERSION (0 before any). Versions are assigned by the
  * log's CAS, so the offset is total-ordered, gap-free, and absolute —
  * vacuuming consumed history shifts nothing, and a transiently
  * unreadable log cannot rewind it. */
private case class LogOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private class LogMicroBatchStream(path: String, maxVersionsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  @volatile private var maxSeen: Long = 0L

  override def initialOffset(): Offset = LogOffset(0L)
  override def latestOffset(): Offset = {
    val v = CommitLog.latest(path).map(_.version).getOrElse(0L)
    if (v > maxSeen) maxSeen = v
    LogOffset(maxSeen)
  }
  override def deserializeOffset(json: String): Offset = {
    val v = json.toLong
    if (v > maxSeen) maxSeen = v
    LogOffset(v)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // AvailableNow = drain the backlog THAT EXISTED AT QUERY START as
  // bounded micro-batches, then stop; commits landing mid-run wait for
  // the next scheduled invocation.
  @volatile private var availableNowCap: Long = -1L
  override def prepareForTriggerAvailableNow(): Unit = {
    latestOffset()
    availableNowCap = maxSeen
  }
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LogOffset].version
    val live = latestOffset().asInstanceOf[LogOffset].version
    val capped = if (availableNowCap >= 0) math.min(live, availableNowCap) else live
    LogOffset(maxVersionsPerTrigger match {
      case Some(m) => math.min(capped, s + m)
      case None => capped
    })
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    LogSource.planVersions(path,
      start.asInstanceOf[LogOffset].version,
      end.asInstanceOf[LogOffset].version)
  override def createReaderFactory(): PartitionReaderFactory =
    LogChunkReaderFactory
}
