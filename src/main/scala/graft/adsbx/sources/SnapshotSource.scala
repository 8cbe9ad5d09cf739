package graft.adsbx.sources

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

/** DataSource V2 implementation of the reference's snapshot source (S1,
  * task.ts:118-129): the production system polls a REST endpoint on a
  * schedule and receives one JSON envelope per invocation. This source
  * models each envelope as a FILE in a directory (the zero-egress seam —
  * a fetcher daemon writes them; task.ts's `fetch` is exactly that) and
  * exposes them:
  *
  *   - BATCH_READ: every snapshot currently present, one input partition
  *     per snapshot (parallel scan);
  *   - MICRO_BATCH_READ: snapshots in filename order as streaming offsets
  *     — each trigger processes exactly the files that arrived since the
  *     last committed offset, which is the reference's scheduled-poll
  *     semantics in Structured Streaming form.
  *
  * Rows are the TRANSPORT layer — (snapshot path, raw envelope text,
  * arrival index) — deliberately not parsed here: the reference separates
  * fetch (task.ts:124-129) from schema validation (task.ts:131-134), and
  * so do we: `Pipeline.fromEnvelopeJson` applies the FAILFAST schema to
  * the `body` column downstream.
  *
  * Usage: `spark.read.format(SnapshotSource.NAME).load(dir)` or
  * `spark.readStream.format(SnapshotSource.NAME).load(dir)`.
  */
class SnapshotSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapshotSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(s"${SnapshotSource.NAME}: .load(path) is required"))
    // fail loudly on a missing/mistyped directory — a misconfigured job
    // must not "succeed" with zero rows
    if (!Files.isDirectory(Paths.get(path)))
      throw new IllegalArgumentException(
        s"${SnapshotSource.NAME}: '$path' is not a directory")
    new SnapshotTable(path)
  }
}

object SnapshotSource {
  val NAME = "graft.adsbx.sources.SnapshotSource"

  val schema: StructType = StructType(Seq(
    StructField("snapshot_path", StringType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("arrival_idx", LongType, nullable = false)))

  /** Deterministic arrival order: filename-sorted .json files. The
    * snapshot-log CONTRACT is monotonically increasing filenames (e.g.
    * zero-padded timestamps — what a fetcher daemon naturally writes);
    * streaming offsets are filename watermarks on that order. The JDK
    * stream is closed eagerly (Files.list leaks a directory handle
    * otherwise). */
  private[sources] def listSnapshots(dir: String): Seq[Path] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(f => f.getFileName.toString.endsWith(".json"))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
  }
}

private class SnapshotTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"snapshots($dir)"
  override def schema(): StructType = SnapshotSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new SnapshotScan(dir)
}

private class SnapshotScan(dir: String) extends Scan {
  override def readSchema(): StructType = SnapshotSource.schema
  override def toBatch: Batch = new SnapshotBatch(dir)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SnapshotMicroBatchStream(dir)
}

/** One input partition per snapshot file — a 100 TB snapshot archive scans
  * with full parallelism. */
private class SnapshotBatch(dir: String) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    SnapshotSource.listSnapshots(dir).zipWithIndex
      .map { case (p, i) => SnapshotPartition(p.toString, i.toLong) }
      .toArray[InputPartition]
  override def createReaderFactory(): PartitionReaderFactory =
    SnapshotReaderFactory
}

private case class SnapshotPartition(path: String, idx: Long) extends InputPartition

private object SnapshotReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val sp = partition.asInstanceOf[SnapshotPartition]
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = !consumed && { consumed = true; true }
      override def get(): InternalRow = {
        val body = new String(
          Files.readAllBytes(Paths.get(sp.path)), StandardCharsets.UTF_8)
        InternalRow(
          UTF8String.fromString(sp.path),
          UTF8String.fromString(body),
          sp.idx)
      }
      override def close(): Unit = ()
    }
  }
}

/** Offset = FILENAME WATERMARK: the greatest snapshot filename consumed so
  * far ("" before any). Each micro-batch covers files with
  * `start < name <= end` — robust where a positional index is not:
  * deleting already-consumed files shifts no indices (retention daemons
  * are safe), and a transiently empty/unavailable directory cannot rewind
  * the offset (the watermark never decreases). Late files sorting BELOW
  * the committed watermark are outside the snapshot-log contract
  * (monotonic filenames) and are skipped rather than double-processed. */
private case class SnapshotOffset(watermark: String) extends Offset {
  override def json(): String = watermark
}

private class SnapshotMicroBatchStream(dir: String) extends MicroBatchStream
    with SupportsTriggerAvailableNow {
  // one listing per trigger: latestOffset snapshots it, planInputPartitions
  // reuses it (falls back to a fresh listing after recovery, when
  // planInputPartitions can run without a prior latestOffset call)
  @volatile private var lastListing: Seq[java.nio.file.Path] = Seq.empty
  @volatile private var maxSeen: String = ""
  // arrival_idx base: cumulative count of snapshots assigned so far, so
  // indices stay MONOTONIC across micro-batches even after retention
  // deletes shrink the listing (a listing-local index would collide);
  // resets per driver run — cross-restart recency ordering needs
  // name-encoded ordering, which the filename watermark already gives the
  // offsets themselves
  @volatile private var assignedBase: Long = 0L

  override def initialOffset(): Offset = SnapshotOffset("")
  override def latestOffset(): Offset = {
    lastListing = SnapshotSource.listSnapshots(dir)
    if (lastListing.nonEmpty) {
      val m = lastListing.last.getFileName.toString
      if (m > maxSeen) maxSeen = m
    }
    SnapshotOffset(maxSeen)
  }
  override def deserializeOffset(json: String): Offset = {
    val w = SnapshotOffset(json)
    if (json > maxSeen) maxSeen = json
    w
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // Trigger.AvailableNow (the reference's one-shot scheduled invocation,
  // task.ts:98): freeze the target watermark at query start; files landing
  // after prepare are left for the next scheduled run instead of extending
  // this one indefinitely.
  @volatile private var availableNowCap: String = null
  override def prepareForTriggerAvailableNow(): Unit = {
    latestOffset()
    availableNowCap = maxSeen
  }
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val live = latestOffset().asInstanceOf[SnapshotOffset]
    if (availableNowCap == null) live
    else SnapshotOffset(
      if (live.watermark < availableNowCap) live.watermark else availableNowCap)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotOffset].watermark
    val e = end.asInstanceOf[SnapshotOffset].watermark
    val listing =
      if (lastListing.nonEmpty) lastListing else SnapshotSource.listSnapshots(dir)
    val files = listing.filter { p =>
      val n = p.getFileName.toString
      n > s && n <= e
    }
    val base = assignedBase
    assignedBase = base + files.size
    files.zipWithIndex
      .map { case (p, i) => SnapshotPartition(p.toString, base + i) }
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    SnapshotReaderFactory
}
