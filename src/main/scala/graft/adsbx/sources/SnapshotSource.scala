package graft.adsbx.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
    new SnapshotTable(path)
  }
}

object SnapshotSource {
  val NAME = "graft.adsbx.sources.SnapshotSource"

  val schema: StructType = StructType(Seq(
    StructField("snapshot_path", StringType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("arrival_idx", LongType, nullable = false)))

  /** Deterministic arrival order: filename-sorted .json files. */
  private[sources] def listSnapshots(dir: String): Seq[Path] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else Files.list(p).iterator().asScala
      .filter(f => f.getFileName.toString.endsWith(".json"))
      .toSeq.sortBy(_.getFileName.toString)
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

/** Offset = count of snapshots consumed so far (filename order is the
  * arrival order contract). Each micro-batch covers [start, end) of the
  * sorted listing — the scheduled-poll model: a trigger fires, everything
  * that arrived since the last commit is one batch. */
private case class SnapshotOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private class SnapshotMicroBatchStream(dir: String) extends MicroBatchStream {
  override def initialOffset(): Offset = SnapshotOffset(0L)
  override def latestOffset(): Offset =
    SnapshotOffset(SnapshotSource.listSnapshots(dir).size.toLong)
  override def deserializeOffset(json: String): Offset =
    SnapshotOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotOffset].n.toInt
    val e = end.asInstanceOf[SnapshotOffset].n.toInt
    SnapshotSource.listSnapshots(dir).slice(s, e).zipWithIndex
      .map { case (p, i) => SnapshotPartition(p.toString, (s + i).toLong) }
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    SnapshotReaderFactory
}
