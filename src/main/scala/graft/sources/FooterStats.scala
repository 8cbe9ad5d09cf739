package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.{BinaryStatistics, DoubleStatistics, LongStatistics, Statistics}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Metadata-only table statistics read from parquet FOOTERS.
  *
  * Every parquet file already carries per-row-group min/max/row-count
  * statistics (and, when enabled at write, split-block bloom filters) in
  * its footer. The table-format operators (src_manifest_pruned,
  * src_versioned_prune, src_optimize, src_bloom_skipping,
  * src_typed_prune) need exactly those numbers to build their pruning
  * manifests — re-deriving them with a `groupBy(input_file_name)` scan
  * reads EVERY ROW of the table, which is linear in data and was the
  * dominant super-linear term in the sf1 scale rehearsal. Reading footers
  * instead is O(files) metadata: at 100 TB ≈ 100k files that is ~100k
  * footer reads fanned out across the cluster (each a few KiB), vs a
  * full table scan. This is precisely how real formats backfill stats
  * (Iceberg's table migration, Delta's CONVERT TO DELTA): the write
  * already paid for the statistics; the manifest builder only collects
  * them.
  *
  * All helpers return executor-computed results: the file list fans out
  * as a dataset, each task opens only footers (never row data) through
  * the SESSION'S Hadoop configuration (serialized into the closure —
  * credentials and custom fs impls reach the tasks; a default
  * `new Configuration()` built executor-side would silently drop both on
  * a real cluster), and the driver receives metadata-sized rows (one per
  * file). Timestamp columns must be written as TIMESTAMP_MICROS (INT64) —
  * the sessions set `spark.sql.parquet.outputTimestampType` accordingly;
  * the deprecated INT96 default carries no footer statistics at all. */
object FooterStats {

  /** Hadoop `Configuration` is not java-serializable; this carrier ships
    * a copy of the session's configuration into the footer-reading tasks
    * via Hadoop's own Writable form (the same pattern Spark uses
    * internally for its file-source tasks). */
  private class SerializableHadoopConf(@transient private var c: Configuration)
      extends Serializable {
    def conf: Configuration = c
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      c.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      c = new Configuration(false)
      c.readFields(in)
    }
  }

  private def sessionConf(s: SparkSession): SerializableHadoopConf =
    // copy: the session's Configuration is mutable and may change after
    // the closure is captured
    new SerializableHadoopConf(
      new Configuration(s.sparkContext.hadoopConfiguration))

  /** Per-file footer statistics for INT64-physical columns (longs,
    * TIMESTAMP_MICROS): one row per file, with `n_rows` and a
    * `<col>_lo`/`<col>_hi` pair per requested column. A file where any
    * row group lacks statistics for a column reports NULL bounds for it —
    * callers must treat NULL as "may overlap anything" (keep the file),
    * which preserves the no-false-negative pruning contract. */
  def longMinMax(s: SparkSession, files: Seq[String],
                 cols: Seq[String]): DataFrame =
    typedMinMax[Long](s, files, cols, LongType, {
      case st: LongStatistics if !st.isEmpty && st.hasNonNullValue =>
        (st.genericGetMin.longValue(), st.genericGetMax.longValue())
    })

  /** Per-file footer statistics for BINARY columns read as UTF-8 strings
    * (parquet string min/max). Bounds combine across row groups with Java
    * String ordering, which matches parquet's unsigned-byte UTF8
    * comparator for ASCII data (the key shapes pruned on — padded ids,
    * status codes); same NULL-bounds = keep-the-file contract. */
  def binaryMinMax(s: SparkSession, files: Seq[String],
                   cols: Seq[String]): DataFrame =
    typedMinMax[String](s, files, cols, StringType, {
      case st: BinaryStatistics if !st.isEmpty && st.hasNonNullValue =>
        (st.genericGetMin.toStringUsingUTF8, st.genericGetMax.toStringUsingUTF8)
    })

  /** Per-file footer statistics for DOUBLE columns. Writers omit or blank
    * statistics for NaN-bearing pages, which lands in the same
    * missing-stats branch as everything else: NULL bounds, keep the
    * file. */
  def doubleMinMax(s: SparkSession, files: Seq[String],
                   cols: Seq[String]): DataFrame =
    typedMinMax[Double](s, files, cols, DoubleType, {
      case st: DoubleStatistics if !st.isEmpty && st.hasNonNullValue =>
        (st.genericGetMin.doubleValue(), st.genericGetMax.doubleValue())
    })

  /** Shared fold: one row per file, `n_rows` plus lo/hi per requested
    * column of the helper's physical type; None the moment one row group
    * is missing statistics for a column (stats-less writer, all-null
    * page, a different physical type than the helper reads). */
  private def typedMinMax[T](s: SparkSession, files: Seq[String],
      cols: Seq[String], dt: DataType,
      extract: PartialFunction[Statistics[_], (T, T)])(
      implicit ord: Ordering[T]): DataFrame = {
    val schema = StructType(
      StructField("file", StringType, nullable = false) +:
        StructField("n_rows", LongType, nullable = false) +:
        cols.flatMap(c => Seq(StructField(s"${c}_lo", dt),
          StructField(s"${c}_hi", dt))))
    val colList = cols // avoid closing over the method frame
    val hconf = sessionConf(s)
    val lifted = extract.lift
    val rows = fanOut(s, files).map { f =>
      withFooter(f, hconf.conf) { reader =>
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val nRows = blocks.map(_.getRowCount).sum
        val bounds = colList.flatMap { c =>
          val perGroup = blocks.map { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == c)
              .map(_.getStatistics).flatMap(lifted)
          }
          if (perGroup.exists(_.isEmpty) || perGroup.isEmpty)
            Seq[Any](null, null)
          else Seq[Any](perGroup.flatten.map(_._1).min,
            perGroup.flatten.map(_._2).max)
        }
        Row.fromSeq(f +: nRows +: bounds)
      }
    }
    s.createDataFrame(rows, schema)
  }

  /** Total row count of a parquet path from footers only. */
  def rowCount(s: SparkSession, files: Seq[String]): Long = {
    val hconf = sessionConf(s)
    fanOut(s, files).map { f =>
      withFooter(f, hconf.conf)(
        _.getFooter.getBlocks.asScala.map(_.getRowCount).sum)
    }.collect().sum
  }

  /** Files whose footer BLOOM FILTERS might contain any of the probe
    * keys on `column` — the consult side of a bloom file-skipping index.
    * The filters are written by parquet itself
    * (`parquet.bloom.filter.enabled#<col>` write option), so the index
    * costs nothing beyond the write. A file is kept when ANY row group
    * answers "maybe" for ANY probe; a row group without a bloom filter
    * answers "maybe" unconditionally (no false negatives). */
  def bloomKeep(s: SparkSession, files: Seq[String], column: String,
                probes: Seq[Long]): Seq[String] = {
    val ps = probes.toArray
    val hconf = sessionConf(s)
    fanOut(s, files).map { f =>
      val keep = withFooter(f, hconf.conf) { reader =>
        reader.getFooter.getBlocks.asScala.exists { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == column) match {
            case None => true
            case Some(cc) =>
              val bf = reader.getBloomFilterDataReader(b).readBloomFilter(cc)
              if (bf == null) true
              else ps.exists(k => bf.findHash(bf.hash(k)))
          }
        }
      }
      (f, keep)
    }.collect().collect { case (f, true) => f }.toSeq
  }

  /** Fan the file list out as a metadata-sized RDD: one footer open per
    * element, parallelism capped so tiny lists don't schedule empty
    * tasks. */
  private def fanOut(s: SparkSession, files: Seq[String]) =
    s.sparkContext.parallelize(files,
      math.max(1, math.min(files.size, s.sparkContext.defaultParallelism)))

  private def withFooter[A](file: String, conf: Configuration)(
      f: ParquetFileReader => A): A = {
    val in = HadoopInputFile.fromPath(new Path(file), conf)
    val reader = ParquetFileReader.open(in)
    try f(reader) finally reader.close()
  }
}
