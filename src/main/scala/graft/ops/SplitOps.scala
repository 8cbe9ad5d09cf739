package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — train/val/test assignment must be a
  * pure function of the record key (NOT `rand()` or `randomSplit`):
  * reproducible across runs, cluster sizes, and engines; stable when the
  * corpus is re-partitioned or incrementally extended (a doc's split never
  * changes when other docs are added).
  *
  * The bucket is derived from md5 of the key so both engines agree:
  * a 2-char mix of the first hex digits → 0..99. 90/5/5 split.
  */
object SplitOps {

  /** Uniform bucket 0..99, identical in Spark and DuckDB: the first 4 md5
    * hex digits as a 16-bit value, mod 100. Residual bias is 65536 % 100 =
    * 36 buckets seeing one extra value in 655 (~0.15%) — negligible, unlike
    * an ascii-code mix, whose 256 reachable combinations make the split
    * deterministically lumpy (a 90/5/5 target lands at 90.2/5.5/4.3).
    *
    * ONE md5 + one hex-parse per row (Spark `conv`, DuckDB '0x' cast) —
    * the earlier per-digit instr arithmetic referenced the md5 column four
    * times, and CollapseProject re-evaluates it per reference. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("long") % 100

  def hashBucketSql(keyExpr: String): String =
    s"(CAST('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 4) AS UBIGINT) % 100)"

  /** Split label for a key: train (<90), val (<95), test. */
  def splitLabel(key: Column): Column = {
    val b = hashBucket(key)
    when(b < 90, "train").when(b < 95, "val").otherwise("test")
  }

  def splitLabelSql(keyExpr: String): String = {
    val b = hashBucketSql(keyExpr)
    s"CASE WHEN $b < 90 THEN 'train' WHEN $b < 95 THEN 'val' ELSE 'test' END"
  }

  /** Split sizes per (split, lang) — the sanity report a pipeline checks
    * before training. */
  private def splitQ(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "documents")
      .withColumn("split", splitLabel(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"), col("lang"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_split_assign" -> splitQ,
  )

  val oracles: Map[String, String] = Map(
    "text_split_assign" ->
      s"""SELECT ${splitLabelSql("doc_id")} AS split, lang, COUNT(*) AS n,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
  )
}
