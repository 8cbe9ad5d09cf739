package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pigeonhole completeness of the production-width SimHash pair index:
  * the 3×21-bit chunk join must find EXACTLY the pairs a brute-force
  * all-pairs Hamming join finds (any pair within distance 2 shares at
  * least one exact chunk). The brute force is test-scale only — the
  * operator itself never pairs outside chunk buckets. */
class Simhash64Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("63-bit fingerprints are positive longs") {
    val fp = DedupOps.simhash64(spark, dir)
    assert(fp.agg(min(col("sh"))).head().getLong(0) >= 0L)
    assert(fp.count() == 500)
  }

  test("chunk-index pairs == brute-force all-pairs Hamming <= 2") {
    val fp = DedupOps.simhash64(spark, dir).cache()
    try {
      val brute = fp.as("a")
        .join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("hamming"))
        .filter(col("hamming") <= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val indexed = graft.SparkEntry.queries("dedup_simhash64_pairs")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(indexed == brute)
    } finally fp.unpersist()
  }
}
