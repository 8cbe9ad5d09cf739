package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bloom filter aggregate: the no-false-negative guarantee, the
  * false-positive rate staying near theory, and the Column-side probe
  * mirroring the kernel's XXH64 chain bit-for-bit (both against the
  * driver-side `mightContain` used for file pruning). */
class BloomSpec extends SparkSpec {

  test("no false negatives: every inserted key probes positive (Column + driver)") {
    import spark.implicits._
    BloomFunctions.register(spark)
    // 1000 keys over 8 partitions so partial bitmaps actually OR-merge
    val keys = (0L until 1000L).map(_ * 7919L + 13L)
    val sk = keys.toDF("k").repartition(8)
      .agg(BloomFunctions.bloomSketch(col("k")).as("bloom"))
    val colHits = keys.toDF("k").crossJoin(broadcast(sk))
      .filter(BloomFunctions.bloomMightContain(col("bloom"), col("k")))
      .count()
    assert(colHits == keys.size, s"Column probe lost ${keys.size - colHits} inserted keys")
    val words = sk.head().getSeq[Long](0).toArray
    assert(keys.forall(BloomFunctions.mightContain(words, _)),
      "driver probe lost an inserted key")
  }

  test("false-positive rate near theory; Column and driver probes agree bit-for-bit") {
    import spark.implicits._
    BloomFunctions.register(spark)
    val inserted = (0L until 1000L).map(_ * 2L) // evens
    val sk = inserted.toDF("k").repartition(4)
      .agg(BloomFunctions.bloomSketch(col("k")).as("bloom"))
    val words = sk.head().getSeq[Long](0).toArray
    val absent = (0L until 10000L).map(_ * 2L + 1L) // odds — none inserted
    val colPositives = absent.toDF("k").crossJoin(broadcast(sk))
      .filter(BloomFunctions.bloomMightContain(col("bloom"), col("k")))
      .collect().map(_.getLong(0)).toSet
    val driverPositives = absent.filter(BloomFunctions.mightContain(words, _)).toSet
    assert(colPositives == driverPositives,
      "SQL probe and driver probe must be the same hash chain")
    // n=1000, M=32768, K=6 → fpp ≈ (1 − e^{−6000/32768})^6 ≈ 3.3e-5;
    // allow 10× slack over 10k probes (expected ~0.3 false positives)
    assert(colPositives.size <= 30,
      s"${colPositives.size} false positives in 10000 — far above theory")
  }

  test("prefilter reduction: bitmap probe shrinks the probe side, exact join unchanged") {
    import spark.implicits._
    BloomFunctions.register(spark)
    val build = (0L until 200L).map(_ * 31L).toDF("k")
    val probe = (0L until 20000L).toDF("pk").repartition(8)
    val sk = build.agg(BloomFunctions.bloomSketch(col("k")).as("bloom"))
    val pre = probe.crossJoin(broadcast(sk))
      .filter(BloomFunctions.bloomMightContain(col("bloom"), col("pk")))
      .drop("bloom")
    val preCount = pre.count()
    val viaBloom = pre.join(build, pre("pk") === build("k"), "left_semi").count()
    val plain = probe.join(build, probe("pk") === build("k"), "left_semi").count()
    assert(viaBloom == plain, "bloom prefilter changed the exact join result")
    assert(preCount >= plain, "prefilter dropped a true match (false negative)")
    // n=200 keys in a 32768-bit/K=6 bloom → fpp ~1e-9; the prefilter
    // should pass essentially only the 200 true matches out of 20000
    assert(preCount < 400,
      s"prefilter kept $preCount of 20000 — no real reduction before the join")
  }

  test("SQL registration: graft_bloom callable from spark.sql") {
    BloomFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(graft_bloom(id)) AS sz FROM range(100)").head().getInt(0)
    assert(n == BloomFunctions.BLOOM_WORDS)
  }
}
