package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Count-Min sketch aggregate: one-sided estimates, partial-merge
  * correctness, and the Column-side estimate mirroring the kernel hash
  * chain exactly. */
class SketchSpec extends SparkSpec {

  test("estimate >= exact for every key; error within e/W of stream length") {
    import spark.implicits._
    SketchFunctions.register(spark)
    // skewed stream: key k appears k times (1..100) => N = 5050, spread
    // over 8 partitions so partial buffers actually merge
    val keys = (1 to 100).flatMap(k => Seq.fill(k)(k.toLong))
    val df = keys.toDF("k").repartition(8)
    val sk = df.agg(SketchFunctions.cmsSketch(col("k")).as("sk"))
    val est = SketchFunctions.cmsEstimate(col("sk"), col("k"))
    val rows = (1 to 100).map(_.toLong).toDF("k")
      .crossJoin(broadcast(sk))
      .select(col("k"), est.as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bound = math.E * keys.size / SketchFunctions.CMS_W
    for (k <- 1 to 100) {
      assert(rows(k.toLong) >= k, s"key $k: estimate ${rows(k.toLong)} < true $k")
      assert(rows(k.toLong) - k <= bound,
        s"key $k: error ${rows(k.toLong) - k} exceeds e/W bound $bound")
    }
  }

  test("sketch is exact when the stream is collision-free at this width") {
    import spark.implicits._
    SketchFunctions.register(spark)
    // 3 distinct keys, far fewer than W=2048: with high probability no
    // row collides, and for THESE fixed keys/hashes the estimates are
    // exactly the counts — pinning that update/merge add the right cells
    val df = Seq(7L, 7L, 7L, 11L, 11L, 99L).toDF("k").repartition(3)
    val sk = df.agg(SketchFunctions.cmsSketch(col("k")).as("sk"))
    val est = SketchFunctions.cmsEstimate(col("sk"), col("k"))
    val out = Seq(7L, 11L, 99L, 12345L).toDF("k")
      .crossJoin(broadcast(sk)).select(col("k"), est.as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(7L) == 3L && out(11L) == 2L && out(99L) == 1L)
    assert(out(12345L) == 0L, "absent key must estimate 0 (no collisions)")
  }

  test("SQL registration: graft_cms callable from spark.sql") {
    SketchFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(graft_cms(id)) AS sz FROM range(100)").head().getInt(0)
    assert(n == SketchFunctions.CMS_D * SketchFunctions.CMS_W)
  }
}
