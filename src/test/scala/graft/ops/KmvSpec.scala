package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the property `rel_kmv_setops` rests on: `graft_topk` over
  * (-double(h), h) is EXACTLY bottom-k by the 60-bit hash — including
  * when distinct longs collapse onto one double (h > 2^53), where the
  * ordering must fall through to the full-precision id tiebreak — and
  * the aggregate is partitioning-invariant (mergeable partials). */
class KmvSpec extends SparkSpec {

  test("bottom-k via negated-double value with id tiebreak is exact") {
    graft.functions.TopKFunctions.register(spark)
    // adjacent 60-bit hashes: 2^59 + {0,1,2,3} are distinct longs but
    // 2^59+1 rounds to the same double as 2^59 (ulp at 2^59 is 64)
    val base = 1L << 59
    val hashes = Seq(base + 1, base, base + 70, base + 2, base + 200)
    assert((base + 1).toDouble == base.toDouble,
      "fixture must exercise double collapse")
    import spark.implicits._
    val df = hashes.toDF("h")
    val got = df.agg(transform(
        graft.functions.TopKFunctions.topkBy(-col("h").cast("double"), col("h"), 3),
        x => x.getField("id")).as("ks"))
      .head().getSeq[Long](0)
    assert(got == hashes.sorted.take(3),
      s"bottom-3 must be the 3 smallest hashes in exact order, got $got")
  }

  test("sketch is partitioning-invariant (partials merge)") {
    graft.functions.TopKFunctions.register(spark)
    import spark.implicits._
    val hashes = (1 to 500).map(i => ((i * 2654435761L) & ((1L << 60) - 1)))
    def sketch(parts: Int) =
      hashes.toDF("h").repartition(parts)
        .agg(transform(
          graft.functions.TopKFunctions.topkBy(-col("h").cast("double"), col("h"), 64),
          x => x.getField("id")).as("ks"))
        .head().getSeq[Long](0)
    assert(sketch(1) == sketch(13))
    assert(sketch(13) == hashes.sorted.take(64))
  }
}
