package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based completeness of the round-3 generic operators: random
  * inputs (fixed seeds — reproducible) against brute-force references
  * computed in plain Scala, independent of any Spark plan. */
class GeoPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("proximityPairs == brute force on random clustered point clouds") {
    import spark.implicits._
    val cloud: Gen[List[(Double, Double)]] = Gen.listOfN(300, for {
      cx <- Gen.chooseNum(-170, 170) // cluster corner
      cy <- Gen.chooseNum(-80, 80)
      jx <- Gen.chooseNum(0.0, 2.0)  // spill across cell borders
      jy <- Gen.chooseNum(0.0, 2.0)
    } yield (cy + jy, cx + jx))
    for (seed <- 1L to 3L) {
      val pts = sample(cloud, seed).zipWithIndex
        .map { case ((la, lo), i) => (i.toLong, la, lo) }
      val t = 0.05
      val expected = (for {
        (i, la1, lo1) <- pts; (j, la2, lo2) <- pts
        if i < j
        d2 = (la1 - la2) * (la1 - la2) + (lo1 - lo2) * (lo1 - lo2)
        if d2 < t * t
      } yield (i, j)).toSet
      val got = GeoOps.proximityPairs(
          pts.toDF("id", "la", "lo"), col("id"), col("la"), col("lo"), t)
        .select("e1", "e2").as[(Long, Long)].collect().toSet
      assert(got == expected, s"seed=$seed: ${got.size} vs ${expected.size}")
    }
  }

  test("cdcApply == sequential fold on random change feeds") {
    import spark.implicits._
    val feed: Gen[List[(Long, String, Double, Long)]] = Gen.listOfN(200, for {
      k <- Gen.chooseNum(0L, 20L)
      op <- Gen.oneOf("I", "U", "D")
      attr <- Gen.chooseNum(0.0, 100.0)
    } yield (k, op, attr, 0L))
    for (seed <- 1L to 3L) {
      // unique, shuffled versions: apply order is the version order,
      // not list order
      val rows = sample(feed, seed).zipWithIndex
        .map { case ((k, op, a, _), i) => (k, op, a, i.toLong) }
      val expected = rows.groupBy(_._1).flatMap { case (k, ch) =>
        val last = ch.maxBy(_._4)
        if (last._2 == "D") None else Some((k, last._2, last._3))
      }.toSet
      val got = rows.toDF("k", "op", "attr", "v")
        .cdcApplyDf().as[(Long, String, Double)].collect().toSet
      assert(got == expected, s"seed=$seed")
    }
  }

  private implicit class CdcShim(df: org.apache.spark.sql.DataFrame) {
    def cdcApplyDf(): org.apache.spark.sql.DataFrame =
      HistoryOps.cdcApply(df, "k", "op", Seq("attr"), Seq("v"))
  }
}
