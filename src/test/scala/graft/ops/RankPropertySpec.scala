package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based pin for the FUSED rank substrate
  * (Relational2.globalGroupedRank): random (group, value) data with
  * duplicate values (unique tiebreak ids), skewed group sizes, and nulls
  * in the group key, against a brute-force plain-Scala reference —
  * independent of any Spark plan, across shuffle-partition counts. The
  * substrate feeds rel_ks_drift and any future both-CDFs consumer; a
  * boundary-arithmetic slip here is the round-4 globalRank regression
  * class, which only value-level randomized checks caught. */
class RankPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("globalGroupedRank == brute force on random skewed grouped data") {
    import spark.implicits._
    // values collide on purpose (small domain); ids are the total order
    val rows: Gen[List[(Option[String], Long)]] = Gen.listOfN(2000, for {
      g <- Gen.frequency(6 -> Gen.const(Some("hot")),
        3 -> Gen.oneOf("a", "b", "c").map(Some(_)),
        1 -> Gen.const(None))
      v <- Gen.chooseNum(0L, 50L)
    } yield (g, v))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try for (seed <- 1L to 3L; parts <- Seq("1", "5", "32")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val data = sample(rows, seed).zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
      val df = data.toDF("g", "v", "id").repartition(7)
      val got = Relational2.globalGroupedRank(df, "g", col("v"), col("id"))
        .collect()
        .map(r => r.getLong(2) ->
          (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        .toMap // id -> (__rank, __n, __grank, __gn)
      // brute force: sort by (v, id); global rank = position; in-group
      // rank = position within the group's subsequence
      val sorted = data.sortBy(t => (t._2, t._3))
      val n = sorted.size.toLong
      val gSizes = data.groupBy(_._1).map { case (k, vs) => k -> vs.size.toLong }
      val gSeen = scala.collection.mutable.Map.empty[Option[String], Long]
      val expected = sorted.zipWithIndex.map { case ((g, _, id), pos) =>
        val gr = gSeen.getOrElse(g, 0L) + 1L
        gSeen(g) = gr
        id -> (pos + 1L, n, gr, gSizes(g))
      }.toMap
      assert(got == expected,
        s"seed=$seed parts=$parts: fused ranks diverge from brute force")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
