package graft.ops

import graft.SparkSpec

/** sim_kmeans_train: Lloyd-iteration contract over the embeddings corpus. */
class KMeansSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val result =
    Similarity.queries("sim_kmeans_train")(spark, sf).collect()

  test("every vector is assigned to exactly one trained cell") {
    val corpus = graft.Tables(spark, sf, "embeddings").count()
    assert(result.map(_.getAs[Long]("n")).sum == corpus)
  }

  test("training does not increase the k-means objective") {
    // inertia of the TRAINED quantizer must be <= inertia of the INIT
    // quantizer (label centroids): each Lloyd step minimizes the
    // objective; rounding noise is bounded by 1e-6 per summand
    import org.apache.spark.sql.functions._
    val e = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val initInertia = e
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "val")))
      .groupBy(col("label"), col("dim"))
      .agg((sum(col("val").cast(Exact.dec)).cast("double") / count(lit(1))).as("c"),
        sum(col("val").cast(Exact.dec)).as("sv"),
        sum((col("val") * col("val")).cast(Exact.dec)).as("svv"),
        count(lit(1)).as("cnt"))
      // sum over members of (val - c)^2 = svv - 2*c*sv + cnt*c^2, per dim
      .select((col("svv").cast("double") - lit(2.0) * col("c") * col("sv").cast("double")
        + col("cnt") * col("c") * col("c")).as("contrib"))
      .agg(sum(col("contrib"))).head().getDouble(0)
    val trained = result.map(_.getAs[Double]("inertia")).sum
    val n = e.count()
    assert(trained <= initInertia + 1e-6 * n * 2,
      s"trained inertia $trained must not exceed init inertia $initInertia")
  }

  test("the trained quantizer is partitioning-independent") {
    val again = Similarity.queries("sim_kmeans_train")(spark, sf).collect()
    assert(result.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("silhouetteFrom: tight well-separated clusters score near 1; a " +
      "point equidistant to both centroids scores 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two tight clusters around (0,0) and (10,10): a ≈ 0.1, b ≈ 14 ->
    // s = (b-a)/b ≈ 0.99
    val e = Seq(
      (0L, Seq(0.1, 0.0)), (1L, Seq(-0.1, 0.0)),
      (2L, Seq(10.1, 10.0)), (3L, Seq(9.9, 10.0)),
      // vec 4 sits exactly between the centroids: a = b -> s = 0
      (4L, Seq(5.0, 5.0)))
      .toDF("vec_id", "v")
    val cent = Seq((0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 10.0)))
      .toDF("cid", "cv")
    val got = Similarity.silhouetteFrom(e, cent).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_silhouette"))).toMap
    // vec 4 ties -> smaller cid wins the assignment (cluster 0, n = 3)
    assert(got(0L)._1 == 3L && got(1L)._1 == 2L)
    assert(got(1L)._2 > 0.98, s"tight clusters must score near 1: $got")
    // cluster 0's mean carries the equidistant point's exact 0
    val mean0 = got(0L)._2
    assert(mean0 > 0.6 && mean0 < 0.67, s"(0.99+0.99+0)/3 expected: $mean0")
  }

  test("sim_silhouette: corpus query is internally consistent") {
    val sil = Similarity.queries("sim_silhouette")(spark, sf).collect()
    val corpus = graft.Tables(spark, sf, "embeddings").count()
    assert(sil.map(_.getAs[Long]("n")).sum == corpus)
    sil.foreach { r =>
      val m = r.getAs[Double]("mean_silhouette")
      assert(m >= -1.0 && m <= 1.0)
    }
  }
}
