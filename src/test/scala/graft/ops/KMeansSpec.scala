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
}
