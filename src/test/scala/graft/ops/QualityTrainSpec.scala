package graft.ops

import graft.SparkSpec

/** Pins text_quality_train's LEARNING, not just its determinism (the
  * oracle hash already pins exact values): over the replayed gradient
  * steps the class-mean separation gap must strictly grow and threshold
  * accuracy must end above where it started — a training run that stops
  * separating the classes fails here even if it is perfectly
  * reproducible. */
class QualityTrainSpec extends SparkSpec {

  private lazy val curve = {
    val rows = TrainOps.ridgeTrainCurve(spark, "/root/testdata/sf0.001")
      .orderBy("step").collect()
    rows.map(r => (r.getLong(0), r.getDouble(5), r.getDouble(6)))
  }

  test("separation gap strictly increases across every gradient step") {
    assert(curve.length == 5) // steps 0..4
    curve.sliding(2).foreach { case Array((k0, g0, _), (k1, g1, _)) =>
      assert(g1 > g0,
        s"sep_gap did not improve from step $k0 ($g0) to step $k1 ($g1)")
    }
  }

  test("training starts from the zero model and ends more accurate") {
    val (_, gap0, acc0) = curve.head
    val (_, gapN, accN) = curve.last
    assert(gap0 == 0.0) // w0 = 0, bias0 = 0: no separation yet
    assert(gapN > 0.0 && accN > acc0,
      s"final model (gap=$gapN, acc=$accN) should beat the zero model " +
        s"(gap=$gap0, acc=$acc0)")
  }

  test("ridgeTrain: a stage hook that breaks doc clustering falls back " +
      "to the safe pivot and trains identically (advisor item)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val label = col("doc_id") % 2 === 0
    def run(stage: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      TrainOps.ridgeTrain(docs, "doc_id", "text", label, steps = 2, stage = stage)
        .orderBy("step").collect().toSeq
    val base = run(_.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // repartition(7) preserves rows but destroys the doc-clustered,
    // doc-sorted layout the sorted-run pivot rides — the runtime check
    // must detect it and fall back, yielding a bit-identical curve
    val broken = run(df => df.repartition(7).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    assert(base == broken)
  }
}
