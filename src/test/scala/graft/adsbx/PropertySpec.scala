package graft.adsbx

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based invariants of the CoT pipeline (SURVEY §5.2 item 4):
  * random `ADSBResponse` batches through the full pipeline must satisfy the
  * reference's structural guarantees regardless of input. */
class PropertySpec extends SparkSpec {

  import Fixtures.Ac

  private val strOpt: Gen[Option[String]] = Gen.oneOf(
    Gen.const(None), Gen.const(Some("")), Gen.const(Some("  ")),
    Gen.alphaNumStr.map(s => Some(s.take(8))),
    Gen.const(Some(" N9 9z ")))
  private val numOpt: Gen[Option[Double]] = Gen.oneOf(
    Gen.const(None), Gen.const(Some(0.0)),
    Gen.choose(-500.0, 45000.0).map(Some(_)))
  private val catOpt: Gen[Option[String]] = Gen.oneOf(
    Gen.const(None),
    Gen.oneOf("A0", "A1", "A6", "A7", "B2", "C1", "ZZ").map(Some(_)))

  private val acGen: Gen[Ac] = for {
    flight <- strOpt; r <- strOpt; t <- strOpt
    dbFlags <- Gen.oneOf(None, Some(0.0), Some(1.0), Some(2.0), Some(7.0))
    altGeom <- numOpt; gs <- numOpt; track <- numOpt
    emergency <- Gen.oneOf(None, Some("none"), Some("squawk7700"))
    category <- catOpt
    lat <- Gen.choose(-89.0, 89.0); lon <- Gen.choose(-179.0, 179.0)
  } yield Ac(0L, "hex", "adsb_icao", None, flight, r, t, dbFlags, None,
    altGeom, gs, track, None, None, emergency, category, None, None, None,
    lat, lon, 0.5, 1.0, None)

  private def batch(n: Int, seed: Long): Seq[Ac] = {
    val g = Gen.listOfN(n, acGen)
    g(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      .zipWithIndex.map { case (a, i) => a.copy(seq = i.toLong) }
  }

  test("pipeline invariants hold on random batches") {
    import spark.implicits._
    for (seed <- Seq(1L, 42L, 1337L)) {
      val in = batch(120, seed)
      val df = in.toDF()
      val out = Pipeline.features(df, Fixtures.includesDf(spark),
        AdsbxConfig(includesFiltering = false)).cache()

      // D1/D2: output ids unique
      val n = out.count()
      assert(out.select("id").distinct().count() == n, s"dup ids (seed=$seed)")

      // every output id ∈ input coalesced ids (P1-P3)
      val inIds = in.flatMap(a =>
        a.r.filter(_.nonEmpty).orElse(a.flight).map(_.toLowerCase.trim))
        .filter(_.nonEmpty).toSet
      val outIds = out.select("id").collect().map(_.getString(0)).toSet
      assert(outIds.subsetOf(inIds), s"alien ids ${outIds -- inIds} (seed=$seed)")

      // coordinates length ∈ {2,3} (P4/P5); speed ≥ 0 (P13, gs ≥ 0 or sentinel)
      val shapes = out.select(
        size(col("feature.geometry.coordinates")).as("cl"),
        col("feature.properties.speed").as("sp")).collect()
      assert(shapes.forall(r => r.getInt(0) == 2 || r.getInt(0) == 3), s"coord len (seed=$seed)")

      // remarks always 6 lines (P16)
      val remarkLines = out.select(col("feature.properties.remarks")).collect()
        .map(_.getString(0).split("\n", -1).length)
      assert(remarkLines.forall(_ == 6), s"remarks lines (seed=$seed)")
      out.unpersist()
    }
  }

  test("includes-mode output ⊆ includes registrations (J2)") {
    import spark.implicits._
    val in = batch(120, 7L)
    val out = Pipeline.run(in.toDF(), Fixtures.includesDf(spark),
      AdsbxConfig(includesFiltering = true))
    val incKeys = Fixtures.includes.flatMap(_.registration)
      .filter(_.nonEmpty).map(_.toLowerCase.trim).toSet
    val outIds = out.select("id").collect().map(_.getString(0)).toSet
    assert(outIds.subsetOf(incKeys))
  }
}
