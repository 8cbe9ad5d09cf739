package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drift-monitor semantics beyond the oracle's exact-value pin: the
  * no-drift fixpoint (a sample compared against an identical copy reports
  * exactly zero) and sensitivity (an injected location shift must move
  * both statistics well off the same-law baseline). */
class DriftSpec extends SparkSpec {

  import spark.implicits._

  private def law(i: Int): Double = ((i * 2654435761L) % 1000L).toDouble / 10.0

  // every value appears once per sample: the two empirical CDFs coincide
  private def identicalSamples(n: Int) = (0 until n).flatMap { i =>
    Seq((law(i), true, (2 * i).toLong), (law(i), false, (2 * i + 1).toLong))
  }.toDF("v", "ref", "i")

  // two interleaved draws from the same deterministic law
  private def sameLaw(n: Int) = (0 until n).map { i =>
    (law(i), i % 2 == 0, i.toLong)
  }.toDF("v", "ref", "i")

  test("identical samples: KS and PSI are exactly zero") {
    val d = identicalSamples(1500)
    val ks = StatOps.ksDrift(d, col("ref"), col("v"), col("i")).collect()(0)
    assert(ks.getDouble(0) == 0.0, s"identical-sample KS must be 0: $ks")
    val psi = StatOps.psiDrift(d, col("ref"), col("v"), col("i"))
      .select("psi_total").collect()(0).getDouble(0)
    assert(psi == 0.0, s"identical-sample PSI must be 0: $psi")
  }

  test("an injected location shift moves both statistics") {
    val base = sameLaw(3000)
    val ks0 = StatOps.ksDrift(base, col("ref"), col("v"), col("i"))
      .collect()(0).getDouble(0)
    // shift the non-reference sample by +30% of the range
    val shifted = base.select(
      when(col("ref"), col("v")).otherwise(col("v") + 30.0).as("v"),
      col("ref"), col("i"))
    val ks1 = StatOps.ksDrift(shifted, col("ref"), col("v"), col("i"))
      .collect()(0).getDouble(0)
    assert(ks1 > ks0 + 0.15,
      s"shifted KS $ks1 must clearly exceed the same-law baseline $ks0")
    val psi1 = StatOps.psiDrift(shifted, col("ref"), col("v"), col("i"))
      .select("psi_total").collect()(0).getDouble(0)
    assert(psi1 > 0.1, s"shifted PSI should alert (>0.1): $psi1")
  }

  test("KS counts partition the pooled sample") {
    val d = sameLaw(999)
    val r = StatOps.ksDrift(d, col("ref"), col("v"), col("i")).collect()(0)
    assert(r.getLong(2) + r.getLong(3) == 999L)
  }
}
