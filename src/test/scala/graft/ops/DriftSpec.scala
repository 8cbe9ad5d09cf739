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

  test("KS raises loudly on an empty sample instead of emitting NaN") {
    // all rows in the reference: n_cur = 0, the CDF divisions are
    // engine-dependent NaN/∞ — the operator must fail, not rank noise
    val d = sameLaw(100).select(col("v"), lit(true).as("ref"), col("i"))
    val ex = intercept[Exception] {
      StatOps.ksDrift(d, col("ref"), col("v"), col("i")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("empty reference or current sample")),
      s"expected the ksDrift guard, got: $ex")
  }

  test("CUSUM changepoint lands on a planted level shift") {
    import java.sql.Timestamp
    // 200 hourly points per key: level 10 then 30 from hour 120 — the
    // CUSUM argmax must sit exactly at the shift boundary (S_k peaks at
    // the last pre-shift... for a step UP the |S| max is AT the step)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = for {
      key <- Seq("a", "b"); i <- 0 until 200
      lvl = if (i < 120) 10.0 else 30.0
    } yield (key, new Timestamp(base + i * 3600L * 1000L), lvl)
    val d = rows.toDF("k", "ts", "v")
    val got = StatOps.cusumChangepoint(d, col("k"), col("ts"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getTimestamp(2), r.getDouble(3))).toMap
    got.foreach { case (k, (n, cp, mx)) =>
      assert(n == 200L, s"$k: n_hours $n")
      // |S_k| is maximal at the last pre-shift hour (index 119)
      assert(cp == new Timestamp(base + 119 * 3600L * 1000L),
        s"$k: changepoint at $cp, expected hour 119")
      // mean = (120*10 + 80*30)/200 = 18; S_119 = 120*(10-18) = -960
      assert(mx == 960.0, s"$k: cusum magnitude, expected 960: $mx")
    }
  }

  test("CUSUM on a constant series reports zero magnitude") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 50).map(i =>
      ("c", new Timestamp(base + i * 3600L * 1000L), 7.5))
    val r = StatOps.cusumChangepoint(rows.toDF("k", "ts", "v"),
      col("k"), col("ts"), col("v")).collect()(0)
    assert(r.getDouble(3) == 0.0, s"constant series must have S == 0: $r")
    // tie on |S|: earliest hour wins deterministically
    assert(r.getTimestamp(2) == new Timestamp(base))
  }

  test("ksDrift plan: one fused rank substrate, no row-id join") {
    // r12 paid two range exchanges (globalRank + groupedRank) and a
    // SortMergeJoin to recombine them; the fused kernel must leave the
    // plan with exactly ONE rank-substrate scan and NO join
    val d = sameLaw(100)
    val p = StatOps.ksDrift(d, col("ref"), col("v"), col("i"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("Join"), s"join survived the fusion:\n$p")
    val substrateScans = p.linesIterator.count(_.contains("Scan ExistingRDD"))
    assert(substrateScans == 1,
      s"expected 1 fused rank substrate, got $substrateScans:\n$p")
  }
}
