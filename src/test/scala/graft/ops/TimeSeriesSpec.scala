package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Semantic checks for the round-10 time-series additions — each operator
  * pinned against a hand-computed fixture, independently of the DuckDB
  * oracle (which replays the same plan; these tests pin the MATH). */
class TimeSeriesSpec extends SparkSpec {

  private def hourTs(h: Int): Timestamp =
    Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h.toLong))

  /** (key, hour-offset, event_id, value) rows → events-shaped frame. */
  private def ev(rows: Seq[(Long, Int, Long, Double)]) = {
    import spark.implicits._
    rows.map { case (k, h, e, v) => (k, hourTs(h), e, v) }
      .toDF("user_id", "ts", "event_id", "value")
  }

  test("anomalyZscore flags exactly the planted spike, full windows only") {
    // 29 quiet points (value 10.0) then one spike of 50.0: windows are
    // full from the 24th row on; the spike's window has mean/std driven
    // by 23 tens + one fifty.
    val rows = (0 until 29).map(i => (1L, i, i.toLong, 10.0)) :+
      (1L, 29, 29L, 50.0)
    val out = anomaly(rows)
    // rows 0..22 have partial windows -> dropped
    assert(out.size == 30 - 23)
    // all-constant full windows: variance 0 -> z defined as 0, no flag
    (23 to 28).foreach { e =>
      assert(out(e.toLong) == (0.0, 0L), s"event $e should be quiet") }
    // the spike: mean = (23*10+50)/24, var = E[x^2]-mean^2 over the frame
    val mean = (23 * 10.0 + 50.0) / 24
    val ex2 = (23 * 100.0 + 2500.0) / 24
    val z = (50.0 - mean) / math.sqrt(ex2 - mean * mean)
    val (zGot, flag) = out(29L)
    assert(math.abs(zGot - z) < 1e-6 && flag == 1L,
      s"spike z: got $zGot expected $z")
  }

  private def anomaly(rows: Seq[(Long, Int, Long, Double)]) =
    TimeSeriesOps.anomalyZscore(ev(rows), "user_id", "ts", "event_id",
        "value")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Double]("z"), r.getAs[Long]("is_anom"))).toMap

  test("anomalyMad: the median window shrugs off the spike zscore hides behind") {
    // 9-wide window over mostly-constant data with ONE huge spike:
    // med = 10, MAD = 0 for all-constant windows — the spike row's own
    // window has med 10, MAD 0, |50-10| > 3*0 -> flagged; the constant
    // rows are |10-10| = 0 -> quiet. Windows < 9 rows are dropped.
    val rows = (0 until 12).map(i =>
      (1L, i, i.toLong, if (i == 10) 50.0 else 10.0))
    val out = TimeSeriesOps.anomalyMad(ev(rows), "user_id", "ts",
        "event_id", "value", n = 9, k = 3.0)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Long]("is_anom"))).toMap
    assert(out.size == 12 - 8) // full windows only
    assert(out(10L) == (10.0, 0.0, 1L)) // spike flagged, median untouched
    assert(out(9L) == (10.0, 0.0, 0L))
    assert(out(11L) == (10.0, 0.0, 0L)) // window holds the spike; robust
    val ex = intercept[IllegalArgumentException] {
      TimeSeriesOps.anomalyMad(ev(rows), "user_id", "ts", "event_id",
        "value", n = 8)
    }
    assert(ex.getMessage.contains("odd"))
  }

  test("interpLinear draws the straight line between brackets, no extrapolation") {
    // key 1: observations at hour 0 (v=10) and hour 4 (v=30) -> hours
    // 1..3 interpolate to 15, 20, 25; nothing past hour 4.
    val out = TimeSeriesOps.interpLinear(
        ev(Seq((1L, 0, 1L, 10.0), (1L, 4, 2L, 30.0))),
        "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => r.getAs[Timestamp]("hour").toInstant.atZone(
          java.time.ZoneOffset.UTC).getHour ->
        (r.getAs[Double]("interp"), r.getAs[Long]("is_obs")))
      .toMap
    assert(out.keySet == Set(0, 1, 2, 3, 4))
    assert(out(0) == (10.0, 1L) && out(4) == (30.0, 1L))
    assert(out(1) == (15.0, 0L) && out(2) == (20.0, 0L) &&
      out(3) == (25.0, 0L))
  }

  test("interpLinear keeps the last-in-hour observation as the bracket") {
    // two observations in hour 0 (event order breaks the tie) -> the
    // later one (v=12) is the bracket start.
    val out = TimeSeriesOps.interpLinear(
        ev(Seq((1L, 0, 1L, 8.0), (1L, 0, 2L, 12.0), (1L, 2, 3L, 22.0))),
        "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => r.getAs[Timestamp]("hour").toInstant.atZone(
          java.time.ZoneOffset.UTC).getHour -> r.getAs[Double]("interp"))
      .toMap
    assert(out(0) == 12.0 && out(1) == 17.0 && out(2) == 22.0)
  }

  test("ewma matches the hand-rolled truncated weighted mean") {
    // series 1,2,3,4 with n=3, alpha=0.5: weights 1, .5, .25 renormalized
    // over present terms.
    val out = TimeSeriesOps.ewma(
        ev(Seq((1L, 0, 0L, 1.0), (1L, 1, 1L, 2.0), (1L, 2, 2L, 3.0),
          (1L, 3, 3L, 4.0))),
        "user_id", "ts", "event_id", "value", n = 3, alpha = 0.5)
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma")).toMap
    def rnd(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(0L) == 1.0)
    assert(out(1L) == rnd((2.0 + 0.5 * 1.0) / 1.5))
    assert(out(2L) == rnd((3.0 + 0.5 * 2.0 + 0.25 * 1.0) / 1.75))
    assert(out(3L) == rnd((4.0 + 0.5 * 3.0 + 0.25 * 2.0) / 1.75))
  }

  test("forecastBacktest: constant series gives zero MAEs and a NULL " +
      "skill; a ramp makes the lagging smoother lose to persistence") {
    // constant: every forecast and naive lag is exact -> maes 0; the
    // skill ratio is 0/0, which must surface as NULL, not NaN
    val const = TimeSeriesOps.forecastBacktest(
        ev((0 until 6).map(h => (1L, h, h.toLong, 5.0))),
        "user_id", "ts", "event_id", "value", n = 3, alpha = 0.5)
      .collect().head
    assert(const.getAs[Long]("n_steps") == 5L)
    assert(const.getAs[Double]("mae_ewma") == 0.0)
    assert(const.getAs[Double]("mae_naive") == 0.0)
    assert(const.isNullAt(const.fieldIndex("skill")))
    // ramp y = t: naive error is exactly 1 every step; the smoother lags
    // the line by a positive constant, so its error exceeds 1 -> skill < 0
    val ramp = TimeSeriesOps.forecastBacktest(
        ev((0 until 8).map(h => (1L, h, h.toLong, h.toDouble))),
        "user_id", "ts", "event_id", "value", n = 3, alpha = 0.5)
      .collect().head
    assert(ramp.getAs[Double]("mae_naive") == 1.0)
    assert(ramp.getAs[Double]("mae_ewma") > 1.0)
    assert(ramp.getAs[Double]("skill") < 0.0)
  }

  test("desForecast: linear series recovers the slope as trend exactly") {
    // On a long-enough linear ramp y = t the truncated kernels converge:
    // s1 lags the line by a constant c = Σ w_i·i / Σ w_i, s2 by 2c, so
    // level = 2s1 − s2 = y_t and trend = α/(1−α)·(s1−s2): for n=3,
    // α=0.5 → c = (0·1 + 1·.5 + 2·.25)/1.75 = 4/7, trend = 1·(4/7)=4/7…
    // rather than replay the algebra, pin against a hand-rolled fold.
    val rows = (0 until 8).map(i => (1L, i, i.toLong, 10.0 + 2.0 * i))
    val out = TimeSeriesOps.desForecast(ev(rows),
        "user_id", "ts", "event_id", "value", n = 3, alpha = 0.5,
        horizon = 2)
      .collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    def rnd(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val w = Seq(1.0, 0.5, 0.25)
    def smooth(xs: Seq[Double]): Seq[Double] = xs.indices.map { t =>
      val lags = (0 until 3).flatMap(i => if (t - i >= 0) Some((xs(t - i), w(i))) else None)
      rnd(lags.map { case (x, wt) => x * wt }.sum / lags.map(_._2).sum)
    }
    val s1 = smooth(rows.map(_._4))
    val s2 = smooth(s1)
    val coef = 0.5 / 0.5
    (0 until 8).foreach { t =>
      val r = out(t.toLong)
      assert(r.getAs[Double]("s1") == s1(t), s"s1 at $t")
      assert(r.getAs[Double]("s2") == s2(t), s"s2 at $t")
      val level = 2.0 * s1(t) - s2(t)
      val trend = coef * (s1(t) - s2(t))
      assert(r.getAs[Double]("fc1") == rnd(level + 1.0 * trend), s"fc1 at $t")
      assert(r.getAs[Double]("fc2") == rnd(level + 2.0 * trend), s"fc2 at $t")
    }
    // deep into the ramp the forecast follows the trend upward; the
    // n=3-truncated kernel biases the trend low (the infinite-kernel
    // identity trend == slope needs the full tail), so pin direction +
    // a 1-unit band rather than exact slope recovery
    val fc1 = out(7L).getAs[Double]("fc1")
    assert(fc1 > 10.0 + 2.0 * 7, s"forecast must exceed the last level: $fc1")
    assert(math.abs(fc1 - (10.0 + 2.0 * 8)) < 1.0, s"fc1=$fc1")
  }

  test("desForecast: both smoothing passes share ONE exchange + sort") {
    val df = TimeSeriesOps.desForecast(
      graft.Tables(spark, "/root/testdata/sf0.001", "events"),
      "user_id", "ts", "event_id", "value")
    val simple = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val shuffles = simple.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Broadcast") && !l.contains("Reused"))
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$simple")
    assert(simple.linesIterator.count(_.contains("Window")) == 2,
      s"both smoothing passes plan as Window operators:\n$simple")
  }

  test("holtWinters: a level + pure daily pattern is forecast EXACTLY " +
      "(the seasonal term des cannot express)") {
    // v = 10 + f(hod) with f zero-mean over the 24 phases and exact at
    // 2 dp: the centered 24-row trend window covers each phase once →
    // trend0 = 10 exactly, seasonal(hod) = f(hod) exactly; the
    // deseasonalized series is the constant 10 → level 10, trend 0, and
    // fc_h = 10 + f((hod + h) % 24) = the ACTUAL next value.
    def f(hod: Int): Double = (hod - 12) * 0.02
    val adj = -(0 until 24).map(f).sum / 24.0 // exact-mean correction
    val rows = (0 until 72).map(i =>
      (1L, i, i.toLong, 10.0 + f(i % 24) + adj))
    val out = TimeSeriesOps.holtWinters(ev(rows),
        "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(out.size == 72)
    (0 until 71).foreach { i =>
      val r = out(i.toLong)
      assert(math.abs(r.getAs[Double]("level") - 10.0) < 1e-6, s"level@$i $r")
      assert(math.abs(r.getAs[Double]("trend")) < 1e-6, s"trend@$i $r")
      // fc1 predicts the next observation exactly (6 dp)
      val next = rows(i + 1)._4
      assert(math.abs(r.getAs[Double]("fc1") - next) < 1e-6,
        s"fc1@$i = ${r.getAs[Double]("fc1")} vs actual $next")
    }
    // the seasonal-blind des forecaster CANNOT do this on the same data:
    // its fc1 misses the pattern for some rows by a visible margin
    val des = TimeSeriesOps.desForecast(ev(rows),
        "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getAs[Long]("event_id") -> r).toMap
    val worstDes = (24 until 71).map { i =>
      math.abs(des(i.toLong).getAs[Double]("fc1") - rows(i + 1)._4) }.max
    assert(worstDes > 0.05,
      s"the fixture must actually defeat the seasonal-blind baseline: $worstDes")
  }

  test("holtWinters: one series-keyed shuffle for the smoothing lineage") {
    val df = TimeSeriesOps.holtWinters(
      graft.Tables(spark, "/root/testdata/sf0.001", "events"),
      "user_id", "ts", "event_id", "value")
    val simple = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    // window lineage + seasonal-map build + the key join: a bounded
    // handful of key-shuffles. (The planner MAY auto-broadcast the
    // seasonal map when it is small — the code never forces it, so a
    // corpus-scale series population falls back to the key-shuffle join
    // on its own; both passes still stack on ONE window lineage.)
    val shuffles = simple.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Broadcast") && !l.contains("Reused"))
    assert(shuffles <= 5, s"unexpected exchange count $shuffles:\n$simple")
    // 2 stacked smoothing windows + the seasonal build's centered-trend
    // window(s); every windowspecdefinition in the plan must carry the
    // series key (no single-partition window anywhere)
    val windows = simple.linesIterator.count(_.contains("Window"))
    assert(windows >= 2 && windows <= 4, s"window count $windows:\n$simple")
    assert(!simple.contains("windowspecdefinition(ts#"),
      s"unkeyed window (order-only spec) in plan:\n$simple")
  }

  test("dominantPeriod: a planted 4-hour cycle reads period 4") {
    // series A: strict 4-hour cycle over 48 hours; series B: strict
    // 6-hour cycle — each must recover ITS period, independently
    val rows = (0 until 48).flatMap { h =>
      Seq(("A", hourTs(h), h.toLong, Seq(10.0, 20.0, 5.0, 40.0)(h % 4)),
        ("B", hourTs(h), 100L + h, Seq(1.0, 9.0, 3.0, 7.0, 2.0, 30.0)(h % 6)))
    }
    import spark.implicits._
    val d = rows.toDF("event_type", "ts", "event_id", "value")
    val got = TimeSeriesOps.dominantPeriod(d, "event_type", "ts", "value",
        maxLag = 12, minLag = 2)
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getAs[Double]("acf"))).toMap
    assert(got("A")._1 == 4, s"A: $got")
    assert(got("A")._2 == 1.0) // exact cycle -> perfect lag-4 correlation
    assert(got("B")._1 == 6, s"B: $got")
    assert(got("B")._2 == 1.0)
  }

  test("crossCorr: a shifted copy correlates 1 exactly at its lag") {
    // y(h) = x(h - 2): lag-2 alignment is a perfect line; lag 0 pairs a
    // rising ramp against its 2-shifted self (still positive, < 1)
    val xs = (0 until 12).map(h => (1L, h, h.toLong, (h * h).toDouble))
    val ys = (2 until 14).map(h => (1L, h, 100L + h,
      ((h - 2) * (h - 2)).toDouble))
    val d = ev(xs).withColumn("event_type", lit("click"))
      .unionByName(ev(ys).withColumn("event_type", lit("purchase")))
    val got = TimeSeriesOps.crossCorr(d, "ts", col("event_type"),
        col("value"), "click", "purchase")
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("xcorr"))).toMap
    assert(got(2) == (12L, 1.0))
    assert(got(0)._2 < 1.0 && got(0)._2 > 0.9)
  }

  test("crossCorr: constant series yields NULL, not a crash") {
    val xs = (0 until 6).map(h => (1L, h, h.toLong, 5.0))
    val ys = (0 until 6).map(h => (1L, h, 100L + h, (h * 3).toDouble))
    val d = ev(xs).withColumn("event_type", lit("click"))
      .unionByName(ev(ys).withColumn("event_type", lit("purchase")))
    val got = TimeSeriesOps.crossCorr(d, "ts", col("event_type"),
        col("value"), "click", "purchase")
      .collect().map(r => r.getInt(0) -> r.isNullAt(2)).toMap
    assert(got(0), "constant x side must produce NULL xcorr")
  }

  test("autocorr: linear series is exactly 1, alternating series is -1 at lag 1") {
    // key 1: strictly linear (ACF 1 at every lag); key 2: alternating
    // +/-5 around 0 (ACF -1 at lag 1, +1 at lag 2).
    val lin = (0 until 10).map(i => (1L, i, i.toLong, 1.0 + i))
    val alt = (0 until 10).map(i => (2L, i, (100 + i).toLong,
      if (i % 2 == 0) 5.0 else -5.0))
    val out = TimeSeriesOps.autocorr(ev(lin ++ alt), "user_id", "ts",
        "event_id", "value", maxLag = 2)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("k")) ->
        Option(r.getAs[java.lang.Double]("acf")).map(_.doubleValue)).toMap
    assert(out((1L, 1)).contains(1.0) && out((1L, 2)).contains(1.0))
    assert(out((2L, 1)).contains(-1.0) && out((2L, 2)).contains(1.0))
  }

  test("autocorr: constant series yields NULL, not a crash") {
    val out = TimeSeriesOps.autocorr(
        ev((0 until 6).map(i => (1L, i, i.toLong, 7.0))),
        "user_id", "ts", "event_id", "value", maxLag = 2)
      .collect()
    assert(out.length == 2 && out.forall(_.isNullAt(2)))
  }

  test("changepoint flags the planted level shift and nothing else") {
    // 20 points at 10.0 then 20 points at 30.0, k=5: the boundary scores
    // highest; constant stretches away from the shift score 0.
    val rows = (0 until 20).map(i => (1L, i, i.toLong, 10.0)) ++
      (20 until 40).map(i => (1L, i, i.toLong, 30.0))
    val out = TimeSeriesOps.changepoint(ev(rows), "user_id", "ts",
        "event_id", "value", k = 5, thresh = 3.0)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Double]("shift_z"), r.getAs[Long]("is_cp"))).toMap
    // both windows full: trailing needs i >= 5, leading [i, i+4] needs
    // i <= 35
    assert(out.keySet == (5 to 35).map(_.toLong).toSet)
    // deep inside constant stretches: zero shift -> score 0
    assert(out(10L) == (0.0, 0L) && out(30L) == (0.0, 0L))
    // event 20 is the exact boundary: before all 10s, after all 30s,
    // pooled variance 0 -> the epsilon-regularized score is enormous;
    // straddling neighbors (18, 19, 21, 22) score 1.73 / 2.83 — under
    // the 3.0 threshold — so the boundary alone flags.
    val flagged = out.collect { case (e, (_, 1L)) => e }
    assert(flagged == List(20L), s"exactly the boundary must flag: $flagged")
    assert(out(19L)._1 < 3.0 && out(21L)._1 < 3.0)
  }

  test("seasonalDecompose recovers trend+seasonal+remainder identity") {
    // 3 days of hourly data with a deterministic daily shape on a flat
    // level: decomposition must satisfy v = trend + seasonal + remainder
    // (to rounding) and the trend must sit near the level.
    val rows = (0 until 72).map { i =>
      (1L, i, i.toLong, 100.0 + (if (i % 24 < 12) 4.0 else -4.0)) }
    val df = TimeSeriesOps.seasonalDecompose(ev(rows), "user_id", "ts",
        "event_id", "value", width = 24)
    val got = df.collect().map(r => (r.getAs[Long]("event_id"),
      r.getAs[Double]("trend"), r.getAs[Double]("seasonal"),
      r.getAs[Double]("remainder")))
    // centered 24-window over a shape summing to 0 per day -> trend 100
    assert(got.nonEmpty)
    got.foreach { case (e, t, s, r) =>
      assert(t == 100.0, s"event $e trend $t")
      val v = 100.0 + (if (e % 24 < 12) 4.0 else -4.0)
      assert(math.abs(v - (t + s + r)) < 2e-6,
        s"event $e identity broke: $v vs ${t + s + r}")
      assert(math.abs(math.abs(s) - 4.0) < 1e-6,
        s"event $e seasonal $s should be ±4")
    }
  }

  test("api surface reproduces the corpus queries for the new ts ops") {
    val sf = "/root/testdata/sf0.001"
    import graft.api._
    val evs = graft.Tables(spark, sf, "events")
    for ((got, name) <- Seq(
        (evs.anomalyZscore("user_id", "ts", "event_id", "value"),
          "ts_anomaly_zscore"),
        (evs.interpLinear("user_id", "ts", "event_id", "value"),
          "ts_interp_linear"),
        (evs.ewma("user_id", "ts", "event_id", "value"), "ts_ewma"),
        (evs.autocorr("user_id", "ts", "event_id", "value"),
          "ts_autocorr"),
        (evs.changepoint("user_id", "ts", "event_id", "value"),
          "ts_changepoint"),
        (evs.seasonalDecompose("user_id", "ts", "event_id", "value"),
          "ts_seasonal_decompose"))) {
      val ref = TimeSeriesOps.queries(name)(spark, sf)
      assert(got.exceptAll(ref).count() == 0 && got.count() == ref.count(),
        s"$name api/corpus mismatch")
    }
  }
}
