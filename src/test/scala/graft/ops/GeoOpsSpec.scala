package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("proximity grid join finds exactly the brute-force pair set") {
    import spark.implicits._
    val pts = graft.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        ((col("user_id") * 37 % 170) - 85 +
          (col("value") - floor(col("value")))).as("lat"),
        ((col("user_id") * 53 % 350) - 175 +
          (col("value") * 3 - floor(col("value") * 3))).as("lon"))
    val grid = GeoOps.proximityPairs(pts, col("event_id"), col("lat"),
        col("lon"), thresh = 0.05)
      .select("e1", "e2").as[(Long, Long)].collect().toSet
    val a = pts.select(col("event_id").as("e1"), col("lat").as("la"), col("lon").as("lo"))
    val b = pts.select(col("event_id").as("e2"), col("lat").as("lb"), col("lon").as("lb2"))
    val brute = a.crossJoin(b).filter(col("e1") < col("e2"))
      .filter((col("la") - col("lb")) * (col("la") - col("lb")) +
        (col("lo") - col("lb2")) * (col("lo") - col("lb2")) < 0.0025)
      .select("e1", "e2").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture must produce at least one close pair")
    assert(grid == brute)
  }

  test("threshold-sized cells admit far fewer candidates than 1-degree cells") {
    val pts = GeoOps.derivePoints(graft.Tables(spark, sf, "events"))
      .filter(col("event_type") === "purchase")
    def candidates(cellSize: Double): Long =
      GeoOps.proximityCandidates(pts, col("event_id"), col("lat"),
        col("lon"), thresh = 0.05, cellSize = cellSize).count()
    val coarse = candidates(1.0)
    val tight = candidates(0.05)
    assert(tight > 0, "tight cells must still admit the qualifying pairs")
    assert(tight * 20 < coarse,
      s"expected >=20x candidate reduction, got coarse=$coarse tight=$tight")
  }

  test("cell-boundary ulp sweep: grid matches brute force at ±1-ulp coordinates") {
    // Adversarial fixture for the floor(coord/cellSize) binning: points sit
    // exactly ON multiples of the 0.05 cell size and at ±1-ulp
    // perturbations of them, so every quotient lands within an ulp of an
    // integer — the one regime where fp binning could disagree with the
    // exact-arithmetic pigeonhole proof. The grid join must still produce
    // exactly the brute-force pair set.
    import spark.implicits._
    val t = 0.05
    val coords = (for {
      k <- -3 to 3
      base = k * t
      v <- Seq(Math.nextDown(base), base, Math.nextUp(base),
        base + t / 2, base - t + 1e-9, base + t - 1e-9)
    } yield v).distinct
    val pts = coords.zipWithIndex.flatMap { case (la, i) =>
      coords.zipWithIndex.collect { case (lo, j) if (i + j) % 7 == 0 =>
        ((i.toLong * 1000 + j), la, lo)
      }
    }.toDF("event_id", "lat", "lon")
    val grid = GeoOps.proximityPairs(pts, col("event_id"), col("lat"),
        col("lon"), thresh = t)
      .select("e1", "e2").as[(Long, Long)].collect().toSet
    val a = pts.select(col("event_id").as("e1"), col("lat").as("la"), col("lon").as("lo"))
    val b = pts.select(col("event_id").as("e2"), col("lat").as("lb"), col("lon").as("lb2"))
    val brute = a.crossJoin(b).filter(col("e1") < col("e2"))
      .filter((col("la") - col("lb")) * (col("la") - col("lb")) +
        (col("lo") - col("lb2")) * (col("lo") - col("lb2")) < t * t)
      .select("e1", "e2").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "sweep fixture must produce close pairs")
    assert(grid == brute,
      s"grid missed ${(brute -- grid).size}, extra ${(grid -- brute).size}")
  }

  test("proximity plan is a hash equi-join on the cell key, not a cross product") {
    val plan = GeoOps.queries("geo_proximity_pairs")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("each ordered pair is produced exactly once (no multi-cell dups)") {
    val df = GeoOps.queries("geo_proximity_pairs")(spark, sf)
    assert(df.count() == df.select("e1", "e2").distinct().count())
  }

  test("clusterGrid: adjacent dense cells merge, diagonal counts, sparse drops") {
    import spark.implicits._
    // blob A: cells (0,0) + (0,1) + diagonal (1,2) — all dense, one
    // cluster of 3 cells; blob B: isolated dense cell (5,5) — singleton;
    // cell (9,9) has 2 points < minPts — excluded entirely
    def cell(cla: Int, clo: Int, n: Int) =
      (1 to n).map(i => (cla + 0.5, clo + (i % 7) / 10.0))
    val pts = (cell(0, 0, 3) ++ cell(0, 1, 3) ++ cell(1, 2, 3) ++
      cell(5, 5, 4) ++ cell(9, 9, 2)).toDF("lat", "lon")
    val got = GeoOps.clusterGrid(pts, minPts = 3L)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_cells"), r.getAs[Long]("n_points"))).toMap
    // ids: cid = (cla+90)*1000 + clo+180 → (0,0)=90180 is the min label
    assert(got(90180L) == (3L, 9L), s"blob A: $got")
    assert(got((5 + 90) * 1000L + 5 + 180) == (1L, 4L), s"blob B: $got")
    assert(got.size == 2, s"sparse cell must not appear: $got")
  }

  test("trackSimplify: collinear interior points drop, sharp turns stay, " +
      "endpoints always survive") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00")
    // track 1: a straight line — every interior point is on the chord
    // (deviation 0 < eps) -> only the 2 endpoints survive; simplified
    // length equals the original (the chord IS the path)
    val line = (0 until 6).map(i => (1L, ts(i), i.toLong, 10.0 + i, 20.0 + i))
    // track 2: a square-wave zigzag with amplitude 1 >> eps — every
    // interior point deviates by >= ~0.89 from its neighbor chord
    val zig = (0 until 6).map(i =>
      (2L, ts(i), i.toLong, if (i % 2 == 0) 0.0 else 1.0, i.toDouble))
    val d = (line ++ zig).toDF("u", "t", "e", "la", "lo")
    val got = GeoOps.trackSimplify(d, col("u"), col("t"), col("e"),
        col("la"), col("lo"), eps = 0.2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("n_kept"),
          r.getAs[Double]("orig_len"), r.getAs[Double]("simp_len"))).toMap
    val (n1, k1, o1, s1) = got(1L)
    assert(n1 == 6L && k1 == 2L, s"line must keep only endpoints: ${got(1L)}")
    assert(math.abs(o1 - s1) < 1e-5,
      s"straight-line simplification must preserve length: $o1 vs $s1")
    val (n2, k2, _, _) = got(2L)
    assert(n2 == 6L && k2 == 6L, s"zigzag must keep every point: ${got(2L)}")
  }

  test("trackSimplify: simplification never lengthens a path and never " +
      "drops an endpoint (md5-derived pseudo-random tracks)") {
    import spark.implicits._
    import java.sql.Timestamp
    // deterministic jitter tracks: dropping interior points replaces
    // sub-paths with chords, so simp_len <= orig_len by the triangle
    // inequality (up to the 1e-6 step-floor quantization), and n_kept
    // is always >= 2 (endpoints survive by construction)
    val rows = for (u <- 0L until 8L; i <- 0 until 40) yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u|$i".getBytes("UTF-8"))
      (u, Timestamp.valueOf(f"2024-01-01 ${i / 2}%02d:${i % 2 * 30}%02d:00"),
        i.toLong, (h(0) & 0xff) / 64.0, (h(1) & 0xff) / 64.0)
    }
    val got = GeoOps.trackSimplify(rows.toDF("u", "t", "e", "la", "lo"),
      col("u"), col("t"), col("e"), col("la"), col("lo")).collect()
    assert(got.length == 8)
    got.foreach { r =>
      assert(r.getAs[Long]("n_kept") >= 2L)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_points"))
      assert(r.getAs[Double]("simp_len")
        <= r.getAs[Double]("orig_len") + 1e-4,
        s"simplified path must not lengthen: $r")
    }
  }

  test("track distance: per-user path is non-negative with n-1 steps") {
    import spark.implicits._
    val out = GeoOps.queries("geo_track_distance")(spark, sf)
    val evCounts = graft.Tables(spark, sf, "events")
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    out.as[(Long, Long, Double)].collect().foreach { case (u, n, len) =>
      assert(n == evCounts(u) - 1, s"user $u: steps $n vs events ${evCounts(u)}")
      assert(len >= 0.0)
    }
  }
}
