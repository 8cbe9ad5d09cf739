package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form pins for the Bradley–Terry MM iteration — fixtures whose
  * fixed point is exact, independent of the DuckDB oracle replay. */
class BradleyTerrySpec extends SparkSpec {

  import spark.implicits._

  test("two items: win share IS the fixed point (one step, exact)") {
    // A beats B 3 of 4: normalized MM fixes w_A = 3/4, w_B = 1/4 after
    // the first step (denominators equal 4 under sum-normalization)
    val comp = Seq(("A", "B", 1), ("A", "B", 1), ("A", "B", 1),
      ("A", "B", 0)).toDF("pa", "pb", "win_a")
    val got = TrainOps.bradleyTerry(comp).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_wins"), r.getAs[Long]("n_games"),
          r.getAs[Double]("strength"))).toMap
    assert(got("A") == (3L, 4L, 0.75))
    assert(got("B") == (1L, 4L, 0.25))
  }

  test("balanced round robin: uniform strengths") {
    // three items, each pair splits 1-1: symmetry fixes w = 1/3 each
    val comp = Seq(
      ("A", "B", 1), ("A", "B", 0), ("B", "C", 1), ("B", "C", 0),
      ("A", "C", 1), ("A", "C", 0)).toDF("pa", "pb", "win_a")
    val got = TrainOps.bradleyTerry(comp).collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.getAs[Long]("n_wins") == 2L)
      assert(r.getAs[Long]("n_games") == 4L)
      assert(r.getAs[Double]("strength") == 0.333333)
    }
  }

  test("counts front-end: a mutual zero-win pair drops its denominator " +
      "term instead of dividing by zero") {
    // C and D never won anywhere but DID play each other (reachable via
    // direct counts — e.g. ties recorded as games without wins): both are
    // 0 from step 1, so the C–D term is n/(0+0). Unguarded, Spark's
    // decimal cast NULLs the ±Inf (term silently dropped) while DuckDB
    // ERRORS — the guard makes both engines skip it identically.
    val games = Seq(("A", "C", 2L), ("C", "A", 2L), ("A", "D", 2L),
      ("D", "A", 2L), ("C", "D", 2L), ("D", "C", 2L)).toDF("i", "j", "n")
    val items = Seq(("A", 4L, 4L), ("C", 4L, 0L), ("D", 4L, 0L))
      .toDF("i", "n_games", "wins")
    val got = TrainOps.bradleyTerryCounts(games, items).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    assert(got("A") == 1.0)
    assert(got("C") == 0.0 && got("D") == 0.0)
  }

  test("dominance orders strengths; zero-win item keeps strength 0") {
    // A beats B twice, B beats C twice, A beats C twice: strength order
    // A > B > C; C never wins -> W_C = 0 pins w_C = 0 from step 1
    val comp = Seq(
      ("A", "B", 1), ("A", "B", 1), ("B", "C", 1), ("B", "C", 1),
      ("A", "C", 1), ("A", "C", 1)).toDF("pa", "pb", "win_a")
    val got = TrainOps.bradleyTerry(comp).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    assert(got("C") == 0.0)
    assert(got("A") > got("B") && got("B") > got("C"))
  }
}
