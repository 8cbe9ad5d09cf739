package graft.adsbx

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Unit tests for P1-P17, pinned to the reference's JS-quirk semantics
  * (SURVEY §2.8 — each case cites the task.ts site it reproduces). */
class CotTransformSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val out = {
    CotTransform.flat(Fixtures.aircraftDf(spark), emergencyHostile = false)
      .orderBy("seq")
  }
  private def row(id: String): Row =
    out.filter(col("id") === id).orderBy(col("seq").desc).head()

  test("P1/P3: id = (r || flight).toLowerCase().trim(); r='' falls through (task.ts:139)") {
    assert(row("n123ab").getAs[String]("id") == "n123ab")
    assert(row("ual123").getAs[String]("id") == "ual123") // r was ""
    assert(row("n456lm").getAs[String]("id") == "n456lm") // padded mixed case
  }

  test("P2/P6: null ids and whitespace-only ids dropped (task.ts:140,148)") {
    val ids = out.select("id").collect().map(_.getString(0)).toSet
    // seq 2 (both null), seq 3 (whitespace flight), seq 10 (whitespace r —
    // truthy in JS so it does NOT fall through to flight, then trims empty)
    assert(out.count() == 8) // 11 input rows - 3 dropped; n777xy still dup here
    assert(!ids.contains(""))
    assert(!ids.contains("delta5")) // whitespace r must NOT fall back to flight
  }

  test("P5: alt_geom=0 is falsy → no third coordinate (task.ts:146)") {
    assert(row("n888zz").getAs[scala.collection.Seq[Double]]("coordinates").length == 2)
    assert(row("n123ab").getAs[scala.collection.Seq[Double]]("coordinates") ==
      Seq(-119.81204, 40.14401, 3500 * 0.3048).toSeq)
  }

  test("P7: category switch A0-A6/-F, A7/-H, B2/-L, else '' (task.ts:152-171)") {
    assert(row("n123ab").getAs[String]("cot_type").endsWith("-F"))
    assert(row("n777xy").getAs[String]("cot_type").endsWith("-H"))
    assert(row("n888zz").getAs[String]("cot_type").endsWith("-L"))
    assert(row("g-abcd").getAs[String]("cot_type") == "a-f-A-M") // C1 unknown → no suffix (dbFlags 2.5 → -M)
  }

  test("P8: dbFlags %2 with undefined-guard; 0 civilian, odd military, fractional fmod (task.ts:175-178)") {
    assert(row("n123ab").getAs[String]("cot_type").contains("-A-C"))  // dbFlags 0
    // dbFlags 2.5: JS % is fmod → 2.5 % 2 = 0.5 !== 0 → military
    assert(row("g-abcd").getAs[String]("cot_type").contains("-A-M"))
    assert(row("n777xy").getAs[String]("cot_type").contains("-A-M"))  // dbFlags 3
    assert(row("ual123").getAs[String]("cot_type").contains("-A-C"))  // null
    // full matrix, incl. even-nonzero (a parity→truthiness regression
    // would pass every fixture row above but fail dbFlags=2.0 here)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq(Some(0.0), Some(1.0), Some(2.0), Some(2.5), Some(3.0),
      Some(-3.5), None).toDF("dbFlags")
      .select(CotTransform.civMilFlag(col("dbFlags")).as("f"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("-C", "-M", "-C", "-M", "-M", "-M", "-C"))
  }

  test("P9/P10: emergency hostile only when configured (task.ts:182-185,191)") {
    assert(row("n888zz").getAs[String]("cot_type") == "a-f-A-C-L")
    val hostile = CotTransform.flat(Fixtures.aircraftDf(spark), emergencyHostile = true)
    val z = hostile.filter(col("id") === "n888zz").head()
    assert(z.getAs[String]("cot_type") == "a-h-A-C-L")
    // emergency = "none" stays friendly even when configured
    val n = hostile.filter(col("id") === "n123ab").head()
    assert(n.getAs[String]("cot_type") == "a-f-A-C-F")
  }

  test("P13: gs is NULLISH — gs=0 stays 0 m/s (task.ts:195)") {
    assert(row("n777xy").getAs[Double]("speed") == 80.0 * 0.514444) // last-wins row has gs=80
    val first = out.filter(col("id") === "n777xy").orderBy("seq").head()
    assert(first.getAs[Double]("speed") == 0.0) // seq4: gs=0 kept
    assert(row("ual123").getAs[Double]("speed") == 9999999.0 * 0.514444) // null → sentinel
  }

  test("P14: track is FALSY — track=0 (due north) becomes sentinel (task.ts:196)") {
    val first = out.filter(col("id") === "n777xy").orderBy("seq").head()
    assert(first.getAs[Double]("course") == 9999999.0) // seq4: track=0
    assert(row("n123ab").getAs[Double]("course") == 245.3)
  }

  test("P11/P16: callsign trimmed; remarks 6 lines with Unknown fallbacks (task.ts:192,198-205)") {
    assert(row("n123ab").getAs[String]("callsign") == "TANKER1")
    assert(row("g-abcd").getAs[String]("callsign") == "")
    val r = row("n123ab").getAs[String]("remarks")
    assert(r == "Flight: TANKER1\nRegistration: N123AB\nType: AT8T\nCategory: A1\nEmergency: none\nSquawk: 1200")
    val r2 = row("ual123").getAs[String]("remarks")
    assert(r2 == "Flight: UAL123\nRegistration: Unknown\nType: Unknown\nCategory: A3\nEmergency: Unknown\nSquawk: Unknown")
  }

  test("P15: metadata carries the pristine input record (task.ts:197)") {
    val m = row("n123ab").getAs[Row]("metadata")
    assert(m.getAs[String]("flight") == "TANKER1 ") // untrimmed original
    assert(m.getAs[String]("alt_baro") == "3500")
    val g = row("n888zz").getAs[Row]("metadata")
    assert(g.getAs[String]("alt_baro") == "ground") // union-type string
  }
}
