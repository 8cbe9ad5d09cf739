package graft.adsbx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Deterministic in-code ADSBX fixture covering the §2.8 quirk matrix
  * (FIXTURES.md §A). The SAME Scala values feed both the Spark pipeline
  * (via createDataFrame) and the DuckDB oracle (rendered as a SQL VALUES
  * clause by `acValuesSql`/`includesValuesSql`), so the driver's
  * hash-compare runs both engines over identical inputs.
  */
object Fixtures {

  final case class Ac(
      seq: Long, hex: String, `type`: String, group: Option[String],
      flight: Option[String], r: Option[String], t: Option[String],
      dbFlags: Option[Double], alt_baro: Option[String],
      alt_geom: Option[Double], gs: Option[Double], track: Option[Double],
      baro_rate: Option[Double], squawk: Option[String],
      emergency: Option[String], category: Option[String],
      nav_qnh: Option[Double], nav_altitude_mcp: Option[Double],
      nav_heading: Option[Double], lat: Double, lon: Double,
      seen_pos: Double, seen: Double, dst: Option[Double])

  private def ac(seq: Long, flight: Option[String], r: Option[String],
                 t: Option[String] = None, dbFlags: Option[Double] = None,
                 altBaro: Option[String] = None, altGeom: Option[Double] = None,
                 gs: Option[Double] = None, track: Option[Double] = None,
                 squawk: Option[String] = None, emergency: Option[String] = None,
                 category: Option[String] = None,
                 lat: Double = 40.1, lon: Double = -119.8): Ac =
    Ac(seq, f"a${seq}%05d", "adsb_icao", None, flight, r, t, dbFlags, altBaro,
      altGeom, gs, track, Some(seq * 1.5), squawk, emergency, category,
      Some(1013.6), None, None, lat, lon, 0.5, 1.0, Some(100.0 + seq))

  /** Quirk coverage: normal row; r="" falls to flight (JS falsy); both-null
    * dropped; whitespace flight dropped; track=0 → sentinel + gs=0 kept;
    * duplicate id last-wins; alt_geom=0 dropped + alt_baro="ground";
    * unknown category + FRACTIONAL dbFlags (2.5 % 2 = 0.5 → military, the
    * JS fmod semantics); mixed-case padded registration; flight-derived id
    * matching an include; whitespace r (truthy in JS!) → empty id dropped. */
  val aircraft: Seq[Ac] = Seq(
    ac(0, Some("TANKER1 "), Some("N123AB"), t = Some("AT8T"), dbFlags = Some(0),
      altBaro = Some("3500"), altGeom = Some(3500), gs = Some(150.5),
      track = Some(245.3), squawk = Some("1200"), emergency = Some("none"),
      category = Some("A1"), lat = 40.14401, lon = -119.81204),
    ac(1, Some("UAL123  "), Some(""), category = Some("A3"), lat = 41.2, lon = -118.7),
    ac(2, None, None, gs = Some(99.0)),
    ac(3, Some("   "), None, gs = Some(99.0)),
    ac(4, Some("NITE4  "), Some("N777XY"), dbFlags = Some(1), gs = Some(0.0),
      track = Some(0.0), category = Some("A7"), lat = 42.0, lon = -117.5),
    ac(5, Some("NIGHT5 "), Some("N777XY"), dbFlags = Some(3), gs = Some(80.0),
      track = Some(90.0), category = Some("A7"), squawk = Some("7000"),
      lat = 42.1, lon = -117.6),
    ac(6, Some("BALLOON"), Some("N888ZZ"), altBaro = Some("ground"),
      altGeom = Some(0.0), emergency = Some("squawk7700"), category = Some("B2"),
      lat = 39.5, lon = -120.2),
    ac(7, None, Some("G-ABCD"), dbFlags = Some(2.5), category = Some("C1"),
      gs = Some(210.0), track = Some(12.5), lat = 51.5, lon = -0.1),
    ac(8, Some("SKY8"), Some(" n456Lm "), altGeom = Some(12000.0),
      gs = Some(320.0), track = Some(181.0), lat = 38.9, lon = -121.0),
    ac(9, Some("N555QQ"), None, category = Some("A2"), gs = Some(140.0),
      track = Some(359.9), lat = 40.9, lon = -119.0),
    ac(10, Some("DELTA5"), Some(" "), gs = Some(400.0), lat = 40.0, lon = -100.0),
  )

  final case class Inc(inc_pos: Long, domain: String, callsign: Option[String],
                       registration: Option[String], group: String)

  /** Include cases: match+enrich; no registration (skipped); padded
    * mixed-case registration, no callsign override; duplicate registration
    * with falsy callsign (group wins, callsign kept from the earlier one);
    * registration matching a flight-derived id; no matching aircraft. */
  val includes: Seq[Inc] = Seq(
    Inc(0, "FIRE", Some("TANKER1OVR"), Some("N123AB"), "FIRE_AIR_TANKER"),
    Inc(1, "EMS", Some("MEDIC1"), None, "EMS_ROTOR"),
    Inc(2, "LAW", None, Some("n777xy "), "LE_ROTOR"),
    Inc(3, "FIRE", Some(""), Some("N123AB"), "FIRE_INTEL"),
    Inc(4, "LAW", Some("QQAIR"), Some("N555QQ"), "LE_FIXED_WING"),
    Inc(5, "EMS", Some("GHOST"), Some("N000NO"), "EMS_ROTOR_RESCUE"),
  )

  def aircraftDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // column order: seq first, then Schemas.adsbResponse order (case class
    // fields already follow it)
    aircraft.toDF()
  }

  def includesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    includes.toDF()
  }

  /** The quirk-matrix aircraft split into three scheduled-poll pages — the
    * reference receives one envelope per scheduled invocation
    * (task.ts:98,124-129); three pages make the snapshot-log/offset
    * machinery do real work while keeping the SAME total row set, so the
    * cross-snapshot seq encoding (arrival_idx * 2^32 + array position)
    * preserves the fixture's relative order and D1 picks the same winners
    * as the single-batch fixture — which is what lets `cot_stream_poll`
    * share `cot_includes_join`'s oracle. */
  val pollPages: Seq[Seq[Ac]] =
    Seq(aircraft.slice(0, 4), aircraft.slice(4, 8), aircraft.slice(8, 11))

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One reference-shaped REST envelope (task.ts:131-134) serializing these
    * aircraft as the response body text. Optional fields are omitted when
    * None (TypeBox `Type.Optional`), and `alt_baro` keeps the API's
    * number|string union — numeric values are emitted as JSON NUMBERS,
    * "ground" as a string — so V2's union seam is exercised through real
    * JSON parsing, not just createDataFrame. The fixture `seq` is NOT
    * serialized: arrival order is re-derived downstream from (snapshot
    * arrival_idx, array position), exactly as the reference's Map-insert
    * order. */
  def envelopeJson(acs: Seq[Ac]): String = {
    def s(n: String, v: Option[String]) = v.map(x => s""""$n":${jsonStr(x)}""")
    def d(n: String, v: Option[Double]) = v.map(x => s""""$n":$x""")
    val objs = acs.map { a =>
      val altBaro = a.alt_baro.map { v =>
        if (v == "ground") s""""alt_baro":${jsonStr(v)}"""
        else s""""alt_baro":$v""" // numeric union arm, as the API sends it
      }
      Seq(
        Some(s""""hex":${jsonStr(a.hex)}"""),
        Some(s""""type":${jsonStr(a.`type`)}"""),
        s("group", a.group), s("flight", a.flight), s("r", a.r), s("t", a.t),
        d("dbFlags", a.dbFlags), altBaro, d("alt_geom", a.alt_geom),
        d("gs", a.gs), d("track", a.track), d("baro_rate", a.baro_rate),
        s("squawk", a.squawk), s("emergency", a.emergency),
        s("category", a.category), d("nav_qnh", a.nav_qnh),
        d("nav_altitude_mcp", a.nav_altitude_mcp),
        d("nav_heading", a.nav_heading),
        Some(s""""lat":${a.lat}"""), Some(s""""lon":${a.lon}"""),
        Some(s""""seen_pos":${a.seen_pos}"""), Some(s""""seen":${a.seen}"""),
        d("dst", a.dst)
      ).flatten.mkString("{", ",", "}")
    }
    s"""{"msg":"ok","ac":[${objs.mkString(",")}]}"""
  }

  // ---- DuckDB-side rendering ------------------------------------------

  private def sqlStr(v: Option[String]): String =
    v.map(s => "'" + s.replace("'", "''") + "'").getOrElse("CAST(NULL AS VARCHAR)")
  private def sqlNum(v: Option[Double]): String =
    v.map(d => s"CAST($d AS DOUBLE)").getOrElse("CAST(NULL AS DOUBLE)")

  /** `ac(...) AS (VALUES ...)` CTE body for DuckDB, same rows as `aircraft`. */
  def acValuesSql: String = {
    val rows = aircraft.map { a =>
      Seq(a.seq.toString, sqlStr(Some(a.hex)), sqlStr(Some(a.`type`)),
        sqlStr(a.group), sqlStr(a.flight), sqlStr(a.r), sqlStr(a.t),
        sqlNum(a.dbFlags), sqlStr(a.alt_baro), sqlNum(a.alt_geom),
        sqlNum(a.gs), sqlNum(a.track), sqlNum(a.baro_rate),
        sqlStr(a.squawk), sqlStr(a.emergency), sqlStr(a.category),
        sqlNum(a.nav_qnh), sqlNum(a.nav_altitude_mcp), sqlNum(a.nav_heading),
        sqlNum(Some(a.lat)), sqlNum(Some(a.lon)), sqlNum(Some(a.seen_pos)),
        sqlNum(Some(a.seen)), sqlNum(a.dst)).mkString("(", ", ", ")")
    }
    """ac(seq, hex, "type", "group", flight, r, t, dbFlags, alt_baro, alt_geom, gs, track, baro_rate, squawk, emergency, category, nav_qnh, nav_altitude_mcp, nav_heading, lat, lon, seen_pos, seen, dst) AS (VALUES """ +
      rows.mkString(", ") + ")"
  }

  /** `inc(...) AS (VALUES ...)` CTE body for DuckDB, same rows as `includes`. */
  def includesValuesSql: String = {
    val rows = includes.map { i =>
      Seq(i.inc_pos.toString, sqlStr(Some(i.domain)), sqlStr(i.callsign),
        sqlStr(i.registration), sqlStr(Some(i.group))).mkString("(", ", ", ")")
    }
    """inc(inc_pos, domain, callsign, registration, "group") AS (VALUES """ +
      rows.mkString(", ") + ")"
  }
}
