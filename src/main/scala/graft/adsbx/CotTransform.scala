package graft.adsbx

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import JsQuirks._

/** The per-record ADS-B → Cursor-on-Target transform: operators P1-P17 of
  * SURVEY §2.3, re-expressed as native Column expressions (no UDFs, fully
  * inside whole-stage codegen).
  *
  * Each public method is one checkable operator; `flat` composes them into
  * the single fused projection the reference runs as one loop body
  * (task.ts:138-212). Catalyst fuses the whole thing into one codegen stage,
  * matching the reference's deliberate single-pass design
  * (CHANGELOG "Avoid multiple iters").
  */
object CotTransform {

  /** P1+P3: coalesced, normalized aircraft id — `(ac.r || ac.flight)
    * .toLowerCase().trim()` with JS-falsy fallback (task.ts:139,142). */
  def aircraftId(r: Column, flight: Column): Column =
    lower(trim(jsFalsyStr(r, flight)))

  /** P4+P5: GeoJSON position `[lon, lat(, alt_m)]`; geometric altitude is
    * appended in meters (ft × 0.3048) only when JS-truthy — altitude 0 ft is
    * dropped, reproducing the reference's falsy quirk (task.ts:143-146). */
  def coordinates(lon: Column, lat: Column, altGeomFt: Column): Column =
    when(jsTruthyNum(altGeomFt),
      array(lon, lat, altGeomFt * 0.3048d))
      .otherwise(array(lon, lat))

  /** P5 standalone: altitude in meters, null when absent-or-zero. */
  def altitudeMeters(altGeomFt: Column): Column =
    when(jsTruthyNum(altGeomFt), altGeomFt * 0.3048d)

  /** P7: ADS-B emitter category → CoT airframe code. 9-way switch
    * (task.ts:152-171): A0-A6 fixed wing, A7 rotorcraft, B2 lighter-than-air,
    * anything else (incl. null) → "". */
  def airframeCode(category: Column): Column =
    when(category.isin("A0", "A1", "A2", "A3", "A4", "A5", "A6"), "-F")
      .when(category === "A7", "-H")
      .when(category === "B2", "-L")
      .otherwise("")

  /** P8: civilian/military flag — `dbFlags % 2 !== 0` with an explicit
    * undefined-guard (NOT falsy: dbFlags=0 is handled as civilian,
    * task.ts:175-178). dbFlags is a JSON number (DoubleType), and JS `%`
    * is fmod keeping the dividend's sign — as is Spark's `%` on doubles —
    * so the remainder is taken on the double directly: 2.5 % 2 = 0.5 is
    * military in both, as are negatives (-3.5 % 2 = -1.5). (NaN can't
    * arrive through validated JSON, so its JS quirk is out of scope.) */
  def civMilFlag(dbFlags: Column): Column =
    when(dbFlags.isNotNull && (dbFlags % 2) =!= 0, "-M")
      .otherwise("-C")

  /** P9: emergency → hostile flag, gated on config (task.ts:182-185). */
  def emergencyFlag(emergency: Column, emergencyHostile: Boolean): Column =
    when(lit(emergencyHostile) && emergency.isNotNull && emergency =!= "none", "-h")
      .otherwise("-f")

  /** P10: CoT type string `'a' + emerg + '-A' + civmil + airframe`
    * (task.ts:191), e.g. "a-f-A-C-F". */
  def cotType(emerg: Column, civmil: Column, airframe: Column): Column =
    concat(lit("a"), emerg, lit("-A"), civmil, airframe)

  /** P11: callsign `(ac.flight || '').trim()` (task.ts:192). */
  def callsign(flight: Column): Column =
    trim(jsFalsyStr(flight, lit("")))

  /** P13: ground speed kt → m/s with a nullish sentinel — `gs = 0` is kept
    * as a real 0 speed (task.ts:195). */
  def speedMs(gs: Column): Column =
    jsNullish(gs, lit(9999999.0d)) * 0.514444d

  /** P14: course with a FALSY sentinel — heading 0° (due north) becomes
    * 9999999.0; a real data bug in the reference, reproduced for fidelity
    * (task.ts:196, SURVEY §2.8). */
  def course(track: Column): Column =
    jsFalsyNum(track, lit(9999999.0d))

  /** P16: six-line human-readable remarks block (task.ts:198-205). */
  def remarks(flight: Column, r: Column, t: Column, category: Column,
              emergency: Column, squawk: Column): Column = {
    def line(label: String, c: Column): Column =
      concat(lit(label + ": "), trim(jsFalsyStr(c, lit("Unknown"))))
    concat_ws("\n",
      line("Flight", flight), line("Registration", r), line("Type", t),
      line("Category", category), line("Emergency", emergency),
      line("Squawk", squawk))
  }

  /** P2+P6 + P1..P16 fused: the full flat projection. Input: a DataFrame
    * with `Schemas.adsbResponse` columns. Output columns:
    * id, cot_type, callsign, speed, course, remarks, coordinates, alt_m,
    * metadata (full input record struct, task.ts:197) + passthrough lon/lat.
    *
    * Scale: pure narrow projection + filter — no shuffle; filters are
    * pushed to the scan by Catalyst when reading from files.
    */
  def flat(df: DataFrame, emergencyHostile: Boolean): DataFrame =
    derived(keyed(df), emergencyHostile)

  /** P1-P3 + the P2/P6 drop-filters — `flat`'s dedup-key half, split out
    * (r16 optimization round) so Pipeline.run can place D1's last-wins
    * BEFORE the heavy P4-P17 derivation: exactly the oracle's CTE order
    * (ident → filt → dedup → the flat projection). */
  def keyed(df: DataFrame): DataFrame =
    df.withColumn("id", aircraftId(col("r"), col("flight")))
      // P2: drop when both r and flight are JS-falsy; P6: drop when the
      // normalized id trims to empty (whitespace-only flight, task.ts:140,148)
      .filter(col("id").isNotNull && length(col("id")) > 0)

  /** P4-P17 over rows that already carry `id` — `flat`'s derivation half.
    * Every column is a row-wise function of the raw record, so it commutes
    * with D1's last-wins (the winner's derivations equal deriving first
    * and deduplicating after); D1 carries the raw fields untouched, so the
    * P15 metadata embed still captures the pristine input record. */
  def derived(df: DataFrame, emergencyHostile: Boolean): DataFrame = {
    val metaCols = Schemas.adsbResponse.fieldNames.filter(df.columns.contains)
    df
      // P15: capture the pristine input record before any derivation
      .withColumn("metadata", struct(metaCols.map(col): _*))
      .withColumn("airframe", airframeCode(col("category")))
      .withColumn("civmil", civMilFlag(col("dbFlags")))
      .withColumn("emerg", emergencyFlag(col("emergency"), emergencyHostile))
      .withColumn("cot_type", cotType(col("emerg"), col("civmil"), col("airframe")))
      .withColumn("callsign", callsign(col("flight")))
      .withColumn("speed", speedMs(col("gs")))
      .withColumn("course", course(col("track")))
      .withColumn("remarks", remarks(col("flight"), col("r"), col("t"),
        col("category"), col("emergency"), col("squawk")))
      .withColumn("coordinates", coordinates(col("lon"), col("lat"), col("alt_geom")))
      .withColumn("alt_m", altitudeMeters(col("alt_geom")))
  }

  /** P12+P17: assemble the nested GeoJSON Feature struct (task.ts:187-211).
    * `time`/`start` are processing time (`new Date()`, task.ts:193-194) —
    * current_timestamp(), identical for both fields. */
  def feature(df: DataFrame): DataFrame =
    df.withColumn("feature", struct(
      col("id"),
      lit("Feature").as("type"),
      struct(
        col("cot_type").as("type"),
        col("callsign"),
        current_timestamp().as("time"),
        current_timestamp().as("start"),
        col("speed"),
        col("course"),
        col("metadata"),
        col("remarks")).as("properties"),
      struct(
        lit("Point").as("type"),
        col("coordinates")).as("geometry")))
}
