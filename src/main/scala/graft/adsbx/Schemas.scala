package graft.adsbx

import org.apache.spark.sql.types._

/** Declared schemas for the ADS-B → CoT pipeline, transcribed from the
  * reference's TypeBox declarations (reference: task.ts:6-93).
  *
  * Decisions (SURVEY §1.2-1.3):
  *   - `alt_baro` is a JSON union `number | string` (the ADSBX API returns
  *     the literal string "ground" for grounded aircraft, task.ts:77). Spark
  *     has no union type, so it is carried as StringType and cast on demand
  *     (a numeric view is `when(col =!= "ground", col.cast("double"))`).
  *   - TypeBox `Type.Optional(...)` → `nullable = true`.
  *   - JSON numbers → DoubleType throughout (task.ts:76-92).
  */
object Schemas {

  /** One aircraft record — reference task.ts:66-93 (`ADSBResponse`). */
  val adsbResponse: StructType = StructType(Seq(
    StructField("hex", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("group", StringType), // filled by the includes join (task.ts:69-72,231-233)
    StructField("flight", StringType),
    StructField("r", StringType),
    StructField("t", StringType),
    StructField("dbFlags", DoubleType),
    StructField("alt_baro", StringType), // union number|string — see scaladoc
    StructField("alt_geom", DoubleType),
    StructField("gs", DoubleType),
    StructField("track", DoubleType),
    StructField("baro_rate", DoubleType),
    StructField("squawk", StringType),
    StructField("emergency", StringType),
    StructField("category", StringType),
    StructField("nav_qnh", DoubleType),
    StructField("nav_altitude_mcp", DoubleType),
    StructField("nav_heading", DoubleType),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("seen_pos", DoubleType, nullable = false),
    StructField("seen", DoubleType, nullable = false),
    StructField("dst", DoubleType),
  ))

  /** API response envelope `{msg, ac[]}` — reference task.ts:131-134. */
  val envelope: StructType = StructType(Seq(
    StructField("msg", StringType, nullable = false),
    StructField("ac", ArrayType(adsbResponse), nullable = false),
  ))

  /** One allow-list entry — reference task.ts:26-61 (`ADSBX_INCLUDES`). */
  val include: StructType = StructType(Seq(
    StructField("domain", StringType, nullable = false),       // EMS | FIRE | LAW
    StructField("callsign", StringType),
    StructField("registration", StringType),
    StructField("group", StringType, nullable = false),        // 22-value enum
  ))

  /** The 22-value `group` enum (task.ts:36-59) — exposed for validation. */
  val includeGroups: Seq[String] = Seq(
    "UNKNOWN", "CIV_FIXED_CAP", "CIV_UAS", "EMS_ROTOR", "EMS_ROTOR_RESCUE",
    "FIRE_AIR_ATTACK", "FIRE_AIR_TANKER", "FIRE_INTEL", "FIRE_LEAD_PLANE",
    "FIRE_ROTOR", "FIRE_ROTOR_AIR_ATTACK", "FIRE_ROTOR_INTEL",
    "FIRE_ROTOR_RESCUE", "FIRE_SEAT", "FIRE_SMOKE_JMPR", "LAW_FIXED_WING",
    "LAW_ROTOR_RESCUE", "LE_FIXED_WING", "LE_FIXED_WING_ISR", "LE_ROTOR",
    "LE_ROTOR_RESCUE", "LE_UAS")
}

/** Task configuration (reference `Env`, task.ts:6-64) as a typed case class.
  * Platform glue (API url/token) is retained for API fidelity but unused by
  * the file/fixture sources. */
final case class AdsbxConfig(
    queryLatLon: String = "40.14401,-119.81204", // task.ts:7-10
    queryDist: String = "2650",                  // task.ts:11-14
    api: String = "https://adsbexchange.com/api/aircraft",
    token: String = "",
    includesFiltering: Boolean = true,           // task.ts:23-25
    includes: Seq[Include] = Seq.empty,          // task.ts:26-61
    emergencyHostile: Boolean = false,           // task.ts:62
    debug: Boolean = false)                      // task.ts:63 (dead config)

final case class Include(
    domain: String,
    callsign: Option[String],
    registration: Option[String],
    group: String = "UNKNOWN")
