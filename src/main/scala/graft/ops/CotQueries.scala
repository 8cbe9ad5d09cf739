package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.adsbx._

/** Fidelity queries: the reference's full pipeline (P1-P17 + D1 + J1/J2/J3 +
  * D2, SURVEY §2) over the in-code quirk-matrix fixture, flattened to scalar
  * columns so the DuckDB oracle can hash-compare them. The oracle SQL
  * reproduces the same input rows via VALUES (Fixtures.acValuesSql), so both
  * engines compute over identical data.
  *
  * `time`/`start` (P12, processing time) are excluded from the verified
  * output — wall-clock is not oracle-comparable; they are covered by the
  * scalatest golden test instead.
  */
object CotQueries {

  private val flatCols = Seq("id", "cot_type", "callsign", "speed", "course",
    "remarks", "lon", "lat", "alt_m")

  private def pipeline(spark: SparkSession, filtering: Boolean,
                       emergencyHostile: Boolean): DataFrame = {
    val cfg = AdsbxConfig(includesFiltering = filtering,
      emergencyHostile = emergencyHostile)
    val out = Pipeline.run(Fixtures.aircraftDf(spark),
      Fixtures.includesDf(spark), cfg)
    val cols = if (filtering) flatCols :+ "group_out" else flatCols
    out.withColumn("group_out", col("metadata.group"))
      .select(cols.map(col): _*)
      .orderBy(col("id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cot_transform_dedup" -> ((s, _) => pipeline(s, filtering = false, emergencyHostile = false)),
    "cot_transform_hostile" -> ((s, _) => pipeline(s, filtering = false, emergencyHostile = true)),
    "cot_includes_join" -> ((s, _) => pipeline(s, filtering = true, emergencyHostile = false)),
  )

  // ---- DuckDB oracle ----------------------------------------------------

  /** P1-P3, P6 + D1 as SQL: id derivation, falsy fallback, filters,
    * last-wins dedup by (id, seq). */
  private def dedupCte: String =
    """ident AS (
      |  SELECT *, lower(trim(CASE WHEN r IS NULL OR r = '' THEN flight ELSE r END)) AS id
      |  FROM ac
      |  WHERE (CASE WHEN r IS NULL OR r = '' THEN flight ELSE r END) IS NOT NULL
      |), filt AS (
      |  SELECT * FROM ident WHERE length(id) > 0
      |), dedup AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn FROM filt
      |  ) WHERE rn = 1
      |)""".stripMargin

  private def flatSelect(hostile: Boolean): String = {
    val emerg =
      if (hostile)
        "CASE WHEN emergency IS NOT NULL AND emergency <> 'none' THEN '-h' ELSE '-f' END"
      else "'-f'"
    s"""  'a' || ($emerg) || '-A' ||
       |  (CASE WHEN dbFlags IS NOT NULL AND CAST(dbFlags AS BIGINT) % 2 <> 0 THEN '-M' ELSE '-C' END) ||
       |  (CASE WHEN category IN ('A0','A1','A2','A3','A4','A5','A6') THEN '-F'
       |        WHEN category = 'A7' THEN '-H'
       |        WHEN category = 'B2' THEN '-L' ELSE '' END) AS cot_type,
       |  trim(coalesce(nullif(flight, ''), '')) AS callsign,
       |  (CASE WHEN gs IS NULL THEN CAST(9999999.0 AS DOUBLE) ELSE gs END) * CAST(0.514444 AS DOUBLE) AS speed,
       |  (CASE WHEN track IS NULL OR track = 0 THEN CAST(9999999.0 AS DOUBLE) ELSE track END) AS course,
       |  'Flight: '       || trim(coalesce(nullif(flight, ''), 'Unknown')) || chr(10) ||
       |  'Registration: ' || trim(coalesce(nullif(r, ''), 'Unknown')) || chr(10) ||
       |  'Type: '         || trim(coalesce(nullif(t, ''), 'Unknown')) || chr(10) ||
       |  'Category: '     || trim(coalesce(nullif(category, ''), 'Unknown')) || chr(10) ||
       |  'Emergency: '    || trim(coalesce(nullif(emergency, ''), 'Unknown')) || chr(10) ||
       |  'Squawk: '       || trim(coalesce(nullif(squawk, ''), 'Unknown')) AS remarks,
       |  lon, lat,
       |  CASE WHEN alt_geom IS NOT NULL AND alt_geom <> 0 THEN alt_geom * CAST(0.3048 AS DOUBLE) END AS alt_m""".stripMargin
  }

  private def passthroughSql(hostile: Boolean): String =
    s"""WITH ${Fixtures.acValuesSql},
       |$dedupCte
       |SELECT id,
       |${flatSelect(hostile)}
       |FROM dedup ORDER BY id""".stripMargin

  /** J2 as SQL: per registration key, last truthy callsign / group
    * independently; inner join; enrichment. */
  private def includesSql: String =
    s"""WITH ${Fixtures.acValuesSql},
       |${Fixtures.includesValuesSql},
       |$dedupCte,
       |keys AS (
       |  SELECT DISTINCT lower(trim(registration)) AS inc_key FROM inc
       |  WHERE registration IS NOT NULL AND registration <> ''
       |), last_cs AS (
       |  SELECT lower(trim(registration)) AS inc_key, arg_max(callsign, inc_pos) AS inc_callsign
       |  FROM inc WHERE registration IS NOT NULL AND registration <> ''
       |    AND callsign IS NOT NULL AND callsign <> '' GROUP BY 1
       |), last_g AS (
       |  SELECT lower(trim(registration)) AS inc_key, arg_max("group", inc_pos) AS inc_group
       |  FROM inc WHERE registration IS NOT NULL AND registration <> ''
       |    AND "group" IS NOT NULL AND "group" <> '' GROUP BY 1
       |), probe AS (
       |  SELECT k.inc_key, c.inc_callsign, g.inc_group FROM keys k
       |  LEFT JOIN last_cs c ON k.inc_key = c.inc_key
       |  LEFT JOIN last_g g ON k.inc_key = g.inc_key
       |)
       |SELECT d.id,
       |${flatSelect(hostile = false).replace("trim(coalesce(nullif(flight, ''), '')) AS callsign",
           "coalesce(p.inc_callsign, trim(coalesce(nullif(flight, ''), ''))) AS callsign")}
       |, coalesce(p.inc_group, d."group") AS group_out
       |FROM dedup d JOIN probe p ON d.id = p.inc_key
       |ORDER BY d.id""".stripMargin

  val oracles: Map[String, String] = Map(
    "cot_transform_dedup" -> passthroughSql(hostile = false),
    "cot_transform_hostile" -> passthroughSql(hostile = true),
    "cot_includes_join" -> includesSql,
  )
}
