package graft.adsbx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import JsQuirks._

/** J1/J2/J3 (SURVEY §2.5): the allow-list filter + enrichment stage
  * (task.ts:217-249).
  *
  * Reference semantics being reproduced exactly:
  *   - includes without a truthy `registration` are skipped (task.ts:219);
  *   - probe key is `lower(trim(registration))` against the COALESCED
  *     aircraft id (`r || flight`) — an include can match an aircraft whose
  *     flight callsign equals the registration (task.ts:139,221-223);
  *   - inner semi-join semantics: only matched aircraft are emitted, once
  *     per id (the `features_ids` Set guard, task.ts:235-238);
  *   - enrichment: `properties.callsign` is overridden by the include's
  *     callsign IF truthy (task.ts:227-229); `metadata.group` is set to the
  *     include's group IF truthy (task.ts:231-233);
  *   - when several includes share a registration, each one's mutation runs
  *     but the feature is emitted once → for each field independently, the
  *     LAST include with a truthy value wins (mutation at :227-233 precedes
  *     the emit-guard at :235 — SURVEY §7.4 risk 4).
  *
  * Scale notes: the includes list is operator config (≤ ~100 rows), so the
  * join is explicitly `broadcast()` — zero shuffle on the aircraft side.
  * The last-truthy-wins reduction happens on the tiny side before the join.
  */
object IncludesJoin {

  /** `includes` must carry Schemas.include columns plus `inc_pos` (the
    * config array position, which defines "last"). */
  def apply(features: DataFrame, includes: DataFrame, filtering: Boolean): DataFrame = {
    if (!filtering) return features // J3 pass-through (task.ts:241-249)

    // Per registration key: last truthy callsign and last truthy group,
    // independently (max over (pos, value) structs ignores nulls).
    val probe = includes
      .filter(jsTruthyStr(col("registration")))
      .withColumn("inc_key", lower(trim(col("registration"))))
      .groupBy("inc_key")
      .agg(
        max(when(jsTruthyStr(col("callsign")),
          struct(col("inc_pos"), col("callsign")))).as("_c"),
        max(when(jsTruthyStr(col("group")),
          struct(col("inc_pos"), col("group")))).as("_g"))
      .select(col("inc_key"),
        col("_c.callsign").as("inc_callsign"),
        col("_g.group").as("inc_group"))

    features
      .join(broadcast(probe), features("id") === probe("inc_key"), "inner")
      .withColumn("callsign",
        coalesce(col("inc_callsign"), col("callsign")))
      .withColumn("metadata",
        col("metadata").withField("group",
          coalesce(col("inc_group"), col("metadata.group"))))
      .drop("inc_key", "inc_callsign", "inc_group")
  }
}
