package graft.adsbx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators D1/D2 (SURVEY §2.4).
  *
  * The reference dedups by inserting into a JS `Map` keyed by aircraft id —
  * later array positions overwrite earlier ones (task.ts:136,187), i.e.
  * last-wins in arrival order. Arrival order is meaningless in a distributed
  * shuffle, so the engine makes it explicit with a sequence column.
  *
  * Scale notes: implemented as `max_by` hash aggregation, NOT a global
  * window — partial (map-side) aggregation combines per partition before the
  * single shuffle on the key, so skewed or 100TB inputs reduce before moving.
  */
object Dedup {

  /** D1: last-wins by `key`, ordered by `ord` (higher wins). All other
    * columns are carried via one max_by(struct). */
  def lastWins(df: DataFrame, key: String, ord: String): DataFrame = {
    val carried = df.columns.filter(c => c != key && c != ord)
    df.groupBy(col(key))
      .agg(max_by(struct(carried.map(col): _*), col(ord)).as("_r"))
      .select(col(key) +: carried.map(c => col(s"_r.`$c`").as(c)): _*)
  }

  /** First-wins variant (min_by) — used by extension queries. */
  def firstWins(df: DataFrame, key: String, ord: String): DataFrame = {
    val carried = df.columns.filter(c => c != key && c != ord)
    df.groupBy(col(key))
      .agg(min_by(struct(carried.map(col): _*), col(ord)).as("_r"))
      .select(col(key) +: carried.map(c => col(s"_r.`$c`").as(c)): _*)
  }

  /** D2: set-guarded output dedup (task.ts:215,235-238,244-247). After D1
    * the key is already unique, so this is a safety net exactly like the
    * reference's `features_ids: Set` (added in its v1.11.0). */
  def distinctByKey(df: DataFrame, key: String): DataFrame =
    df.dropDuplicates(key)
}
