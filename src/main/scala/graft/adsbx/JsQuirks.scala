package graft.adsbx

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers reproducing JavaScript truthiness semantics, which the
  * reference relies on in subtly different ways per call site (SURVEY §2.8).
  *
  * JS `a || b` treats null/undefined, `""`, `0`, and `NaN` as falsy;
  * JS `a ?? b` falls through only on null/undefined. The reference mixes
  * both (task.ts:139,146,195,196), so each site must use the right helper.
  */
object JsQuirks {

  /** JS `a || b` on strings: null OR empty-string falls through
    * (task.ts:139 `ac.r || ac.flight`; task.ts:192,199-204). */
  def jsFalsyStr(c: Column, fallback: Column): Column =
    coalesce(nullif(c, lit("")), fallback)

  /** JS `a || b` on numbers: null OR 0 OR NaN falls through — this is how
    * `track = 0` (due north) becomes the 9999999.0 sentinel (task.ts:196). */
  def jsFalsyNum(c: Column, fallback: Column): Column =
    when(c.isNull || isnan(c) || c === 0d, fallback).otherwise(c)

  /** JS `if (x)` truthiness on numbers: `alt_geom = 0` (sea level) is
    * falsy, so altitude 0 is NOT appended to coordinates (task.ts:146). */
  def jsTruthyNum(c: Column): Column =
    c.isNotNull && !isnan(c) && c =!= 0d

  /** JS `a ?? b` (nullish coalescing): only null falls through — `gs = 0`
    * survives as a real speed of 0 (task.ts:195). */
  def jsNullish(c: Column, fallback: Column): Column =
    coalesce(c, fallback)

  /** JS truthiness on strings for `if (x)` guards (task.ts:219,227,231). */
  def jsTruthyStr(c: Column): Column =
    c.isNotNull && c =!= ""
}
