package graft.ops

import graft.SparkSpec

/** Pigeonhole-completeness and plan pins for the PassJoin ed<=1 matcher.
  * (Corpus-wide completeness vs brute force is the DuckDB oracle's job;
  * these cases target the edit positions where the segment argument is
  * easiest to get wrong — first char, split boundary, last char.) */
class FuzzyMatchSpec extends SparkSpec {

  import spark.implicits._

  private val catalog = Seq("red widget", "blue bolt", "small ring")
    .toDF("name")

  private def matches(dirty: (Long, String)*): Set[(Long, String, Long)] =
    FuzzyMatch.matchEd1(dirty.toDF("id", "s"), "id", "s", catalog, "name")
      .collect()
      .map(r => (r.getLong(0), r.getAs[String]("name"), r.getAs[Long]("dist")))
      .toSet

  test("edits at every critical position are found") {
    val m = matches(
      1L -> "red widget",  // exact
      2L -> "Xed widget",  // substitution at FIRST char (destroys seg1 head)
      3L -> "red Xidget",  // substitution just after the split boundary
      4L -> "red widgeX",  // substitution at LAST char
      5L -> "rd widget",   // deletion inside seg1 (len 9: probes len-1..len+1)
      6L -> "red widgets", // insertion at the end
      7L -> "redX widget", // insertion at the split boundary
      8L -> "green cog")   // nothing within distance 1
    assert(m == Set(
      (1L, "red widget", 0L),
      (2L, "red widget", 1L),
      (3L, "red widget", 1L),
      (4L, "red widget", 1L),
      (5L, "red widget", 1L),
      (6L, "red widget", 1L),
      (7L, "red widget", 1L)))
  }

  test("a dirty string can match several catalog names") {
    val cat2 = Seq("red bolt", "bed bolt").toDF("name")
    val m = FuzzyMatch.matchEd1(Seq((1L, "red bolt")).toDF("id", "s"),
        "id", "s", cat2, "name")
      .collect().map(_.getAs[String]("name")).toSet
    assert(m == Set("red bolt", "bed bolt"))
  }

  test("plan: equi-joins only — no cartesian, no nested loop") {
    val plan = FuzzyMatch.matchEd1(
        Seq((1L, "red widget")).toDF("id", "s"), "id", "s", catalog, "name")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
