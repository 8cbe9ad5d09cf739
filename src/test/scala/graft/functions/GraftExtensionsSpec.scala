package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions(GraftExtensions) makes graft functions available in SQL") {
    // build a genuinely new session (same SparkContext) so the extension
    // path — not the imperative register() — provides the functions
    val s2 = try SparkSession.builder()
      .master(spark.sparkContext.master) // satisfies builder validation; the existing SparkContext is reused
      .withExtensions(new GraftExtensions)
      .create()
    finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
    assert(s2 ne spark)
    val dot = s2.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val topk = s2.sql(
      """SELECT graft_topk(v, id, 2) AS t FROM VALUES
        |  (1.0d, 1L), (5.0d, 2L), (3.0d, 3L) AS tab(v, id)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getLong(1))).toList
    assert(topk == List((5.0, 2L), (3.0, 3L)))
  }
}
