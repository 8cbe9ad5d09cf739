package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: installs the library's native functions
  * at session build time, so users get `graft_dot` / `graft_topk` in both
  * the Column API and SQL without per-session `register` calls:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)        // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * This is the standard integration seam for third-party engines
  * (injectFunction / injectOptimizerRule / injectPlannerStrategy).
  * Function injection covers the scalar/aggregate kernels; the one
  * optimizer rule injected is the spatial-join rewrite — the single
  * place a custom rule carries a concrete performance claim (cartesian →
  * cell equi-join; every other operator semantics is already expressible
  * as optimizer-friendly Catalyst plans, SURVEY §4.2). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      VectorFunctions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKBy].getName, "graft_topk"),
      TopKFunctions.topkBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_geo_within"),
      new ExpressionInfo(classOf[graft.plans.GeoWithin].getName, "graft_geo_within"),
      graft.plans.GeoWithin.builder))
    ext.injectOptimizerRule(_ => graft.plans.GeoJoinRewrite)
  }
}
