package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** `graft_geo_within(lat1, lon1, lat2, lon2, t)` — strictly-within planar
  * proximity predicate: `(lat1-lat2)² + (lon1-lon2)² < t²`. A real
  * codegen'd `Predicate` (not a rewritten arithmetic tree) so the
  * optimizer rule below can RECOGNIZE proximity joins structurally —
  * exactly how production spatial extensions mark rewritable predicates.
  * Arithmetic is plain IEEE add/sub/mul, matching `GeoOps.proximityPairs`
  * and the DuckDB oracle bit-for-bit. */
case class GeoWithin(lat1: Expression, lon1: Expression,
                     lat2: Expression, lon2: Expression,
                     threshold: Expression) extends Expression with Predicate {

  override def children: Seq[Expression] = Seq(lat1, lon1, lat2, lon2, threshold)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_geo_within"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 5 double arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else {
      val Seq(a, b, c, d, t) = vs.map(_.asInstanceOf[Double])
      val (dla, dlo) = (a - c, b - d)
      dla * dla + dlo * dlo < t * t
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val anyNull = gens.map(g => s"${g.isNull}").mkString(" || ")
    val dla = ctx.freshName("dla")
    val dlo = ctx.freshName("dlo")
    ev.copy(code = code"""
      ${gens.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = $anyNull;
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        double $dla = ${gens(0).value} - ${gens(2).value};
        double $dlo = ${gens(1).value} - ${gens(3).value};
        ${ev.value} = $dla * $dla + $dlo * $dlo <
          ${gens(4).value} * ${gens(4).value};
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3),
      newChildren(4))
}

object GeoWithin {
  private val fid = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_geo_within")

  private[graft] val builder: Seq[Expression] => Expression = children => {
    require(children.size == 5,
      s"graft_geo_within requires exactly 5 arguments, got ${children.size}")
    GeoWithin(children(0), children(1), children(2), children(3), children(4))
  }

  /** Idempotently register `graft_geo_within` on the session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(fid))
      reg.registerFunction(fid,
        new ExpressionInfo(classOf[GeoWithin].getName, "graft_geo_within"),
        builder)
  }

  /** within(lat1, lon1, lat2, lon2, t); requires `register(spark)`. */
  def within(lat1: org.apache.spark.sql.Column, lon1: org.apache.spark.sql.Column,
             lat2: org.apache.spark.sql.Column, lon2: org.apache.spark.sql.Column,
             t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_geo_within",
      lat1, lon1, lat2, lon2, t)
}

/** Optimizer rule: a join whose only link between the sides is a
  * `GeoWithin` predicate would plan as a nested-loop/cartesian — O(|L|·|R|)
  * comparisons, the classic spatial-join scale killer. This rule rewrites
  * it into the grid-cell form `GeoOps.proximityPairs` builds by hand:
  * the left side EXPLODES to its 3×3 neighbor cells (cell size = the
  * threshold, so the pigeonhole argument guarantees no qualifying pair
  * is lost — see proximityCandidates' scaladoc for the fp-boundary
  * analysis), the right side keeps its home cell, and the join becomes a
  * hash EQUI-join on the cell key with the original predicate as
  * residual. Each qualifying pair matches on exactly ONE key (the
  * right's home cell — the 9 exploded keys are distinct), so no
  * duplicates are introduced and results are identical by construction.
  *
  * Register per session via `spark.experimental.extraOptimizations` or
  * `SparkSessionExtensions.injectOptimizerRule` (GraftExtensions). This
  * is the (c) tier of SURVEY §7.3's preference order with a concrete
  * performance claim: candidate pairs drop from |L|·|R| to the
  * co-located-cell volume, and the physical plan flips from
  * BroadcastNestedLoopJoin to a shuffled hash/sort-merge join.
  */
object GeoJoinRewrite extends Rule[LogicalPlan] {

  // cell-key packing: (cx + dx) * STRIDE + (cy + dy). Collisions would
  // only ADD candidates (residual predicate still decides), never lose
  // them — equality of (cx, cy) always implies equality of the packed key
  private val STRIDE = 1000003L

  /** Diagnostic for the rule's worst failure mode — a GeoWithin join left
    * on the O(|L|·|R|) nested-loop path because its threshold is not a
    * foldable positive Double. Counted (not just logged) so the fallback
    * is OBSERVABLE: GeoJoinRewriteSpec pins that it fires, and a
    * production deployment can alert on it. Monotone across the session;
    * optimizer batches run to fixpoint, so one query may add several. */
  private[graft] val fallbackCount = new java.util.concurrent.atomic.AtomicLong

  private def key(lat: Expression, lon: Expression, t: Double,
                  dx: Long, dy: Long): Expression = {
    def cellOf(c: Expression) = Floor(Divide(c, Literal(t)))
    Add(Multiply(Add(cellOf(lat), Literal(dx)), Literal(STRIDE)),
      Add(cellOf(lon), Literal(dy)))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        // idempotence guard: our own rewrite leaves a graft_cell equi-key
        // in the condition; the extraOptimizations batch runs to fixpoint
        if !cond.references.exists(_.name == "graft_cell") =>
      val parts = conjuncts(cond)
      // Accept any FOLDABLE positive threshold, not just a raw Double
      // literal — lit(0.05)*lit(1.0) or a config-derived cast must still
      // take the grid path, not silently fall back to the O(L·R)
      // nested loop. Non-positive or non-foldable thresholds keep the
      // original join (a cell size <= 0 has no pigeonhole guarantee).
      def threshold(e: Expression): Option[Double] =
        if (!e.foldable || e.dataType != DoubleType) None
        else Option(e.eval()).collect { case t: Double if t > 0d => t }
      parts.collectFirst { case g: GeoWithin => g } match {
        case Some(g @ GeoWithin(a, b, c, d, te)) if threshold(te).isDefined =>
          val t = threshold(te).get
          // which side owns which coordinate pair?
          val sides =
            if (Seq(a, b).forall(_.references.subsetOf(left.outputSet)) &&
              Seq(c, d).forall(_.references.subsetOf(right.outputSet)))
              Some(((a, b), (c, d)))
            else if (Seq(c, d).forall(_.references.subsetOf(left.outputSet)) &&
              Seq(a, b).forall(_.references.subsetOf(right.outputSet)))
              Some(((c, d), (a, b)))
            else None
          sides match {
            case Some(((llat, llon), (rlat, rlon))) =>
              val cellAttr = AttributeReference("graft_cell", LongType)()
              val exploded = Generate(
                Explode(CreateArray(
                  (for (dx <- -1L to 1L; dy <- -1L to 1L)
                    yield key(llat, llon, t, dx, dy)).toSeq)),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(cellAttr), child = left)
              val rKey = Alias(key(rlat, rlon, t, 0L, 0L), "graft_cell_r")()
              val projRight = Project(right.output :+ rKey, right)
              // never broadcast the EXPLODED branch: Generate keeps its
              // child's size estimate, so the planner under-counts it 9x
              // and happily builds a broadcast hash relation from the fat
              // side (observed at the 10x rehearsal: a 1.35M-row
              // broadcast). The home-cell side stays broadcastable, so
              // small dims still get a broadcast join.
              val noBcastLeft = JoinHint(
                Some(HintInfo(strategy = Some(NO_BROADCAST_HASH))),
                hint.rightHint)
              val rewritten = Join(exploded, projRight, Inner,
                Some(And(EqualTo(cellAttr, rKey.toAttribute), cond)), noBcastLeft)
              Project(j.output, rewritten)
            case None => j
          }
        case Some(g: GeoWithin) =>
          fallbackCount.incrementAndGet()
          logWarning(s"GeoWithin join left unrewritten (threshold not a " +
            s"foldable positive Double): $g — falling back to nested loop")
          j
        case _ => j
      }
  }
}
