package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The pure-DataFrame formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * is semantically identical but higher-order functions evaluate
  * interpreted (lambda per element, no whole-stage codegen). This
  * expression generates a tight Java loop over the unsafe array data —
  * the custom-`Expression`-beats-UDF-beats-HOF preference order for hot
  * scalar kernels (SURVEY §7.3; similarity scoring is the one hot path
  * where the HOF cost shows).
  *
  * Accumulation is a sequential left fold from 0.0 — bit-identical to the
  * HOF form and to DuckDB's `list_reduce` oracle pattern.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  private val fid = FunctionIdentifier("graft_dot")

  /** Shared SQL builder (used by register() and GraftExtensions) with an
    * arity check, so a wrong-argument call fails analysis with a clear
    * message instead of an IndexOutOfBoundsException. */
  private[functions] val dotBuilder: Seq[Expression] => Expression = children => {
    require(children.size == 2,
      s"graft_dot requires exactly 2 arguments, got ${children.size}")
    DotProduct(children.head, children(1))
  }

  /** Idempotently register `graft_dot` on the session (usable from both
    * the Column API via `dot` and SQL via `graft_dot(a, b)`). */
  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(fid))
      reg.registerFunction(fid,
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        dotBuilder)
  }

  /** Dot product a·b; requires `register(spark)` once per session. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Euclidean norm via the same kernel (bit-identical to the fold form). */
  def norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))
}
