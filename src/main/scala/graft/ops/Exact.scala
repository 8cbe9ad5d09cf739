package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-exact aggregation helpers.
  *
  * Summing doubles is order-sensitive: Spark's partial/final aggregation and
  * DuckDB's parallel sum add in different orders, so raw double sums differ
  * in low bits and fail a hash-compare. Decimal arithmetic is exact and
  * associative, so `sum(cast(x as decimal))` yields bit-identical results in
  * both engines regardless of partitioning; casting the result back to
  * double keeps the visible schema stable (DOUBLE everywhere).
  *
  * The matching DuckDB oracle pattern is emitted by `sumSql`/`avgSql`.
  *
  * Scale note: decimal sums stay inside whole-stage codegen and partial
  * aggregation; the cost over a double sum is small and the determinism is
  * required for verification — at 100 TB the same property makes results
  * reproducible across cluster sizes.
  */
object Exact {
  val dec: DecimalType = DecimalType(30, 6)

  /** Order-insensitive exact sum of a double expression, visible as DOUBLE. */
  def sumD(c: Column): Column = sum(c.cast(dec)).cast("double")

  /** Exact average (sum/count on non-null), visible as DOUBLE. */
  def avgD(c: Column): Column = (sum(c.cast(dec)).cast("double") / count(c))

  /** DuckDB equivalent of sumD. */
  def sumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE)"

  /** DuckDB equivalent of avgD. */
  def avgSql(expr: String): String =
    s"(CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE) / COUNT($expr))"
}
