package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {

  test("graft_dot: matches the HOF fold bit-for-bit (incl. codegen path)") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double]),
      (Seq(1e300, 1.0), Seq(1e300, 1.0))).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0d), (acc, x) => acc + x)
    val rows = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"), hof.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot: null array yields null; SQL registration works") {
    VectorFunctions.register(spark)
    import spark.implicits._
    Seq((Seq(1.0), Option.empty[Seq[Double]])).toDF("a", "b")
      .createOrReplaceTempView("vf_null")
    val r = spark.sql("SELECT graft_dot(a, b) AS d FROM vf_null").head()
    assert(r.isNullAt(0))
  }

  test("graft_dot: interpreted eval agrees with codegen") {
    val e = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.5, 2.5),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(2.0, 4.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 13.0)
  }
}
