package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Value + plan pins for the one-pass covariance aggregate. */
class CovarianceSpec extends SparkSpec {

  import spark.implicits._

  private def cells(vs: Seq[Seq[Double]]): Map[(Long, Long), Row] =
    Similarity.covariance(vs.map(Tuple1(_)).toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap

  test("hand-computed 2x2 covariance on a 3-vector fixture") {
    // x = (1, 2, 3), y = (2, 4, 8): mx = 2, my = 14/3
    // cov(x,x) = E[x^2] - mx^2 = 14/3 - 4 = 2/3
    // cov(x,y) = E[xy] - mx*my = 34/3 - 28/3 = 2
    // cov(y,y) = E[y^2] - my^2 = 28 - 196/9 = 56/9
    val m = cells(Seq(Seq(1.0, 2.0), Seq(2.0, 4.0), Seq(3.0, 8.0)))
    assert(m.size == 3) // upper triangle only: (0,0) (0,1) (1,1)
    assert(m((0L, 0L)).getAs[Long]("n") == 3)
    assert(math.abs(m((0L, 0L)).getAs[Double]("cov") - 2.0 / 3) < 1e-9)
    assert(math.abs(m((0L, 1L)).getAs[Double]("cov") - 2.0) < 1e-9)
    assert(math.abs(m((1L, 1L)).getAs[Double]("cov") - 56.0 / 9) < 1e-9)
  }

  test("constant dimension has zero variance and zero covariance with others") {
    val m = cells(Seq(Seq(5.0, 1.0), Seq(5.0, 2.0), Seq(5.0, 9.0)))
    assert(m((0L, 0L)).getAs[Double]("cov") == 0.0)
    assert(m((0L, 1L)).getAs[Double]("cov") == 0.0)
    assert(m((1L, 1L)).getAs[Double]("cov") > 0.0)
  }

  test("plan: single aggregation, no join, no self-join") {
    val d = Seq(Tuple1(Seq(1.0, 2.0)), Tuple1(Seq(3.0, 4.0))).toDF("v")
    val plan = Similarity.covariance(d, "v").queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"covariance must not self-join:\n$plan")
    // exactly one shuffle: the (i,j) hash-aggregate exchange (plus the
    // output orderBy's range exchange)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one hash exchange, got $exchanges:\n$plan")
  }
}
