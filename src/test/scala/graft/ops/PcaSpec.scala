package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins sim_pca_project beyond the oracle's replay gate: on a covariance
  * with a KNOWN dominant direction the power iteration must recover it,
  * and the corpus query must project onto a unit-norm component with the
  * riding eigenvalue/trace share consistent. */
class PcaSpec extends SparkSpec {

  test("power iteration recovers a planted dominant eigenvector") {
    // diag(10, 1, 1, 0.5) plus a small symmetric coupling: the dominant
    // eigenvector is ~e0; eigenvalue ~10
    val c = Array(
      Array(10.0, 0.3, 0.0, 0.1),
      Array(0.3, 1.0, 0.2, 0.0),
      Array(0.0, 0.2, 1.0, 0.0),
      Array(0.1, 0.0, 0.0, 0.5))
    val (v, lam, lamPrev) = Similarity.powerIterate(c)
    assert(math.abs(lam - lamPrev) / lam < 1e-6, s"not converged: $lamPrev -> $lam")
    assert(math.abs(v(0)) > 0.99, s"component not aligned with e0: ${v.toSeq}")
    assert(math.abs(lam - 10.0) < 0.2, s"eigenvalue off: $lam")
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"component not unit norm: $norm")
  }

  test("sim_pca_project: unit component, eigenvalue <= trace, exhaustive labels") {
    val df = graft.SparkEntry.queries("sim_pca_project")(
      spark, "/root/testdata/sf0.001").collect()
    assert(df.nonEmpty)
    val eig = df.head.getAs[Double]("eig1")
    val ve = df.head.getAs[Double]("var_explained")
    assert(eig > 0 && ve > 0 && ve <= 1.0,
      s"eigenvalue/trace share out of range: eig=$eig var_explained=$ve")
    // projections are bounded by the max vector norm (Cauchy-Schwarz,
    // unit component)
    val maxAbs = df.map(r => math.max(math.abs(r.getAs[Double]("min_pc1")),
      math.abs(r.getAs[Double]("max_pc1")))).max
    assert(maxAbs < 10.0, s"projection magnitude implausible: $maxAbs")
  }
}
