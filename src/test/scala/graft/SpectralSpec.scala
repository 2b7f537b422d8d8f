package graft

import graft.operators.BigGraphOps
import org.scalatest.funsuite.AnyFunSuite

/** Katz walk-counts and HITS hub/authority against from-scratch
  * driver-side mirrors on the same co-purchase edge relation — the
  * integer recurrences recomputed with plain Maps, no shared code with
  * the gated dataflow. Both gates are exact integer arithmetic, so the
  * assertion is equality, not tolerance. */
class SpectralSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val edges: Seq[(Long, Long)] =
    BigGraphOps.coEdges(spark, sfDir).select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  private lazy val nodes: Set[Long] =
    edges.flatMap(p => Seq(p._1, p._2)).toSet

  test("q_katz equals the walk-count mirror (exact integers)") {
    var x = nodes.map(_ -> BigInt(1)).toMap
    for (_ <- 1 to BigGraphOps.KATZ_ITERS) {
      val in = edges.groupBy(_._2).view
        .mapValues(_.map(e => x(e._1)).sum).toMap
      x = nodes.map(n => n -> (BigInt(1) + in.getOrElse(n, BigInt(0)))).toMap
    }
    val got = BigGraphOps.qKatz(spark, sfDir).collect()
      .map(r => r.getLong(0) -> BigInt(r.getLong(1))).toMap
    assert(got == x)
    // depth-1 sanity: katz at 1 iter would be in-degree + 1; at 4 iters
    // every score still dominates in-degree + 1
    val indeg = edges.groupBy(_._2).view.mapValues(_.size).toMap
    assert(nodes.forall(n => got(n) >= BigInt(indeg.getOrElse(n, 0) + 1)))
  }

  test("q_hits equals the mutual-reinforcement mirror (exact integers)") {
    var h = nodes.map(_ -> BigInt(1)).toMap
    var a = nodes.map(_ -> BigInt(0)).toMap
    for (_ <- 1 to BigGraphOps.HITS_ITERS) {
      a = nodes.map { n =>
        n -> edges.filter(_._2 == n).map(e => h(e._1)).sum
      }.toMap
      h = nodes.map { n =>
        n -> edges.filter(_._1 == n).map(e => a(e._2)).sum
      }.toMap
    }
    val got = BigGraphOps.qHits(spark, sfDir).collect()
      .map(r => (r.getLong(0), (BigInt(r.getLong(1)), BigInt(r.getLong(2)))))
      .toMap
    assert(got.view.mapValues(_._1).toMap == h)
    assert(got.view.mapValues(_._2).toMap == a)
    // the DAG property (dst > src) makes sources pure hubs: a node with
    // no in-edges must have authority 0
    val hasIn = edges.map(_._2).toSet
    assert(nodes.filterNot(hasIn).forall(n => got(n)._2 == 0))
  }

  test("q_local_clustering: corner credits sum to 3x the global triangle count") {
    val rows = BigGraphOps.qLocalClustering(spark, sfDir).collect()
    val totalTri = rows.map(_.getLong(2)).sum
    val global = BigGraphOps.qClusteringBig(spark, sfDir).collect().head
    assert(totalTri == 3 * global.getLong(1))
    assert(rows.forall { r =>
      val lcc = r.getDouble(3); lcc >= 0.0 && lcc <= 1.0
    })
  }

  test("q_pca_power converges to the dominant eigenpair of the dense covariance") {
    // independent path: materialize the FULL DxD covariance from collected
    // embeddings (direct two-pass formula, plain doubles) and power-iterate
    // it 500 rounds — then the gate's 12-round distributed matvec must agree
    // up to sign on the component and closely on the eigenvalue
    val vs = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vs.length; val dim = vs.head.length
    val m = Array.tabulate(dim)(i => vs.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      vs.map(v => (v(i) - m(i)) * (v(j) - m(j))).sum / n)
    var x = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lam = 0.0
    for (_ <- 1 to 500) {
      val y = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * x(j)).sum)
      lam = math.sqrt(y.map(z => z * z).sum)
      x = y.map(_ / lam)
    }
    val got = graft.operators.VectorOps.qPcaPower(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1 to dim), "one row per dimension")
    val gl = got.map(_._2)
    // unit loading vector
    assert(math.abs(gl.map(z => z * z).sum - 1.0) < 1e-4, "loadings not unit-norm")
    // direction agreement up to sign
    val cosAbs = math.abs(gl.zip(x).map { case (a, b) => a * b }.sum)
    assert(cosAbs > 0.999, s"component misaligned with dense eigenvector: $cosAbs")
    val eig = got.head._3
    assert(math.abs(eig - lam) / lam < 1e-3, s"eigenvalue off: $eig vs $lam")
    // explained share consistent with the dense trace, and in (0, 1]
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val expl = got.head._4
    assert(expl > 0.0 && expl <= 1.0)
    assert(math.abs(expl - eig / trace) < 1e-4, s"expl_var inconsistent: $expl")
  }

  test("q_pca_scores moments are consistent with the trained eigenpair") {
    // Cross-gate invariants that hold regardless of the component's sign:
    // scores are (v - m)·x, so the GLOBAL score mean is 0 (centering) and
    // the pooled variance Σ n_l (sd_l² + mean_l²)/N − mean² is xᵀCx = the
    // eigenvalue q_pca_power reports. Label partition must be exhaustive.
    val rows = graft.operators.VectorOps.qPcaScores(spark, sfDir).collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_._2).sum == total, "per-label counts must partition the corpus")
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(_._4 >= 0.0), "sd must be non-negative")
    val n = total.toDouble
    val gMean = rows.map(r => r._2 * r._3).sum / n
    assert(math.abs(gMean) < 1e-4, s"centered scores must have ~0 mean: $gMean")
    val pooledVar =
      rows.map(r => r._2 * (r._4 * r._4 + r._3 * r._3)).sum / n - gMean * gMean
    val eig = graft.operators.VectorOps.qPcaPower(spark, sfDir)
      .collect().head.getDouble(2)
    assert(math.abs(pooledVar - eig) / eig < 1e-3,
      s"pooled PC1 variance $pooledVar must equal the eigenvalue $eig")
  }
}
