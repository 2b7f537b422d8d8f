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
}
