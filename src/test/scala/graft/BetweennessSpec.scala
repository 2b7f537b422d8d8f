package graft

import graft.operators.BigGraphOps
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Pins q_betweenness_big's estimator semantics against a from-scratch
  * per-root Brandes run (plain Scala BFS + backward dependency pass) on
  * the sf0.001 co-purchase graph. The gate aggregates through exact
  * decimal casts while the mirror sums doubles in arbitrary order, so
  * values compare at 1e-6 (double noise is ~1e-10 at these magnitudes),
  * not bit-for-bit — the bit-exact cross-engine check is the DuckDB
  * oracle's job. */
class BetweennessSpec extends AnyFunSuite {
  import SparkTestBase._

  test("q_betweenness_big matches a from-scratch bounded Brandes mirror") {
    val edges = BigGraphOps.coEdges(spark, sfDir)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, Array[Long]] =
      edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val roots = edges.map(_._1).distinct.sorted.take(BigGraphOps.BC_ROOTS)
    val H = BigGraphOps.BC_HOPS
    val bc = mutable.HashMap.empty[Long, Double].withDefaultValue(0.0)
    roots.foreach { r =>
      val dist = mutable.HashMap(r -> 0)
      val sigma = mutable.HashMap(r -> 1L).withDefaultValue(0L)
      var frontier = Seq(r)
      val levels = mutable.ArrayBuffer(Seq(r))
      for (h <- 1 to H) {
        val next = mutable.LinkedHashSet.empty[Long]
        frontier.foreach { v =>
          adj.getOrElse(v, Array.empty).foreach { w =>
            if (!dist.contains(w) || dist(w) == h) {
              dist(w) = h
              sigma(w) = sigma(w) + sigma(v)
              next += w
            }
          }
        }
        frontier = next.toSeq
        levels += frontier
      }
      val delta = mutable.HashMap.empty[Long, Double].withDefaultValue(0.0)
      for (l <- (H - 1) to 1 by -1) {
        levels(l).foreach { v =>
          var acc = 0.0
          adj.getOrElse(v, Array.empty).foreach { w =>
            if (dist.get(w).contains(l + 1))
              acc += (sigma(v).toDouble / sigma(w)) * (1.0 + delta(w))
          }
          delta(v) = acc
        }
      }
      (1 to H).foreach(l => levels(l).foreach(v => bc(v) += delta(v)))
    }
    val got = SparkEntry.queries("q_betweenness_big")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Double]("bc")))
    assert(got.length <= BigGraphOps.BC_TOP && got.nonEmpty)
    // gate output is (bc desc, node asc)-ordered
    got.sliding(2).foreach {
      case Array((n1, b1), (n2, b2)) =>
        assert(b1 > b2 || (b1 == b2 && n1 < n2), "report ordering broken")
      case _ =>
    }
    got.foreach { case (node, b) =>
      assert(math.abs(b - bc(node)) < 1e-6,
        s"node $node: gate $b vs mirror ${bc(node)}")
    }
    // the report must actually be the global top slice: no unlisted node
    // may beat the smallest listed score by more than rounding noise
    val floor = got.map(_._2).min
    val listed = got.map(_._1).toSet
    bc.foreach { case (node, b) =>
      if (!listed.contains(node))
        assert(b <= floor + 1e-6, s"node $node ($b) missing from top slice")
    }
  }
}
