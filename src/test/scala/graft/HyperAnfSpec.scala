package graft

import graft.operators.BigGraphOps
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Pins q_hyperanf against the EXACT neighborhood function (all-pairs
  * bounded BFS on the collected sf0.001 graph — the thing HyperANF
  * exists to avoid at scale). The estimate must sit inside the sketch's
  * error envelope at every round, and the t=0 readout is a closed-form
  * constant (every ball is a singleton). Cross-engine bit-exactness is
  * the DuckDB oracle's job. */
class HyperAnfSpec extends AnyFunSuite {
  import SparkTestBase._

  test("q_hyperanf tracks the exact neighborhood function within sketch error") {
    val e = BigGraphOps.coEdges(spark, sfDir).select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = (e ++ e.map(_.swap)).distinct
    val adj = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = und.map(_._1).distinct
    // exact N(t) by per-node BFS, t = 0..ANF_HOPS
    val exact = Array.fill(BigGraphOps.ANF_HOPS + 1)(0L)
    nodes.foreach { s0 =>
      val dist = mutable.HashMap(s0 -> 0)
      var frontier = Seq(s0)
      exact(0) += 1
      for (t <- 1 to BigGraphOps.ANF_HOPS) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Array.empty[Long]))
          .distinct.filterNot(dist.contains)
        frontier.foreach(w => dist(w) = t)
        exact(t) += dist.size
      }
    }
    val got = SparkEntry.queries("q_hyperanf")(spark, sfDir)
      .orderBy("t").collect()
      .map(r => (r.getAs[Int]("t"), r.getAs[Long]("n_nodes"), r.getAs[Double]("n_pairs")))
    assert(got.map(_._1).toSeq == (0 to BigGraphOps.ANF_HOPS))
    assert(got.forall(_._2 == nodes.length.toLong))
    // t=0: every ball is a singleton, so the readout is the closed-form
    // single-element HLL estimate times |V|
    val single = BigGraphOps.ANF_M *
      math.log(BigGraphOps.ANF_M / (BigGraphOps.ANF_M - 1.0))
    assert(math.abs(got(0)._3 - nodes.length * single) < 1e-2)
    // curve must be nondecreasing (balls only grow)
    got.map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(a <= b, "neighborhood function shrank")
      case _ =>
    }
    // every round inside a generous envelope for m=32 (σ ≈ 1.04/√32 ≈ 18%;
    // per-node errors share the hash function, so they do NOT average out —
    // the band is ~2σ, measured ≤ ±10% on this graph)
    got.drop(1).foreach { case (t, _, est) =>
      val rel = est / exact(t).toDouble
      assert(rel > 0.6 && rel < 1.4,
        s"t=$t: estimate $est vs exact ${exact(t)} (ratio $rel)")
    }
    info(got.map { case (t, _, p) =>
      f"t=$t est=$p%.0f exact=${exact(t)} (${p / exact(t)}%.3f)" }.mkString("; "))
  }
}
