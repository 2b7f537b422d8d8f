package graft

import graft.operators.BigGraphOps
import org.scalatest.funsuite.AnyFunSuite

/** k-core peeling against a from-scratch driver-side mirror on the same
  * co-purchase edge relation (Seidman 1983 definition, iterated to its
  * true fixpoint — no round bound), at two k values: one whose core is
  * non-empty at the 148-vertex spec scale, and the gated KCORE_K whose
  * core correctly empties here (it is non-empty at the sf0.01 gate scale
  * — 1298 of 1500 vertices, measured). */
class KcoreSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val und: Seq[(Long, Long)] = {
    val e = BigGraphOps.coEdges(spark, sfDir).select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    (e ++ e.map(p => (p._2, p._1))).toSeq
  }

  /** True k-core by fixpoint peeling (no round bound), with final
    * within-core degrees. */
  private def mirror(k: Int): (Map[Long, Long], Int) = {
    var alive = und.map(_._1).toSet
    var rounds = 0
    var changed = true
    while (changed) {
      val deg = und.filter(p => alive(p._1) && alive(p._2))
        .groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val next = alive.filter(n => deg.getOrElse(n, 0L) >= k)
      changed = next != alive
      alive = next
      if (changed) rounds += 1
    }
    val core = und.filter(p => alive(p._1) && alive(p._2))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    (core, rounds)
  }

  test("kcore(k=4) matches the fixpoint mirror and is non-empty at spec scale") {
    val (exp, rounds) = mirror(4)
    assert(exp.nonEmpty, "spec-scale 4-core unexpectedly empty")
    assert(rounds <= BigGraphOps.KCORE_ROUNDS,
      s"fixpoint needs $rounds rounds > unroll bound ${BigGraphOps.KCORE_ROUNDS}")
    val got = BigGraphOps.kcore(spark, sfDir, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp, s"4-core mismatch: ${got.size} vs ${exp.size} nodes")
    // every survivor meets the core invariant
    got.values.foreach(d => assert(d >= 4))
  }

  test("q_kcore_big (k=KCORE_K) matches the fixpoint mirror") {
    val (exp, rounds) = mirror(BigGraphOps.KCORE_K)
    assert(rounds <= BigGraphOps.KCORE_ROUNDS)
    val got = SparkEntry.queries("q_kcore_big")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("peeling is monotone: the (k+1)-core is a subgraph of the k-core") {
    val k4 = mirror(4)._1.keySet
    val k5 = mirror(5)._1.keySet
    assert(k5.subsetOf(k4))
  }

  test("q_harmonic_big matches a from-scratch multi-source BFS mirror") {
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pivots = adj.keySet.toSeq.sorted.take(BigGraphOps.CENT_PIVOTS)
    // exact BFS per pivot, bounded at CENT_HOPS
    def dists(p: Long): Map[Long, Int] = {
      var d = Map(p -> 0)
      var frontier = Set(p)
      for (h <- 1 to BigGraphOps.CENT_HOPS) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- d.keySet
        d ++= frontier.map(_ -> h)
      }
      d
    }
    val per = pivots.map(dists)
    val nodes = per.flatMap(_.keys).toSet
    val expected = nodes.flatMap { v =>
      val ds = per.flatMap(_.get(v)).filter(_ > 0)
      if (ds.isEmpty) None
      else {
        val h = ds.map(d => BigDecimal(1.0 / d)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        Some((v, ds.size.toLong, math.floor(h * 1e6 + 0.5) / 1e6))
      }
    }
    val got = SparkEntry.queries("q_harmonic_big")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty)
    assert(got == expected, s"harmonic mismatch: sample got ${got.take(3)}")
  }
}
