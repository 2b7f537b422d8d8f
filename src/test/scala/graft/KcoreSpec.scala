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
}
