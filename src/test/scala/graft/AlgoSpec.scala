package graft

import graft.algo.Hungarian
import graft.vector.Hnsw
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity with the reference's implemented algorithm kernels:
  * Hungarian assignment costs (/root/reference/test/algorithm.cpp:32-64)
  * and HNSW add/save/reload/query (test/query.cpp:13-59). */
class AlgoSpec extends AnyFunSuite {

  test("hungarian matches the reference golden costs (107, 443, 155)") {
    val m33 = Array(
      Array(8.0, 25, 50), Array(50.0, 35, 75), Array(22.0, 48, 150))
    assert(Hungarian.solve(m33)._2 == 107.0)

    val m66 = Array(
      Array(62.0, 75, 80, 93, 95, 97), Array(75.0, 80, 82, 85, 71, 97),
      Array(80.0, 75, 81, 98, 90, 97), Array(78.0, 82, 84, 80, 50, 98),
      Array(90.0, 85, 85, 80, 85, 99), Array(65.0, 75, 80, 75, 68, 96))
    assert(Hungarian.solve(m66)._2 == 443.0)

    val m88 = Array(
      Array(18.0, 45, 10, 23, 71, 34, 1, 39), Array(5.0, 135, 75, 81, 73, 49, 16, 98),
      Array(22.0, 48, 150, 12, 25, 62, 14, 61), Array(42.0, 53, 102, 15, 165, 68, 11, 3),
      Array(9.0, 48, 150, 9, 77, 62, 14, 61), Array(88.0, 48, 151, 72, 25, 62, 14, 61),
      Array(78.0, 33, 130, 10, 25, 62, 14, 61), Array(18.0, 67, 110, 12, 25, 62, 14, 61))
    assert(Hungarian.solve(m88)._2 == 155.0)
  }

  test("hungarian assignment is a permutation achieving the cost") {
    val m = Array(Array(4.0, 1, 3), Array(2.0, 0, 5), Array(3.0, 2, 2))
    val (assign, cost) = Hungarian.solve(m)
    assert(assign.sorted.sameElements(Array(0, 1, 2)))
    assert(cost == (0 until 3).map(j => m(assign(j))(j)).sum)
    assert(cost == 5.0) // 1 + 2 + 2
  }

  test("graph similarity: relabeling-invariant, zero iff same profile multiset") {
    import graft.algo.GraphSimilarity.degreeDistance
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    assert(degreeDistance(g, g) == 0.0)
    // relabeled copy: profiles identical -> distance 0
    val relabeled = g.map { case (a, b) => (a + 100, b + 100) }
    assert(degreeDistance(g, relabeled) == 0.0)
    // one extra edge changes two profiles by 1 each
    val gPlus = g :+ (2L, 1L)
    val d = degreeDistance(g, gPlus)
    assert(d > 0.0 && d <= 2.0, s"d=$d")
    // different sizes: padded with zero profiles, still finite and ordered
    assert(degreeDistance(g, Seq((1L, 2L))) > degreeDistance(g, g))
  }

  private def randVecs(n: Int, dim: Int, seed: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => Array.fill(dim)(rnd.nextDouble()))
  }

  test("hnsw add + query finds the inserted vector (reference sweep)") {
    for ((n, dim) <- Seq((80, 8), (200, 16))) {
      val idx = new Hnsw(dim)
      val vs = randVecs(n, dim, seed = 7)
      vs.zipWithIndex.foreach { case (v, i) => idx.add(i.toLong, v) }
      // query with an inserted vector: its own id must surface (dist 0)
      val hits = idx.search(vs(1), k = 2)
      assert(hits.map(_._1).contains(1L), s"n=$n dim=$dim hits=$hits")
      assert(hits.head._2 == 0.0)
    }
  }

  test("hnsw recall vs brute force on 200 points") {
    val dim = 8
    val vs = randVecs(200, dim, seed = 11)
    val idx = new Hnsw(dim)
    vs.zipWithIndex.foreach { case (v, i) => idx.add(i.toLong, v) }
    val queries = randVecs(20, dim, seed = 13)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val recalls = queries.map { q =>
      val truth = vs.zipWithIndex.minBy { case (v, _) => d2(q, v) }._2.toLong
      val got = idx.search(q, k = 1).head._1
      if (got == truth) 1 else 0
    }
    assert(recalls.sum >= 18, s"recall@1 too low: ${recalls.sum}/20")
  }

  test("hnsw save / reload round-trip answers identically") {
    val dim = 8
    val idx = new Hnsw(dim)
    randVecs(80, dim, seed = 3).zipWithIndex.foreach { case (v, i) => idx.add(i.toLong, v) }
    val q = Array.fill(dim)(0.5)
    val before = idx.search(q, 5)
    val path = java.nio.file.Files.createTempFile("hnsw", ".idx").toString
    idx.save(path)
    val reloaded = Hnsw.load(path)
    assert(reloaded.size == 80)
    assert(reloaded.search(q, 5) == before)
  }
}
