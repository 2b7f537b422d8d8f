package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BigGraphOps

/** q_mst proofs: the distributed Borůvka forest equals a from-scratch
  * Kruskal union-find mirror — with (w, src, dst) a total order the
  * minimum spanning forest is UNIQUE, so the two must agree edge-for-edge
  * — on constructed graphs covering cycles, ties, multi-component inputs
  * and chain contractions, and on the real sf0.001 co-purchase graph.
  */
class MstSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Kruskal with union-find, processing edges in (w, src, dst) order. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.sortBy(e => (e._3, e._1, e._2)).flatMap { case (s0, d0, w) =>
      val (rs, rd) = (find(s0), find(d0))
      if (rs == rd) None
      else { parent(rs) = rd; Some((s0, d0, w)) }
    }.toSet
  }

  private def run(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst", "w")
    BigGraphOps.msfOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("cycle drops exactly its heaviest edge") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 5L))
    assert(run(edges) == Set((1L, 2L, 1L), (2L, 3L, 2L)))
  }

  test("equal weights tie-break on (src, dst) — forest is still unique") {
    // a 4-cycle with ALL weights equal: kruskal keeps the 3 lexicographically
    // smallest non-cycle edges; Borůvka must land on the same set
    val edges = Seq((1L, 2L, 7L), (2L, 3L, 7L), (3L, 4L, 7L), (1L, 4L, 7L))
    val got = run(edges)
    assert(got == kruskal(edges), s"got $got")
    assert(got == Set((1L, 2L, 7L), (1L, 4L, 7L), (2L, 3L, 7L)))
  }

  test("disconnected components each get their own tree") {
    val edges = Seq(
      (1L, 2L, 3L), (2L, 3L, 1L), (1L, 3L, 2L),  // triangle A
      (10L, 11L, 9L),                            // pair B
      (20L, 21L, 1L), (21L, 22L, 1L), (20L, 22L, 1L)) // tied triangle C
    val got = run(edges)
    assert(got == kruskal(edges))
    assert(got.size == 5, "3 components over 8 nodes -> 5 forest edges")
  }

  test("long chain contracts across multiple Borůvka rounds") {
    // a path graph (already a tree): every edge is in the forest, and the
    // pointer-doubling contraction must survive depth >> 2
    val edges = (1L to 40L).map(i => (i, i + 1, 1L + (i % 3)))
    val got = run(edges)
    assert(got == edges.toSet)
  }

  test("forced distributed pointer-doubling path agrees with the local contraction") {
    import spark.implicits._
    // localCap = 0 forces the pointer-doubling branch on every round — the
    // path a 100 TB graph's early rounds take; the deep chain is its worst
    // case (contraction trees as long as the component)
    val chain = (1L to 33L).map(i => (i, i + 1, 1L + (i % 3)))
    val mixed = Seq((1L, 2L, 7L), (2L, 3L, 7L), (3L, 4L, 7L), (1L, 4L, 7L),
      (10L, 11L, 2L), (11L, 12L, 1L), (10L, 12L, 3L))
    for (edges <- Seq(chain, mixed)) {
      val df = edges.toDF("src", "dst", "w")
      val forced = BigGraphOps.msfOf(df, localCap = 0L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(forced == kruskal(edges), s"doubling path diverged on $edges")
    }
  }

  test("gate equals Kruskal on the real sf0.001 co-purchase graph") {
    val edges = BigGraphOps.coEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = BigGraphOps.qMst(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = kruskal(edges)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
    assert(got == want)
    assert(got.size == want.size && got.size < nodes,
      "forest has V - #components edges")
  }
}
