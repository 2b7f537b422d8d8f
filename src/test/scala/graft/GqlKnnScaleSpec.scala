package graft

import graft.gql.GqlEngine
import org.scalatest.funsuite.AnyFunSuite

/** The GqlSpec KNN cases run on 40 vertices — small enough that every
  * partition index holds a handful of points. This spec drives the
  * declared-index scatter at ~1.2k vectors (dozens of non-trivial
  * partition-local HNSW graphs), where a local recall miss has real room
  * to happen, and pins:
  *   - index route ≡ brute route for several k (the over-fetch + exact
  *     re-rank contract at depth);
  *   - the warm path: a repeat query answers from the persisted
  *     generation (no rebuild — generation count stable) and identically.
  */
class GqlKnnScaleSpec extends AnyFunSuite {
  import SparkTestBase.spark

  test("declared-index KNN equals brute on a ~1.2k-vector group, warm and cold") {
    val root = java.nio.file.Files.createTempDirectory("gql-knn-scale").toString
    val e = new GqlEngine(spark, root)
    assert(e.exec("{create: 'sdb', group: [{sv: ['v'], index: ['v']}, {sb: ['v']}]};")
      .head.status == "CREATE SUCCESS")
    // 1200 deterministic 4-dim vectors on a jittered grid: md5-derived
    // fractional parts make ties vanishingly unlikely, and the values are
    // plain doubles so the GQL literal round-trip is exact
    def vec(i: Int): Seq[Double] = (0 until 4).map { j =>
      val h = graft.operators.MultimodalOps.Decoder
        .md5hex(s"knn_${i}_$j".getBytes("UTF-8")).substring(0, 6)
      (i % 11).toDouble + java.lang.Long.parseLong(h, 16).toDouble / 0xFFFFFF.toDouble
    }
    val rows = (0 until 1200)
      .map(i => s"[$i, {v: [${vec(i).mkString(", ")}]}]")
      .grouped(200).toSeq
    for (chunk <- rows) {
      e.exec(s"{upset: 'sv', vertex: [${chunk.mkString(", ")}]};")
      e.exec(s"{upset: 'sb', vertex: [${chunk.mkString(", ")}]};")
    }
    def topk(g: String, k: Int): Seq[Long] =
      e.query(s"{query: '$g', in: 'sdb', where: {v: {limit: $k, $$near: [5.5, 5.5, 5.5, 5.5]}}};")
        .select("key_i").collect().map(_.getLong(0)).toSeq
    for (k <- Seq(1, 5, 20)) {
      assert(topk("sv", k) == topk("sb", k),
        s"k=$k: index route diverged from brute at 1.2k vectors")
    }
    val gens = e.hnswIndexCount
    // repeat query: loads the persisted generation (count stable) and
    // answers identically
    assert(topk("sv", 5) == topk("sb", 5))
    assert(e.hnswIndexCount == gens, "repeat query built a new generation")
  }
}
