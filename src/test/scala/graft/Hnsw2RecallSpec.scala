package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** The two-stage distributed HNSW is gated against the brute oracle at
  * sf0.01; this pins the same agreement at sf0.1 — the BENCH scale, where
  * partitions are ~250 vectors and the per-partition beam (ef 256) is what
  * guarantees local recall. A corpus regen or a beam-width regression that
  * breaks the over-fetch + re-rank equality fails here, not in a silently
  * wrong bench number. */
class Hnsw2RecallSpec extends AnyFunSuite {
  import SparkTestBase.spark

  test("two-stage HNSW equals brute-force top-k at the bench SF") {
    val dir = "/root/testdata/sf0.1"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = rows(VectorOps.qAnnHnsw2(spark, dir))
    val want = rows(VectorOps.qKnn(spark, dir))
    assert(got == want, s"hnsw2 $got\n != brute $want")
  }
}
