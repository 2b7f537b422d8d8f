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

  test("Hnsw.loadCached invalidates when the blob at a path is replaced") {
    import graft.vector.Hnsw
    val path = java.nio.file.Files.createTempFile("hnsw-cache", ".blob").toString
    val a = new Hnsw(2)
    a.add(1L, Array(0.0, 0.0)); a.add(2L, Array(1.0, 1.0))
    a.save(path)
    assert(Hnsw.loadCached(path).size == 2)
    // replace the file with a DIFFERENT index at the same path (the
    // dropped-and-recreated-catalog case); nudge mtime in case the
    // filesystem's timestamp granularity makes both writes identical
    val b = new Hnsw(2)
    b.add(7L, Array(0.5, 0.5))
    b.save(path)
    java.nio.file.Files.setLastModifiedTime(java.nio.file.Paths.get(path),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
    val reloaded = Hnsw.loadCached(path)
    assert(reloaded.size == 1 && reloaded.get(7L).isDefined,
      "cache served the stale index after the blob was replaced")
  }
}
