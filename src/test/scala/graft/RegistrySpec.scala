package graft

import org.scalatest.funsuite.AnyFunSuite

/** Three-way registry identity (r13 advice #2): the committed bench
  * artifact, the query registry, and the oracle registry must describe the
  * SAME gate set at every commit — the r13 close shipped a bench.json three
  * gates behind HEAD, exactly the drift this tripwire makes impossible.
  * Discipline it enforces: a commit that adds a gate also refreshes
  * bench.json (a 1-pass sf0.1 run suffices between closes; the close runs
  * the full 3-pass refresh).
  */
class RegistrySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o,
      s"queries without oracle: ${(q -- o).toSeq.sorted.take(10)}; " +
        s"oracles without query: ${(o -- q).toSeq.sorted.take(10)}")
  }

  test("committed bench.json covers exactly the registered gate set") {
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get("bench.json"))
    // minimal extraction without a JSON dep: the "queries" object's keys
    val obj = txt.split("\"queries\":\\{", 2)(1).split("\\}", 2)(0)
    val benchKeys = "\"([^\"]+)\":".r.findAllMatchIn(obj).map(_.group(1)).toSet
    val q = SparkEntry.queries.keySet
    assert(benchKeys == q,
      s"bench.json is stale — missing: ${(q -- benchKeys).toSeq.sorted.take(10)}; " +
        s"phantom: ${(benchKeys -- q).toSeq.sorted.take(10)}. " +
        "Refresh it: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt \"runMain graft.Bench\"")
    val n = "\"n_queries\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    assert(n.contains(q.size), s"bench.json n_queries=$n != registry ${q.size}")
  }
}
