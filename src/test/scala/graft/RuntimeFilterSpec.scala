package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the 100 TB join-pruning ladder on a selective orders⋈lineitem
  * join (filtered dim side, fact application side):
  *
  *  - at test scale the filtered side BROADCASTS — the stronger
  *    optimization, no runtime filter needed or planned;
  *  - in the shuffle-join regime (broadcast disabled, application-side
  *    scan threshold at 0 to stand in for a >10 GB fact side), Catalyst
  *    injects a runtime BLOOM FILTER: the fact scan is pre-filtered by
  *    `might_contain` on the join key before the exchange — the
  *    row-pruning that makes selective fact joins viable at 100 TB.
  *
  * A Spark upgrade or conf drift that silently stops injecting runtime
  * filters fails here, not in a 10× shuffle regression on a cluster.
  * (Result correctness is oracle-covered by the join gates; this spec
  * pins the PLAN.)
  */
class RuntimeFilterSpec extends AnyFunSuite {
  import SparkTestBase._

  private def selectiveJoinPlan(): String = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter("o_orderpriority = '1-URGENT'")
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority").count()
      .queryExecution.executedPlan.toString
  }

  test("selective dim side broadcasts at test scale (no runtime filter needed)") {
    val p = selectiveJoinPlan()
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast:\n$p")
    assert(!p.contains("might_contain"), "bloom filter injected under broadcast?")
  }

  test("shuffle-join regime injects a runtime bloom filter on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // stand-in for a fact side past the default 10 GB bar
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val p = selectiveJoinPlan()
      assert(p.contains("might_contain"),
        s"runtime bloom filter not injected in the shuffle regime:\n$p")
      assert(!p.contains("BroadcastHashJoin"), p)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
