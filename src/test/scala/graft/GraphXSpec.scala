package graft

import graft.graph.GraphXBridge
import graft.operators.GraphOps
import org.scalatest.funsuite.AnyFunSuite

/** The GraphX analytics path must agree with the DataFrame-native gated
  * queries on the same derived edge relation. */
class GraphXSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val edges = GraphOps.thinnedEdges(spark, sfDir)
  private lazy val g = GraphXBridge.fromEdgeDF(edges)

  test("GraphX SCC partition equals q_scc partition") {
    val gx = GraphXBridge.stronglyConnectedComponents(g, 25)
      .groupBy(_._2).values.map(_.keys.toSet).toSet
    val df = SparkEntry.queries("q_scc")(spark, sfDir).collect()
      .map(r => r.getAs[Int]("node").toLong -> r.getAs[Int]("scc_id"))
    // q_scc also lists isolated nations (no edges); GraphX only sees nodes
    // with at least one edge — compare on the common vertex set
    val touched = gx.flatten
    val dfPart = df.filter(t => touched(t._1))
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(gx == dfPart)
  }

  test("GraphX shortest hops agree with q_bfs_big on the co-purchase graph") {
    val big = operators.BigGraphOps.coEdges(spark, sfDir).select("src", "dst")
    val gx = GraphXBridge.fromLongEdgeDF(big)
    val bfs = SparkEntry.queries("q_bfs_big")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val start = bfs.find(_._2 == 0).get._1
    val hops = GraphXBridge.shortestHops(gx, start)
    // every node the bounded BFS reached must carry the true shortest hops
    bfs.foreach { case (n, h) =>
      assert(hops.get(n).contains(h), s"node $n: bfs=$h graphx=${hops.get(n)}")
    }
    // and the bounded BFS must not miss any node within its hop bound
    hops.filter(_._2 <= operators.BigGraphOps.BFS_HOPS).keys.foreach { n =>
      assert(bfs.contains(n), s"node $n within bound missing from q_bfs_big")
    }
    assert(bfs.size > 50, s"agreement set too small to be meaningful: ${bfs.size}")
  }

  test("GraphX degrees equal q_degree") {
    val gx = GraphXBridge.degrees(g)
    val df = SparkEntry.queries("q_degree")(spark, sfDir).collect()
      .map(r => r.getAs[Int]("n_nationkey").toLong ->
        (r.getAs[Long]("out_deg").toInt, r.getAs[Long]("in_deg").toInt)).toMap
    gx.foreach { case (v, deg) => assert(df(v) == deg, s"vertex $v") }
    // vertices GraphX doesn't see must have zero degree in the DF version
    (df.keySet -- gx.keySet).foreach(v => assert(df(v) == ((0, 0))))
  }

  test("GraphX static PageRank ranks the same top vertex") {
    val gx = GraphXBridge.pageRank(g, 20)
    val df = SparkEntry.queries("q_pagerank")(spark, sfDir).collect()
      .map(r => r.getAs[Int]("node").toLong -> r.getAs[Double]("pagerank")).toMap
    // formulations differ (GraphX distributes dangling mass differently);
    // the ordering signal should still agree on the most central vertex
    val topGx = gx.maxBy(_._2)._1
    val topDf = df.maxBy(_._2)._1
    assert(topGx == topDf)
  }
}
