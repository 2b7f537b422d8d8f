package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.DataFrame

/** GraphX bridge (SURVEY.md §7.1: GraphX `Graph[VD,ED]` built on demand
  * from the edge DataFrames for the analytics kernels the reference stubs —
  * PageRank src/operand/analysis/PageRank.cpp:5-18, Tarjan SCC (empty),
  * degrees DegreeCentrality.cpp).
  *
  * The DataFrame-native versions in [[graft.operators.GraphOps]] are the
  * oracle-gated path (deterministic decimal math); this bridge is the
  * cluster-scale alternative — GraphX partitions the edge RDD and runs
  * Pregel supersteps without driver-side loops. The test suite checks both
  * agree on component structure and degree counts.
  */
object GraphXBridge {
  /** Bound the edge RDD's partition count before Pregel: a superstep pays
    * fixed cost PER PARTITION PER ROUND, so the DF→RDD handoff must not
    * inherit an AQE fan-out sized for one-pass shuffles. Measured: sf10
    * q_scc_big inherited ~215 partitions from the SF-scaled
    * initialPartitionNum and its SCC Pregel (hundreds of inner rounds ×
    * 215 tasks) ran 20× past its 32-partition time — coalesce to
    * defaultParallelism (executors × cores on a real cluster — the
    * standard GraphX sizing; coalesce, not repartition: no extra
    * shuffle). A smaller inherited count is left alone. */
  private def bounded(rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row],
      target: Int) =
    if (rdd.getNumPartitions > target) rdd.coalesce(target) else rdd

  /** Build a directed graph from an (src: int, dst: int) DataFrame. */
  def fromEdgeDF(edges: DataFrame): Graph[Int, Int] = {
    val e = bounded(edges.select("src", "dst").rdd,
        edges.sparkSession.sparkContext.defaultParallelism)
      .map(r => Edge(r.getInt(0).toLong, r.getInt(1).toLong, 1))
    Graph.fromEdges(e, defaultValue = 0)
  }

  /** Build a directed graph from an (src: long, dst: long) DataFrame —
    * the SF-scaled co-purchase graph ([[graft.operators.BigGraphOps]]). */
  def fromLongEdgeDF(edges: DataFrame): Graph[Int, Int] = {
    val e = bounded(edges.select("src", "dst").rdd,
        edges.sparkSession.sparkContext.defaultParallelism)
      .map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph.fromEdges(e, defaultValue = 0)
  }

  /** Unweighted shortest hop count from `src` to every reachable vertex
    * (GraphX Pregel ShortestPaths — the library twin of the bounded
    * frontier BFS in BigGraphOps.qBfsBig). ShortestPaths measures distance
    * from each vertex TO the landmark along edge direction, so run it on
    * the reversed graph to get source-to-vertex distances. */
  def shortestHops(g: Graph[Int, Int], src: VertexId): Map[VertexId, Int] =
    org.apache.spark.graphx.lib.ShortestPaths.run(g.reverse, Seq(src))
      .vertices.collectAsMap().toMap
      .collect { case (v, m) if m.contains(src) => v -> m(src) }

  def degrees(g: Graph[Int, Int]): Map[VertexId, (Int, Int)] = {
    val out = g.outDegrees.collectAsMap()
    val in = g.inDegrees.collectAsMap()
    (out.keySet ++ in.keySet).map(v =>
      v -> (out.getOrElse(v, 0), in.getOrElse(v, 0))).toMap
  }

  def pageRank(g: Graph[Int, Int], iters: Int): Map[VertexId, Double] =
    g.staticPageRank(iters).vertices.collectAsMap().toMap

  def stronglyConnectedComponents(g: Graph[Int, Int], iters: Int): Map[VertexId, VertexId] =
    g.stronglyConnectedComponents(iters).vertices.collectAsMap().toMap

  def connectedComponents(g: Graph[Int, Int]): Map[VertexId, VertexId] =
    g.connectedComponents().vertices.collectAsMap().toMap
}
