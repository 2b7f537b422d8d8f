package graft

import java.nio.file.{Files, Paths}

import graft.algo.Hungarian
import graft.graph.GraphXBridge
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DOT reader must load every graph fixture the reference's own walk
  * and matching tests use (the .dot files in /root/reference/test/graphs), and the
  * loaded data must drive the analytics kernels: the 4x4 bipartite weight
  * matrix through Hungarian agrees with brute-force over all 4!
  * assignments, and the undirected G4 triangle-plus-tail is one connected
  * component in GraphX.
  */
class DotSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private val dir = "/root/reference/test/graphs"

  test("reference .dot fixtures load with the expected edge counts") {
    assume(Files.exists(Paths.get(dir)))
    val counts = Map(
      "bipartile_weight.dot" -> 16L, "g4.dot" -> 4L, "random_walk.dot" -> 8L)
    counts.foreach { case (f, n) =>
      val df = Sources.dot(spark, s"$dir/$f")
      assert(df.count() == n, s"$f edge count")
      assert(df.filter(col("directed")).count() == 0, s"$f must be undirected")
    }
    // every bipartite edge carries its weight
    assert(Sources.dot(spark, s"$dir/bipartile_weight.dot")
      .filter(col("weight").isNull).count() == 0)
  }

  test("DOT-loaded bipartite weights drive Hungarian to the true optimum") {
    assume(Files.exists(Paths.get(dir)))
    val edges = Sources.dot(spark, s"$dir/bipartile_weight.dot")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    val ws = edges.map(_._1).distinct.sorted
    val ts = edges.map(_._2).distinct.sorted
    val cost = Array.tabulate(ws.length, ts.length) { (i, j) =>
      edges.find(e => e._1 == ws(i) && e._2 == ts(j)).get._3
    }
    val (_, hungarianCost) = Hungarian.solve(cost.map(_.toArray))
    val brute = ts.indices.permutations
      .map(p => p.zipWithIndex.map { case (j, i) => cost(i)(j) }.sum).min
    assert(hungarianCost == brute, s"hungarian $hungarianCost != brute $brute")
  }

  test("DOT-loaded G4 is one connected component in GraphX") {
    assume(Files.exists(Paths.get(dir)))
    val df = Sources.dot(spark, s"$dir/g4.dot")
    val names = df.select("src").union(df.select("dst")).distinct()
      .collect().map(_.getString(0)).sorted.zipWithIndex.toMap
    val idDf = df.select(col("src"), col("dst")).collect()
      .map(r => (names(r.getString(0)), names(r.getString(1))))
    import SparkTestBase.spark.implicits._
    // undirected: both orientations
    val edgeDf = (idDf ++ idDf.map(_.swap)).toSeq.toDF("src", "dst")
    val g = GraphXBridge.fromEdgeDF(edgeDf)
    val cc = GraphXBridge.connectedComponents(g)
    assert(cc.values.toSet.size == 1, s"expected one component: $cc")
    assert(cc.size == 4)
  }
}
