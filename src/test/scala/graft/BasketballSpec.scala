package graft

import java.nio.file.{Files, Paths}

import graft.gql.{Ast, GqlEngine, Parser}
import graft.walk.AStar
import org.scalatest.funsuite.AnyFunSuite

/** E4 end-to-end on the reference's basketballplayer dataset: rebuild the
  * graph from the statements echoed in its expect.out, then answer the
  * min() walk queries from query.gql — which the reference itself cannot
  * (GPathQuery::execute is a stub, PathPlan.cpp:15-17). The min-cost
  * answer is cross-checked against the independent driver-side A*. */
class BasketballSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private val expectOut = Paths.get("/root/reference/test/basketballplayer-2.X/expect.out")

  test("basketballplayer min() walk answers with A* cross-check") {
    assume(Files.exists(expectOut), "reference fixtures not present")
    val stmts = Files.readAllLines(expectOut).toArray(Array.empty[String])
      .filter(_.matches("""^\[\d+\]:\s.*"""))
      .map(_.replaceFirst("""^\[\d+\]:\s+""", ""))
      .filter(s => s.startsWith("{create") || s.startsWith("{upset"))
    assert(stmts.length > 300)
    val parsed = stmts.flatMap(s => Parser.parse(s))
    // coalesce consecutive same-group upserts (semantically identical,
    // 311 single-row rewrites -> a handful of batch writes)
    val batched = parsed.foldLeft(List.empty[Ast.Stmt]) {
      case (Ast.UpsetVertex(g1, r1) :: rest, Ast.UpsetVertex(g2, r2)) if g1 == g2 =>
        Ast.UpsetVertex(g1, r1 ++ r2) :: rest
      case (Ast.UpsetEdge(g1, e1) :: rest, Ast.UpsetEdge(g2, e2)) if g1 == g2 =>
        Ast.UpsetEdge(g1, e1 ++ e2) :: rest
      case (acc, s) => s :: acc
    }.reverse
    assert(batched.length < 20, s"batching failed: ${batched.length}")

    val root = Files.createTempDirectory("bball").toString
    val engine = new GqlEngine(spark, root)
    batched.foreach { st =>
      val r = engine.execStmt(st)
      assert(!r.status.startsWith("error"), s"$st -> ${r.status}")
    }

    // the reference's own query.gql walk: min() over reversed follow edges
    val q1 = engine.query(
      "{query: 'follow', in: 'basketballplayer', where: ['player102', <-: min(), 'player113']};")
      .collect()(0)
    assert(q1.getAs[String]("from") == "player102")
    assert(q1.getAs[String]("to") == "player113")

    // independent ground truth: A* over the collected follow adjacency,
    // reversed direction, unit costs
    val follow = engine.catalog.read("basketballplayer", "follow")
      .select("src_s", "dst_s").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ids = follow.flatMap(e => Seq(e._1, e._2)).distinct.zipWithIndex.toMap
    val adj = follow.groupBy(e => ids(e._2).toLong) // reversed: dst -> src
      .map { case (k, es) => k -> es.map(e => (ids(e._1).toLong, 1.0)).toSeq }
    val truth = AStar.search(adj, ids("player102").toLong, ids("player113").toLong)
    if (truth.isEmpty) {
      assert(q1.isNullAt(q1.fieldIndex("cost")), s"engine found a path A* says doesn't exist: $q1")
    } else {
      assert(q1.getAs[Double]("cost") == (truth.length - 1).toDouble,
        s"cost ${q1.getAs[Double]("cost")} != A* ${truth.length - 1}")
    }

    // second query: team201 is not in the follow graph -> unreachable
    val q2 = engine.query(
      "{query: 'follow', in: 'basketballplayer', where: ['player102', ->: min('distance'), 'team201']};")
      .collect()(0)
    assert(q2.isNullAt(q2.fieldIndex("cost")))
  }
}
