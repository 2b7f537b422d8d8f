package graft

import graft.walk.AStar
import org.scalatest.funsuite.AnyFunSuite

/** E5 parity: the Romania road map from the AI textbook (Russell & Norvig)
  * — the same fixture the reference verifies its A* against
  * (/root/reference/test/vnet.cpp:207-237). Straight-line-to-Bucharest
  * heuristic; the optimal route Arad→Sibiu→Rimnicu→Pitesti→Bucharest. */
class AStarSpec extends AnyFunSuite {
  // city ids: 1 Arad, 2 Zerind, 3 Oradea, 4 Timisoara, 5 Lugoj, 6 Mehadia,
  // 7 Drobeta, 8 Sibiu, 9 Rimnicu Vilcea, 10 Craiova, 11 Fagaras,
  // 12 Pitesti, 13 Bucharest, 14 Giurgiu, 15 Urziceni
  private val roads = Seq(
    (1L, 2L, 75.0), (1L, 4L, 118.0), (1L, 8L, 140.0), (2L, 3L, 71.0),
    (3L, 8L, 151.0), (4L, 5L, 111.0), (5L, 6L, 70.0), (6L, 7L, 75.0),
    (7L, 10L, 120.0), (8L, 9L, 80.0), (8L, 11L, 99.0), (9L, 10L, 146.0),
    (9L, 12L, 97.0), (10L, 12L, 138.0), (11L, 13L, 211.0), (12L, 13L, 101.0),
    (13L, 14L, 90.0), (13L, 15L, 85.0))

  private val adj: Map[Long, Seq[(Long, Double)]] =
    (roads ++ roads.map { case (a, b, w) => (b, a, w) })
      .groupBy(_._1).map { case (k, es) => k -> es.map(e => (e._2, e._3)) }

  private val sld = Map( // straight-line distance to Bucharest
    1L -> 366.0, 2L -> 374.0, 3L -> 380.0, 4L -> 329.0, 5L -> 244.0,
    6L -> 241.0, 7L -> 242.0, 8L -> 253.0, 9L -> 193.0, 10L -> 160.0,
    11L -> 176.0, 12L -> 100.0, 13L -> 0.0, 14L -> 77.0, 15L -> 80.0)

  test("A* finds the optimal Arad->Bucharest route") {
    val path = AStar.search(adj, 1L, 13L, sld)
    assert(path == List(1L, 8L, 9L, 12L, 13L))
  }

  test("A* with zero heuristic degenerates to Dijkstra, same optimal cost") {
    val path = AStar.search(adj, 1L, 13L)
    assert(path == List(1L, 8L, 9L, 12L, 13L)) // 418 km, unique optimum
  }

  test("BFS path minimizes hops, not distance") {
    val path = AStar.bfsPath(adj.map { case (k, vs) => k -> vs.map(_._1) }, 1L, 13L)
    assert(path.length == 4) // Arad->Sibiu->Fagaras->Bucharest: 3 hops
    assert(path.head == 1L && path.last == 13L)
  }

  test("unreachable goal returns Nil") {
    assert(AStar.search(Map(1L -> Seq((2L, 1.0))), 1L, 99L) == Nil)
  }
}
