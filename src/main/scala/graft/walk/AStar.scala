package graft.walk

import scala.collection.mutable

/** E5 — A* best-first walk (reference
  * /root/reference/include/walk/AStarWalk.h:29-95: priority-queue search
  * with pluggable heuristic h(id) and edge cost; BFS = A* with h≡0,
  * BSFWalk.h:5-29).
  *
  * Deliberately DRIVER-SIDE over a collected adjacency map (SURVEY §7.4
  * #5): a heuristic-guided single-path search is inherently sequential —
  * the distributed rendering of path search is the frontier-join BFS/SSSP
  * in [[graft.operators.GraphOps]]; this class exists for heuristic parity
  * with the reference's in-memory engine on graphs that fit the driver
  * (collect the edge DataFrame first).
  */
object AStar {
  /** Returns the node path start→goal (inclusive) or Nil if unreachable.
    * Ties in f = g + h break on insertion order (matching the stable
    * behavior of the reference's multimap-based open list). */
  def search(
      adjacency: Map[Long, Seq[(Long, Double)]],
      start: Long,
      goal: Long,
      h: Long => Double = _ => 0.0): List[Long] = {
    case class Entry(node: Long, f: Double, seq: Long)
    implicit val ord: Ordering[Entry] =
      Ordering.by[Entry, (Double, Long)](e => (e.f, e.seq)).reverse
    val open = mutable.PriorityQueue.empty[Entry]
    val g = mutable.Map(start -> 0.0)
    val parent = mutable.Map.empty[Long, Long]
    val closed = mutable.Set.empty[Long]
    var seq = 0L
    open.enqueue(Entry(start, h(start), seq))
    while (open.nonEmpty) {
      val cur = open.dequeue()
      if (cur.node == goal) {
        var path = List(goal)
        while (path.head != start) path = parent(path.head) :: path
        return path
      }
      if (!closed(cur.node)) {
        closed += cur.node
        adjacency.getOrElse(cur.node, Nil).foreach { case (next, cost) =>
          val cand = g(cur.node) + cost
          if (cand < g.getOrElse(next, Double.PositiveInfinity)) {
            g(next) = cand
            parent(next) = cur.node
            seq += 1
            open.enqueue(Entry(next, cand + h(next), seq))
          }
        }
      }
    }
    Nil
  }

  /** BFS shortest hop path — A* with unit costs and zero heuristic. */
  def bfsPath(adjacency: Map[Long, Seq[Long]], start: Long, goal: Long): List[Long] =
    search(adjacency.map { case (k, vs) => k -> vs.map(v => (v, 1.0)) }, start, goal)
}
