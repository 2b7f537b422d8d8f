package graft.algo

/** Hungarian (Kuhn-Munkres) minimum-cost assignment — the reference's
  * similarity kernel for subgraph matching (E3;
  * /root/reference/src/operand/algorithms/Hungarian.cpp, golden costs in
  * test/algorithm.cpp:32-64). Driver-side: assignment matrices come from
  * small degree-matrix comparisons, not the data plane. O(n³) potentials
  * formulation (standard e-maxx/Jonker-style).
  */
object Hungarian {

  /** Solve an n×n min-cost assignment. Returns (rowOfColumn, totalCost):
    * rowOfColumn(j) = the row assigned to column j (0-based). */
  def solve(cost: Array[Array[Double]]): (Array[Int], Double) = {
    val n = cost.length
    require(n > 0 && cost.forall(_.length == n), "square matrix required")
    val INF = Double.MaxValue / 4
    val u = new Array[Double](n + 1)
    val v = new Array[Double](n + 1)
    val p = new Array[Int](n + 1) // p(j) = row matched to column j (1-based)
    val way = new Array[Int](n + 1)
    for (i <- 1 to n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(n + 1)(INF)
      val used = Array.fill(n + 1)(false)
      var augmenting = true
      while (augmenting) {
        used(j0) = true
        val i0 = p(j0)
        var delta = INF
        var j1 = 0
        for (j <- 1 to n if !used(j)) {
          val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
          if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
          if (minv(j) < delta) { delta = minv(j); j1 = j }
        }
        for (j <- 0 to n) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
        }
        j0 = j1
        if (p(j0) == 0) augmenting = false
      }
      while (j0 != 0) {
        val j1 = way(j0)
        p(j0) = p(j1)
        j0 = j1
      }
    }
    val assignment = new Array[Int](n)
    var total = 0.0
    for (j <- 1 to n) {
      assignment(j - 1) = p(j) - 1
      total += cost(p(j) - 1)(j - 1)
    }
    (assignment, total)
  }
}
