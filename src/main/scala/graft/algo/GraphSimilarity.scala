package graft.algo

/** Graph similarity by degree-profile assignment — the reference's actual
  * use of Hungarian (E3 similarity kernel: degree-matrix builder
  * /root/reference/src/operand/analysis/DegreeCentrality.cpp:10-41 feeding
  * /root/reference/src/operand/algorithms/Hungarian.cpp).
  *
  * Each vertex gets an (out-degree, in-degree) profile; the distance
  * between two graphs is the minimum-cost assignment of their vertex
  * profiles (L1 profile distance, padded with zero profiles when sizes
  * differ). Node-id invariant by construction: relabeling a graph cannot
  * change its profile multiset. Driver-side — the inputs are small
  * collected pattern graphs, not the data plane.
  */
object GraphSimilarity {

  private def profiles(es: Seq[(Long, Long)]): Seq[(Double, Double)] = {
    val out = es.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val in = es.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    nodes.map(n => (out.getOrElse(n, 0.0), in.getOrElse(n, 0.0)))
  }

  /** Min-cost degree-profile assignment distance; 0 for graphs with the
    * same degree-profile multiset (e.g. any relabeling). */
  def degreeDistance(edgesA: Seq[(Long, Long)], edgesB: Seq[(Long, Long)]): Double = {
    val pa = profiles(edgesA)
    val pb = profiles(edgesB)
    val n = math.max(pa.length, pb.length)
    if (n == 0) return 0.0
    val cost = Array.tabulate(n, n) { (i, j) =>
      val (ao, ai) = if (i < pa.length) pa(i) else (0.0, 0.0)
      val (bo, bi) = if (j < pb.length) pb(j) else (0.0, 0.0)
      math.abs(ao - bo) + math.abs(ai - bi)
    }
    Hungarian.solve(cost)._2
  }
}
