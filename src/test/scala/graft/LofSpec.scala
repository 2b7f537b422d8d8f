package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** q_lof proofs: the three-tier broadcast LOF equals a from-scratch
  * scalar mirror (brute-force kNN per tier, reach-distances, lrd, LOF)
  * on the real sf0.001 embeddings, and the scores satisfy the classic
  * invariants (positive, ≈1 in uniform density, self excluded).
  */
class LofSpec extends AnyFunSuite {
  import SparkTestBase._

  private def rp6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def d2(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def decSum(xs: Seq[Double]): Double =
    xs.map(BigDecimal(_).setScale(18, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble

  private lazy val pts: Map[Long, Seq[Double]] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("CAST(vec_id AS BIGINT) AS vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap

  /** top-k (id, dist) of q over the full corpus, self excluded, ties to
    * the smaller id — the gate's (d2, vec_id) rank key. */
  private def knn(q: Long): Seq[(Long, Double)] =
    pts.toSeq.filter(_._1 != q)
      .map { case (id, v) => (id, d2(pts(q), v)) }
      .sortBy { case (id, dd) => (dd, id) }
      .take(VectorOps.LOF_K)
      .map { case (id, dd) => (id, math.sqrt(dd)) }

  private lazy val probes: Seq[Long] =
    pts.keys.toSeq.filter(_ % VectorOps.KJ_MOD == 0)
      .sorted.take(VectorOps.LOF_P)

  test("q_lof equals the scalar mirror") {
    val k = VectorOps.LOF_K
    val knnP = probes.map(p => p -> knn(p)).toMap
    val m = knnP.values.flatten.map(_._1).toSeq.distinct
    val knnM = m.map(o => o -> knn(o)).toMap
    val kdistM = knnM.map { case (o, ns) => o -> ns.map(_._2).max }
    val m2 = knnM.values.flatten.map(_._1).toSeq.distinct
    val kdist2 = m2.map(q => q -> knn(q).map(_._2).max).toMap
    def lrd(ns: Seq[(Long, Double)], kd: Map[Long, Double]): Double =
      k.toDouble / decSum(ns.map { case (o, dd) => math.max(kd(o), dd) })
    val lrdM = knnM.map { case (o, ns) => o -> lrd(ns, kdist2) }
    val mirror = probes.sorted.map { p =>
      val lp = lrd(knnP(p), kdistM)
      val mlrd = decSum(knnP(p).map(o => lrdM(o._1))) / k.toDouble
      (p, rp6(lp), rp6(mlrd / lp))
    }
    val got = VectorOps.qLof(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == mirror, s"gate:\n$got\nmirror:\n$mirror")
  }

  test("LOF invariants: positive scores, probes excluded from own kNN") {
    val got = VectorOps.qLof(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == math.min(VectorOps.LOF_P, probes.length))
    got.foreach { case (id, lrd, lof) =>
      assert(lrd > 0.0, s"probe $id lrd $lrd")
      assert(lof > 0.0, s"probe $id lof $lof")
    }
    // density sanity: the bulk of a homogeneous synthetic corpus sits
    // near LOF 1; no probe should look infinitely outlying
    assert(got.map(_._3).max < 10.0)
  }
}
