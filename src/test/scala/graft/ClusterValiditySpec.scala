package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** q_silhouette / q_davies_bouldin proofs: both validity indices equal a
  * from-scratch scalar mirror over the SAME trained centroids, and the
  * classic invariants hold (silhouette ∈ [−1, 1], scatter ≥ 0, R_i > 0).
  */
class ClusterValiditySpec extends AnyFunSuite {
  import SparkTestBase._

  private def rp6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def d2(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** (vec_id, v) with the gate's own float→double normalization. */
  private lazy val pts: Seq[(Long, Seq[Double])] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("CAST(vec_id AS BIGINT) AS vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq

  private lazy val cents: Seq[(Int, Seq[Double])] =
    VectorOps.kmeansCentroids(spark, sfDir)

  /** argmin assignment, ties to the smaller cid (the gate's when-chain). */
  private lazy val assigned: Seq[(Long, Int, Double)] = pts.map { case (id, v) =>
    val ds = cents.map { case (cid, cv) => (cid, d2(v, cv)) }
    val (cid, dmin) = ds.minBy { case (c, dd) => (dd, c) }
    (id, cid, dmin)
  }

  test("q_silhouette equals the scalar mirror per cluster") {
    val mirror = assigned.map { case (id, cid, dmin) =>
      val v = pts.find(_._1 == id).get._2
      val b2 = cents.filter(_._1 != cid).map(c => d2(v, c._2)).min
      val (a, b) = (math.sqrt(dmin), math.sqrt(b2))
      (cid, if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b))
    }.groupBy(_._1).map { case (cid, ss) =>
      val sum = ss.map(s => BigDecimal(s._2).setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum
      (cid.toLong, ss.size.toLong, rp6(sum.toDouble / ss.size))
    }.toSeq.sortBy(_._1)
    val got = VectorOps.qSilhouette(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == mirror, s"gate:\n$got\nmirror:\n$mirror")
    got.foreach { case (c, _, s) =>
      assert(s >= -1.0 && s <= 1.0, s"cluster $c silhouette $s out of range") }
  }

  test("q_davies_bouldin equals the scalar mirror per cluster") {
    val scat = assigned.groupBy(_._2).map { case (cid, rows) =>
      val sum = rows.map(r => BigDecimal(math.sqrt(r._3))
        .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum
      cid -> (rows.size.toLong, sum.toDouble / rows.size)
    }
    val mirror = scat.toSeq.sortBy(_._1).map { case (i, (n, si)) =>
      val ri = cents.filter(_._1 != i).map { case (j, cj) =>
        (si + scat(j)._2) / math.sqrt(d2(cents.find(_._1 == i).get._2, cj))
      }.max
      (i.toLong, n, rp6(si), rp6(ri))
    }
    val got = VectorOps.qDaviesBouldin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == mirror, s"gate:\n$got\nmirror:\n$mirror")
    got.foreach { case (c, _, s, r) =>
      assert(s >= 0.0 && r > 0.0, s"cluster $c scatter=$s r_i=$r") }
  }
}
