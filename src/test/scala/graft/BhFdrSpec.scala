package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q_bh_fdr proofs: the per-source KS→p→BH chain equals a from-scratch
  * scalar mirror on the real sf0.001 documents, the reject set is a rank
  * PREFIX (the step-up's defining shape: one passing high rank rescues
  * every lower rank), and the p-values are consistent with q_ks_test's
  * statistics.
  */
class BhFdrSpec extends AnyFunSuite {
  import SparkTestBase._

  private def rp(x: Double, n: Int) = {
    val p = math.pow(10, n); math.floor(x * p + 0.5) / p
  }

  /** (source, n_chars) collected once. */
  private lazy val docs: Seq[(String, Long)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("source", "CAST(n_chars AS BIGINT) AS x")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** From-scratch per-source KS D via cross-multiplied integer ECDFs. */
  private lazy val ksMirror: Seq[(String, Long, Long, Double)] = {
    val n = docs.size.toLong
    val xs = docs.map(_._2).distinct.sorted
    val cumAll = xs.scanLeft(0L)((acc, x) =>
      acc + docs.count(_._2 == x)).tail
    docs.groupBy(_._1).toSeq.map { case (src, rs) =>
      val m = rs.size.toLong
      val cumSrc = xs.scanLeft(0L)((acc, x) =>
        acc + rs.count(_._2 == x)).tail
      val num = xs.indices.map(i =>
        (BigInt(cumSrc(i)) * n - BigInt(cumAll(i)) * m).abs).max
      (src, m, n, num.toDouble / (m.toDouble * n.toDouble))
    }
  }

  private lazy val mirror: Seq[(Int, String, Long, Double, Double, Int)] = {
    val withP = ksMirror.map { case (src, m, n, d) =>
      val ne = m.toDouble * n.toDouble / (m.toDouble + n.toDouble)
      val lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
      val l2 = lam * lam
      val praw = 2.0 * (math.exp(-2.0 * l2) - math.exp(-8.0 * l2) +
        math.exp(-18.0 * l2) - math.exp(-32.0 * l2) + math.exp(-50.0 * l2))
      (src, m, d, math.min(1.0, math.max(0.0, praw)))
    }
    val ranked = withP.sortBy(t => (t._4, t._1)).zipWithIndex
      .map { case ((src, m, d, p), i) => (i + 1, src, m, d, p) }
    val mm = ranked.size.toDouble
    val kmax = ranked.filter { case (rk, _, _, _, p) =>
      p <= TextOps.BH_ALPHA * rk.toDouble / mm }
      .map(_._1).foldLeft(0)(math.max)
    ranked.map { case (rk, src, m, d, p) =>
      (rk, src, m, rp(d, 6), rp(p, 6), if (rk <= kmax) 1 else 0) }
  }

  test("q_bh_fdr equals the scalar mirror") {
    val got = TextOps.qBhFdr(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5))).toSeq
    assert(got == mirror, s"gate:\n$got\nmirror:\n$mirror")
  }

  test("rejects form a rank prefix and ks_d agrees with q_ks_test") {
    val got = TextOps.qBhFdr(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(3),
        r.getInt(5))).toSeq
    val rejected = got.filter(_._4 == 1).map(_._1)
    if (rejected.nonEmpty)
      assert(rejected == (1 to rejected.max).toList,
        s"rejects are not a rank prefix: $rejected")
    val ks = TextOps.qKsTest(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    got.foreach { case (_, src, d, _) =>
      assert(ks(src) == d, s"$src ks_d drifted: gate $d vs q_ks_test ${ks(src)}") }
  }
}
