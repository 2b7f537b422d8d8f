package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps

/** q_bootstrap_ci proofs: the deterministic Poisson-bootstrap equals a
  * from-scratch scalar mirror (md5 hash, Weyl-stepped uniforms, integer
  * threshold draws, exact decimal replicate sums), the weight stream is
  * unbiased (mean weight ≈ 1), and the CI brackets the estimates.
  */
class BootstrapSpec extends AnyFunSuite {
  import SparkTestBase._

  private def rp(x: Double, n: Int) = {
    val p = math.pow(10, n); math.floor(x * p + 0.5) / p
  }

  private def hash32(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  private lazy val rows: Seq[(Long, BigDecimal)] =
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_id", "CAST(value AS DECIMAL(18,2)) AS v")
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDecimal(1)))).toSeq

  private lazy val weights: Seq[(Int, Long, BigDecimal)] = // (b, w, value)
    for {
      (id, v) <- rows
      b <- 0 until EventOps.BOOT_B
    } yield {
      val h = hash32(s"boot_$id")
      val r = (h + b * EventOps.BOOT_STEP) % 4294967296L
      val w = EventOps.BOOT_CDF.count(_ <= r)
      (b, w.toLong, v)
    }

  test("q_bootstrap_ci equals the scalar mirror") {
    val reps = weights.groupBy(_._1).toSeq.map { case (b, ws) =>
      val sw = ws.map(_._2).sum
      val swv = ws.map(t => t._3 * BigDecimal(t._2)).sum
      (b, swv.toDouble / sw.toDouble)
    }
    val ranked = reps.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((_, m), i) => (i + 1, m) }
    val bn = ranked.size.toDouble
    val sm = ranked.map(t => BigDecimal(t._2)
      .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val smm = ranked.map(t => BigDecimal(t._2 * t._2)
      .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val lo = ranked.find(_._1 == EventOps.BOOT_LO).get._2
    val hi = ranked.find(_._1 == EventOps.BOOT_HI).get._2
    val n = rows.size.toDouble
    val mirror = (rows.size.toLong, ranked.size.toLong,
      rp(rows.map(_._2).sum.toDouble / n, 6),
      rp(sm / bn, 6),
      rp(math.sqrt((smm - sm * sm / bn) / (bn - 1)), 6),
      rp(lo, 6), rp(hi, 6))
    val r = EventOps.qBootstrapCi(spark, sfDir).collect()
    assert(r.length == 1)
    val g = (r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2),
      r(0).getDouble(3), r(0).getDouble(4), r(0).getDouble(5),
      r(0).getDouble(6))
    assert(g == mirror, s"gate $g vs mirror $mirror")
  }

  test("weights are Poisson(1)-unbiased and the CI is ordered") {
    val meanW = weights.map(_._2).sum.toDouble /
      (rows.size.toDouble * EventOps.BOOT_B)
    assert(meanW > 0.93 && meanW < 1.07, s"mean weight $meanW drifted from 1")
    val r = EventOps.qBootstrapCi(spark, sfDir).collect()(0)
    val (est, bm, se, lo, hi) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(lo <= bm && bm <= hi, s"CI [$lo, $hi] does not bracket $bm")
    assert(se > 0.0)
    assert(math.abs(bm - est) < 4 * se, s"boot mean $bm far from estimate $est")
  }
}
