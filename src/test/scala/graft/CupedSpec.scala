package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps

/** q_cuped proofs: the gate equals a from-scratch scalar CUPED mirror on
  * the real sf0.001 events, and the realized variance reduction matches
  * the 1 − ρ² identity implied by the pooled θ = cov/var choice.
  */
class CupedSpec extends AnyFunSuite {
  import SparkTestBase._

  private def rp(x: Double, n: Int) = {
    val p = math.pow(10, n); math.floor(x * p + 0.5) / p
  }

  /** (user_id, di, value) with the gate's own ts→epoch-day derivation. */
  private lazy val rows: Seq[(Long, Long, BigDecimal)] =
    Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS di",
        "CAST(value AS DECIMAL(18,2)) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
      .toSeq

  private lazy val mirror: (Long, Long, Double, Double, Double, Double, Double, Double) = {
    val mid = (rows.map(_._2).min + rows.map(_._2).max) / 2
    val per = rows.groupBy(_._1).map { case (uid, rs) =>
      val x = rs.filter(_._2 < mid).map(_._3).sum
      val y = rs.filter(_._2 >= mid).map(_._3).sum
      (uid % 2, x, y)
    }.toSeq
    def mom(ps: Seq[(Long, BigDecimal, BigDecimal)]) = {
      val n = ps.size.toDouble
      val sx = ps.map(_._2).sum.toDouble
      val sy = ps.map(_._3).sum.toDouble
      val sxx = ps.map(p => p._2 * p._2).sum.toDouble
      val syy = ps.map(p => p._3 * p._3).sum.toDouble
      val sxy = ps.map(p => p._2 * p._3).sum.toDouble
      (n, sx, sy, sxx, syy, sxy)
    }
    val (n, sx, sy, sxx, syy, sxy) = mom(per)
    val mx = sx / n
    val vx = (sxx - sx * sx / n) / (n - 1)
    val vy = (syy - sy * sy / n) / (n - 1)
    val cv = (sxy - sx * sy / n) / (n - 1)
    val theta = cv / vx
    def side(v: Long) = mom(per.filter(_._1 == v))
    val (n0, sx0, sy0, sxx0, syy0, sxy0) = side(0)
    val (n1, sx1, sy1, sxx1, syy1, sxy1) = side(1)
    def svar(sq: Double, sm: Double, nn: Double) = (sq - sm * sm / nn) / (nn - 1)
    def scov(sp: Double, sa: Double, sb: Double, nn: Double) =
      (sp - sa * sb / nn) / (nn - 1)
    val (my0, my1) = (sy0 / n0, sy1 / n1)
    val (vy0, vy1) = (svar(syy0, sy0, n0), svar(syy1, sy1, n1))
    val (vx0, vx1) = (svar(sxx0, sx0, n0), svar(sxx1, sx1, n1))
    val (cv0, cv1) = (scov(sxy0, sx0, sy0, n0), scov(sxy1, sx1, sy1, n1))
    val ma0 = my0 - theta * (sx0 / n0 - mx)
    val ma1 = my1 - theta * (sx1 / n1 - mx)
    val va0 = vy0 - 2.0 * theta * cv0 + theta * theta * vx0
    val va1 = vy1 - 2.0 * theta * cv1 + theta * theta * vx1
    val vyc = vy - 2.0 * theta * cv + theta * theta * vx
    (n0.toLong, n1.toLong, rp(theta, 6), rp(ma0, 6), rp(ma1, 6),
      rp((my0 - my1) / math.sqrt(vy0 / n0 + vy1 / n1), 4),
      rp((ma0 - ma1) / math.sqrt(va0 / n0 + va1 / n1), 4),
      rp(1.0 - vyc / vy, 6))
  }

  test("q_cuped equals the scalar mirror") {
    val r = EventOps.qCuped(spark, sfDir).collect()
    assert(r.length == 1)
    val g = (r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2),
      r(0).getDouble(3), r(0).getDouble(4), r(0).getDouble(5),
      r(0).getDouble(6), r(0).getDouble(7))
    assert(g == mirror, s"gate $g vs mirror $mirror")
  }

  test("variance reduction matches the 1 - rho^2 identity of the pooled theta") {
    val per = {
      val mid = (rows.map(_._2).min + rows.map(_._2).max) / 2
      rows.groupBy(_._1).map { case (_, rs) =>
        (rs.filter(_._2 < mid).map(_._3).sum.toDouble,
          rs.filter(_._2 >= mid).map(_._3).sum.toDouble)
      }.toSeq
    }
    val n = per.size.toDouble
    val (mx, my) = (per.map(_._1).sum / n, per.map(_._2).sum / n)
    val vx = per.map(p => (p._1 - mx) * (p._1 - mx)).sum / (n - 1)
    val vy = per.map(p => (p._2 - my) * (p._2 - my)).sum / (n - 1)
    val cv = per.map(p => (p._1 - mx) * (p._2 - my)).sum / (n - 1)
    val rho2 = cv * cv / (vx * vy)
    val got = EventOps.qCuped(spark, sfDir).collect()(0).getDouble(7)
    assert(math.abs(got - rho2) < 1e-4, s"var_reduction $got vs rho^2 $rho2")
    assert(got > 0.0 && got < 1.0)
  }
}
