package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** q_conformal proofs: the distributed split-conformal pipeline equals a
  * from-scratch scalar mirror (explicit OLS fit, sorted-residual order
  * statistic, direct coverage count) on constructed splits and on the
  * real sf0.001 events, and realized coverage sits at the theory's
  * ≥ 1−α floor on well-behaved data.
  */
class ConformalSpec extends AnyFunSuite {
  import SparkTestBase._
  import EventOps.{CONF_NUM, CONF_DEN}

  private def rp(x: Double, p: Int) = {
    val m = math.pow(10, p); math.floor(x * m + 0.5) / m
  }

  /** hash32("cal_"+id) % 3 — the gate's split. */
  private def split(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"cal_$id".getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16) % 3
  }

  /** Scalar mirror over (event_id, type, x, y) rows. */
  private def mirror(rows: Seq[(Long, String, Double, Double)])
      : Seq[(String, Long, Long, Long, Double, Double)] =
    rows.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (et, rs) =>
      val tr = rs.filter(r => split(r._1) == 0)
      val ca = rs.filter(r => split(r._1) == 1)
      val te = rs.filter(r => split(r._1) == 2)
      // decimal-exact moment sums, mirroring the gate's casts
      def dsum(xs: Seq[Double], p: Int): Double =
        xs.map { v =>
          val dd = org.apache.spark.sql.types.Decimal(v)
          require(dd.changePrecision(p, 6)); dd.toJavaBigDecimal
        }.reduce(_.add(_)).doubleValue
      val n = tr.size.toDouble
      val sx = dsum(tr.map(_._3), 18); val sy = dsum(tr.map(_._4), 18)
      val sxy = dsum(tr.map(r => r._3 * r._4), 28)
      val sxx = dsum(tr.map(r => r._3 * r._3), 18)
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      def r(p: (Long, String, Double, Double)) = math.abs(p._4 - (a + b * p._3))
      val k = (CONF_NUM * (ca.size + 1) + CONF_DEN - 1) / CONF_DEN
      if (k > ca.size) None
      else {
        val qh = ca.map(r).sorted.apply(k - 1)
        val cov = te.count(p => r(p) <= qh)
        Some((et, tr.size.toLong, ca.size.toLong, te.size.toLong,
          rp(qh, 6), rp(cov.toDouble / te.size, 4)))
      }
    }

  private def run(rows: Seq[(Long, String, Double, Double)])
      : Seq[(String, Long, Long, Long, Double, Double)] = {
    import spark.implicits._
    // place each row inside the hour-of-day slot the gate derives x from:
    // sec = day·86400 + x·3600 + jitter<3600 ⇒ (sec div 3600) % 24 = x
    val ev = rows.map { case (id, et, x, y) =>
      (id, 1L, (id / 24) * 86400L + x.toLong * 3600L + id % 60, et, y)
    }.toDF("event_id", "user_id", "sec", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"),
        col("event_type"), col("value"), lit("{}").as("props"))
    val dir = java.nio.file.Files.createTempDirectory("conf").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    EventOps.qConformal(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
  }

  /** Deterministic fixture: y = 2x + 5 + bounded sin noise; x cycles the
    * 24 hours so the OLS is well-conditioned. */
  private def fixture(n: Int): Seq[(Long, String, Double, Double)] =
    (0L until n.toLong).map { i =>
      val x = (i % 24).toDouble
      (i, "click", x, rp(2.0 * x + 5.0 + 3.0 * math.sin(i * 7.3), 2))
    }

  test("mirror equality and the finite-sample coverage floor on a planted model") {
    val rows = fixture(3000)
    val got = run(rows)
    assert(got == mirror(rows), s"gate vs mirror: $got")
    // exchangeable residuals: realized coverage concentrates near 0.9
    val cov = got.head._6
    assert(cov >= 0.85 && cov <= 0.96, s"coverage far from the 0.9 target: $cov")
  }

  test("gate equals the scalar mirror on the real sf0.001 events") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        (expr("unix_micros(ts) div 3600000000") % 24).cast("double").as("x"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSeq
    val got = EventOps.qConformal(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == mirror(rows))
  }
}
