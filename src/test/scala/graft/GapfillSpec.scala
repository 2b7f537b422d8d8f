package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalOps

/** q_gapfill semantics on constructed series: daily resampling onto the
  * common grid, forward-fill carrying the LAST observation (not the next),
  * linear interpolation hitting the exact line between anchors, and null
  * edges where no anchor exists on one side.
  */
class GapfillSpec extends AnyFunSuite {
  import SparkTestBase._

  private val DAY = TemporalOps.GAP_DAY_US

  /** (user, day-offset, value) → events rows at noon of that day. */
  private def run(rows: Seq[(Long, Int, Double)]): Map[(Long, Long), (Option[Double], Option[Double], Option[Double])] = {
    import spark.implicits._
    val df = rows.map { case (u, day, v) =>
      (1L, new Timestamp((day.toLong * DAY + DAY / 2) / 1000), u, "purchase", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    TemporalOps.gapfillOf(df).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      (r.getLong(0), r.getLong(1)) -> ((opt(2), opt(3), opt(4)))
    }.toMap
  }

  test("gaps forward-fill from the last observation and interpolate on the line") {
    // user 0: days 0, 3 observed (10.0, 40.0) — days 1, 2 are gaps on the
    // exact line v = 10 + 10·d; user 74: day 1 only (shapes the grid)
    val got = run(Seq((0L, 0, 10.0), (0L, 3, 40.0), (74L, 1, 7.0)))
    assert(got((0L, 0L)) == ((Some(10.0), Some(10.0), Some(10.0))))
    assert(got((0L, 1L)) == ((None, Some(10.0), Some(20.0))), s"day 1: ${got((0L, 1L))}")
    assert(got((0L, 2L)) == ((None, Some(10.0), Some(30.0))), s"day 2: ${got((0L, 2L))}")
    assert(got((0L, 3L)) == ((Some(40.0), Some(40.0), Some(40.0))))
  }

  test("edges stay null where an anchor side is missing; ffill needs only the left") {
    val got = run(Seq((0L, 1, 5.0), (74L, 0, 1.0), (74L, 3, 2.0)))
    // user 0 on the common grid [0..3]: leading day has NO left anchor
    assert(got((0L, 0L)) == ((None, None, None)), "before the first obs: all null")
    assert(got((0L, 2L)) == ((None, Some(5.0), None)),
      "trailing gap: ffill carries, interp has no right anchor")
    assert(got((0L, 3L)) == ((None, Some(5.0), None)))
  }

  test("same-day purchases sum exactly; non-cohort users and other types are excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, new Timestamp(DAY / 2000), 0L, "purchase", 0.1, "{}"),
      (2L, new Timestamp(DAY / 2000), 0L, "purchase", 0.2, "{}"),
      (3L, new Timestamp(DAY / 2000), 0L, "click", 9.9, "{}"),
      (4L, new Timestamp(DAY / 2000), 5L, "purchase", 9.9, "{}") // 5 % 37 != 0
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = TemporalOps.gapfillOf(df).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 0L)
    assert(r.getDouble(2) == 0.3,
      s"0.1 + 0.2 through decimal(18,2) is exactly 0.3: ${r.getDouble(2)}")
  }

  test("the gate matches a scalar mirror on the real sf0.001 events") {
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase" &&
        col("user_id") % TemporalOps.GAP_STRIDE === 0)
      .select(col("user_id"), expr(s"unix_micros(ts) div $DAY").as("day"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val daily: Map[(Long, Long), Double] = rows.groupBy(r => (r._1, r._2))
      .map { case (k, vs) =>
        // the gate's decimal(18,2) sum, mirrored driver-side
        val s = vs.map(v => new java.math.BigDecimal(v._3.toString)
            .setScale(2, java.math.RoundingMode.HALF_UP))
          .reduce(_.add(_))
        k -> s.doubleValue
      }
    val (d0, d1) = (rows.map(_._2).min, rows.map(_._2).max)
    val users = rows.map(_._1).distinct.sorted
    def rp(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = TemporalOps.qGapfill(spark, sfDir).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      (r.getLong(0), r.getLong(1)) -> ((opt(2), opt(3), opt(4)))
    }.toMap
    assert(got.size == users.size * (d1 - d0 + 1).toInt, "full user × day grid")
    for (u <- users; day <- d0 to d1) {
      val v = daily.get((u, day))
      val past = (d0 to day).filter(dd => daily.contains((u, dd)))
      val future = (day to d1).filter(dd => daily.contains((u, dd)))
      val ffill = past.lastOption.map(dd => daily((u, dd)))
      val interp = v.orElse {
        for (p <- past.lastOption; n <- future.headOption) yield {
          val (pv, nv) = (daily((u, p)), daily((u, n)))
          pv + (nv - pv) * ((day - p).toDouble / (n - p).toDouble)
        }
      }
      assert(got((u, day)) == ((v.map(rp), ffill.map(rp), interp.map(rp))),
        s"user $u day $day: ${got((u, day))}")
    }
  }
}
