package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** q_sax proofs: the distributed SAX pipeline (hourly decimal sums → PAA
  * by integer index split → z-score → breakpoint symbol) equals a
  * from-scratch scalar mirror on constructed series with known symbols,
  * and on the real sf0.001 events.
  */
class SaxSpec extends AnyFunSuite {
  import SparkTestBase._
  import EventOps.{SAX_SEGS, SAX_BP}

  private def rp(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  /** Scalar mirror over per-type hourly value sums (hour index order). */
  private def mirror(series: Map[String, Seq[Double]])
      : Seq[(String, Long, Long, Double, Double, String)] =
    series.toSeq.sortBy(_._1).flatMap { case (et, vs) =>
      val n = vs.size
      val s1 = vs.sum
      val s2 = vs.map(v => v * v).sum
      val mu = s1 / n
      val sd = math.sqrt(s2 / n - mu * mu)
      vs.zipWithIndex.groupBy { case (_, i) => i.toLong * SAX_SEGS / n }
        .toSeq.sortBy(_._1).map { case (seg, seq) =>
          val paa = seq.map(_._1).sum / seq.size
          val z = (paa - mu) / sd
          val sym = if (z < -SAX_BP) "a" else if (z < 0) "b"
                    else if (z < SAX_BP) "c" else "d"
          (et, seg, seq.size.toLong, rp(paa), rp(z), sym)
        }
    }

  /** One event per (type, hour) carrying that hour's value (2-dp). */
  private def run(series: Map[String, Seq[Double]])
      : Seq[(String, Long, Long, Double, Double, String)] = {
    import spark.implicits._
    val ev = series.toSeq.flatMap { case (et, vs) =>
      vs.zipWithIndex.map { case (v, h) => (et.hashCode.toLong * 1000 + h,
        1L, h * 3600L + 60L, et, v) }
    }.toDF("event_id", "user_id", "sec", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"),
        col("event_type"), col("value"), lit("{}").as("props"))
    val dir = java.nio.file.Files.createTempDirectory("sax").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    EventOps.qSax(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getString(5))).toSeq
  }

  test("monotone ramp symbolizes a..d; uneven length splits ⌊idx·S/n⌋") {
    // 18 hours (not divisible by 8 → segment sizes 3,2,2,2,3,2,2,2) of a
    // linear ramp: PAA means ascend, so symbols must be non-decreasing
    // and hit all four letters
    val got = run(Map("ramp" -> (1 to 18).map(_.toDouble * 10)))
    assert(got == mirror(Map("ramp" -> (1 to 18).map(_.toDouble * 10))))
    assert(got.map(_._3) == Seq(3L, 2L, 2L, 2L, 3L, 2L, 2L, 2L))
    assert(got.map(_._6).distinct.sorted == Seq("a", "b", "c", "d"))
    assert(got.map(_._6) == got.map(_._6).sorted)
  }

  test("two types z-normalize independently despite different magnitudes") {
    val series = Map(
      "small" -> Seq(1.0, 1.0, 2.0, 2.0, 1.0, 1.0, 3.0, 3.0),
      "big" -> Seq(100.0, 100.0, 200.0, 200.0, 100.0, 100.0, 300.0, 300.0))
    val got = run(series)
    assert(got == mirror(series))
    // identical shapes at 100× scale → identical symbol words
    assert(got.filter(_._1 == "small").map(_._6) ==
      got.filter(_._1 == "big").map(_._6))
  }

  test("gate equals the scalar mirror on the real sf0.001 events") {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
      .orderBy("event_type", "hr").collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    val series = hourly.groupBy(_._1).map { case (et, xs) => et -> xs.map(_._2).toSeq }
    val got = EventOps.qSax(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getString(5))).toSeq
    assert(got == mirror(series))
  }
}
