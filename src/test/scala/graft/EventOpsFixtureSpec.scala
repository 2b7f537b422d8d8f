package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Fixture-based evidence for E12 (entropy / information gain, reference
  * src/base/math/Entropy.cpp:11-77) that does NOT depend on the driver's
  * `/root/testdata` — the round-8 testdata regeneration silently removed
  * all events-table gate rows for two rounds, so the §2 row needs spec
  * evidence that survives any future regeneration.
  *
  * The fixture is small enough that the expected values are exact by hand:
  *
  *  - event_type counts a:4 b:2 c:2 over 8 events → p = (1/2, 1/4, 1/4)
  *    → H = ½·1 + ¼·2 + ¼·2 = 1.5 bits.
  *  - label hi = (value ≥ 50): a splits 2/2 (H=1 bit), b all-hi (H=0),
  *    c all-lo (H=0); marginal label is 4/4 (H=1 bit)
  *    → IG = 1 − (½·1 + ¼·0 + ¼·0) = 0.5 bits.
  */
class EventOpsFixtureSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val dir: String = {
    val base = java.nio.file.Files.createTempDirectory("graft-e12").toString
    val rows = Seq(
      // (event_id, t_us, user_id, event_type, value)
      (1L, 1000000L, 1L, "a", 90.0), (2L, 2000000L, 1L, "a", 80.0),
      (3L, 3000000L, 2L, "a", 10.0), (4L, 4000000L, 2L, "a", 20.0),
      (5L, 5000000L, 3L, "b", 70.0), (6L, 6000000L, 3L, "b", 60.0),
      (7L, 7000000L, 4L, "c", 30.0), (8L, 8000000L, 4L, "c", 40.0))
    import spark.implicits._
    rows.toDF("event_id", "t_us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("t_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .write.parquet(base + "/events.parquet")
    base
  }

  test("E12 entropy: H(event_type) on the hand-computed fixture is exactly 1.5 bits") {
    val got = operators.EventOps.qEntropy(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getDouble(0) == 1.5)
  }

  test("E12 info gain: IG(event_type → value≥50) on the fixture is exactly 0.5 bits") {
    val got = operators.EventOps.qInfoGain(spark, dir).collect()
    assert(got.length == 1)
    assert(got(0).getDouble(0) == 0.5)
  }

  /** Hand-computed series fixture for the statistics gates: one type,
    * six hours, hourly event COUNTS 1..6 and hourly value SUMS
    * [1,1,1,9,9,9] (per-hour values chosen to sum exactly in
    * decimal(18,6)). Every expected number below is exact:
    *  - changepoint: the step is at k=3 — both segments are constant, so
    *    SSE(3) = 0 (the unique minimum), means 1 and 9.
    *  - Theil–Sen: counts are the line c = h+1, so ALL 15 pairwise
    *    slopes are exactly 1 → median 1.
    *  - burstiness: mean([1..6]) = 3.5 and sample var([1..6]) = 17.5/5
    *    = 3.5 → Fano factor exactly 1. */
  private lazy val seriesDir: String = {
    val base = java.nio.file.Files.createTempDirectory("graft-series").toString
    val perHour: Seq[Seq[Double]] = Seq(
      Seq(1.0), Seq(0.5, 0.5), Seq(0.4, 0.4, 0.2),
      Seq(2.25, 2.25, 2.25, 2.25), Seq(1.8, 1.8, 1.8, 1.8, 1.8),
      Seq(1.5, 1.5, 1.5, 1.5, 1.5, 1.5))
    val rows = for {
      (vs, h) <- perHour.zipWithIndex
      (v, i) <- vs.zipWithIndex
    } yield (h.toLong * 10 + i + 1, h.toLong * 3600000000L + i * 1000000L,
      1L, "a", v)
    import spark.implicits._
    rows.toDF("event_id", "t_us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("t_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .write.parquet(base + "/events.parquet")
    base
  }

  test("q_changepoint finds the exact step: k=3, SSE 0, means 1 and 9") {
    val got = operators.EventOps.qChangepoint(spark, seriesDir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("n_hours") == 6L)
    assert(r.getAs[Int]("best_k") == 3)
    assert(r.getAs[Double]("sse_best") == 0.0)
    assert(r.getAs[Double]("mean_left") == 1.0)
    assert(r.getAs[Double]("mean_right") == 9.0)
  }

  test("q_theil_sen on the exact line c = h+1 reports slope 1 over 15 pairs") {
    val got = operators.EventOps.qTheilSen(spark, seriesDir).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("n_pairs") == 15L)
    assert(got(0).getAs[Double]("ts_slope") == 1.0)
  }

  test("q_burstiness on counts 1..6 is the exact Fano factor 1") {
    val got = operators.EventOps.qBurstiness(spark, seriesDir).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Double]("mean_c") == 3.5)
    assert(got(0).getAs[Double]("fano") == 1.0)
  }

  test("q_holt_forecast agrees with the error-correction form of the recurrences") {
    import org.apache.spark.sql.functions._
    import graft.operators.EventOps.{HOLT_ALPHA, HOLT_BETA}
    // independent path: the ALGEBRAICALLY equivalent error-correction
    // rendering (lNew = (l+b) + α·e, bNew = b + α·β·e) — different
    // floating-point op order, so agreement within a drift tolerance is
    // evidence the gate computes Holt's recurrence, not merely itself
    val rows = Tables.events(SparkTestBase.spark, SparkTestBase.sfDir)
      .groupBy(expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("hr"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (h0, h1) = (rows.map(_._1).min, rows.map(_._1).max)
    val got = graft.operators.EventOps.qHoltForecast(SparkTestBase.spark, SparkTestBase.sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.values.map(_._1).toSet == Set(h1 - h0 + 1),
      "dense fill must give every type the identical global span")
    for (t <- rows.map(_._2).distinct) {
      val m = rows.collect { case (h, `t`, n) => h -> n }.toMap
      val y = (h0 to h1).map(h => m.getOrElse(h, 0L).toDouble)
      var l = y(0); var b = y(1) - y(0); var sae = 0.0
      for (i <- 1 until y.length) {
        val e = y(i) - (l + b)
        sae += math.abs(e)
        l = (l + b) + HOLT_ALPHA * e
        b = b + HOLT_ALPHA * HOLT_BETA * e
      }
      val (_, mae, lev, tr) = got(t)
      val mMae = sae / (y.length - 1)
      assert(math.abs(mae - mMae) < 1e-6 * (1 + mMae.abs), s"$t mae $mae vs $mMae")
      assert(math.abs(lev - l) < 1e-6 * (1 + l.abs), s"$t level $lev vs $l")
      assert(math.abs(tr - b) < 1e-6 * (1 + b.abs), s"$t trend $tr vs $b")
    }
  }

  test("q_holt_winters agrees with the error-correction form of the recurrences") {
    import org.apache.spark.sql.functions._
    import graft.operators.EventOps.{HW_ALPHA, HW_BETA, HW_GAMMA, HW_M}
    // error-correction rendering: l += b + αe; b += αβe; s[i] += γ(1−α)e
    // — algebraically equal, different op order, tolerance-compared
    val rows = Tables.events(SparkTestBase.spark, SparkTestBase.sfDir)
      .groupBy(expr("unix_timestamp(date_trunc('hour', ts)) div 3600").as("hr"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (h0, h1) = (rows.map(_._1).min, rows.map(_._1).max)
    val got = graft.operators.EventOps.qHoltWinters(SparkTestBase.spark, SparkTestBase.sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getLong(7)))
      .toMap
    for (t <- rows.map(_._2).distinct) {
      val m = rows.collect { case (h, `t`, n) => h -> n }.toMap
      val y = (h0 to h1).map(h => m.getOrElse(h, 0L).toDouble)
      val l0 = y.take(HW_M).sum / 24.0
      var l = l0
      var b = (y.slice(HW_M, 2 * HW_M).sum / 24.0 - l0) / 24.0
      val sA = Array.tabulate(HW_M)(j => y(j) - l0)
      var sae = 0.0
      for (i <- 2 * HW_M until y.length) {
        val idx = i % HW_M
        val e = y(i) - (l + b + sA(idx))
        sae += math.abs(e)
        l = (l + b) + HW_ALPHA * e
        b = b + HW_ALPHA * HW_BETA * e
        sA(idx) = sA(idx) + HW_GAMMA * (1 - HW_ALPHA) * e
      }
      val (nH, nF, mae, lev, tr, amp, peak) = got(t)
      assert(nH == y.length && nF == y.length - 2 * HW_M)
      val mMae = sae / (y.length - 2 * HW_M)
      assert(math.abs(mae - mMae) < 1e-6 * (1 + mMae.abs), s"$t mae $mae vs $mMae")
      assert(math.abs(lev - l) < 1e-6 * (1 + l.abs), s"$t level $lev vs $l")
      assert(math.abs(tr - b) < 1e-6 * (1 + b.abs), s"$t trend $tr vs $b")
      assert(math.abs(amp - (sA.max - sA.min)) < 1e-5, s"$t amp $amp")
      assert(peak >= 0 && peak < HW_M)
      assert(peak == sA.indexOf(sA.max).toLong, s"$t peak $peak vs mirror")
    }
  }

  test("Holt gates emit EMPTY frames on degenerate spans, matching the oracle (r12 advice)") {
    // the E12 fixture spans ONE hourly bucket: the forecast oracle's
    // recursion base needs an i=1 row (span >= 2) and the HW oracle now
    // guards ln.len > 2*HW_M — the Spark side must return the same empty
    // result instead of throwing
    val hf = operators.EventOps.qHoltForecast(spark, dir)
    assert(hf.collect().isEmpty)
    assert(hf.columns.toSeq ==
      Seq("event_type", "n_hours", "mae", "level", "trend"))
    val hw = operators.EventOps.qHoltWinters(spark, dir)
    assert(hw.collect().isEmpty)
    assert(hw.columns.toSeq == Seq("event_type", "n_hours", "n_forecasts",
      "mae", "level", "trend", "season_amp", "peak_hour"))
  }
}
