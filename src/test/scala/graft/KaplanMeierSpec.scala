package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** q_kaplan_meier proofs: the distributed KM curve equals a from-scratch
  * scalar estimator (product-limit over observed churn times with right
  * censoring) on constructed lifetimes covering the censoring, tie, and
  * final-row d = n_risk corners, and on the real sf0.001 events table.
  */
class KaplanMeierSpec extends AnyFunSuite {
  import SparkTestBase._
  import EventOps.KM_CENSOR_DAYS

  /** Scalar product-limit mirror over (dur, churn) lifetimes — an
    * independent textbook implementation (direct running product, no
    * ln-sum), so agreement with the gate's decimal ln-sum rendering is
    * evidence, not tautology. Returns rows (t, n_risk, d, survival). */
  private def mirror(lifetimes: Seq[(Long, Boolean)]): Seq[(Long, Long, Long, Double)] = {
    def rp(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val n = lifetimes.size.toLong
    val byT = lifetimes.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = n
    var s = 1.0
    byT.flatMap { case (t, ls) =>
      val d = ls.count(_._2).toLong
      val row = if (d > 0) {
        s = if (d == atRisk) 0.0 else s * (1.0 - d.toDouble / atRisk.toDouble)
        Some((t, atRisk, d, rp(s)))
      } else None
      atRisk -= ls.size
      row
    }
  }

  /** Build an events frame giving each user a first click on day d0 and a
    * last purchase on day d1 (the gate's lifetime span), plus one
    * no-purchase browser (user 999) that the cohort filter must drop. */
  private def run(spans: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Double)] = {
    import spark.implicits._
    val ev = (spans.flatMap { case (uid, d0, d1) =>
      Seq((uid * 2, uid, d0 * 86400L, "click"),
        (uid * 2 + 1, uid, d1 * 86400L + 3600L, "purchase"))
    } :+ ((9999L, 999L, 86400L, "view")))
      .toDF("event_id", "user_id", "sec", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"),
        col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
    val dir = java.nio.file.Files.createTempDirectory("km").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    EventOps.qKaplanMeier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
  }

  /** The fixture's lifetimes as the mirror sees them: dur = d1 − d0,
    * churn = corpus-max-day − d1 ≥ KM_CENSOR_DAYS. */
  private def lifetimes(spans: Seq[(Long, Long, Long)]): Seq[(Long, Boolean)] = {
    val dmax = spans.map(_._3).max
    spans.map { case (_, d0, d1) => (d1 - d0, dmax - d1 >= KM_CENSOR_DAYS) }
  }

  test("censoring: late-active users reduce risk sets but never count as churn") {
    // users 1-3 churn at durations 2, 2, 5; users 4-5 still active near
    // the corpus end (censored) — the t=5 step must divide by a risk set
    // that excludes them only after their durations pass
    val spans = Seq(
      (1L, 0L, 2L), (2L, 10L, 12L), (3L, 0L, 5L),
      (4L, 95L, 98L), (5L, 40L, 100L))
    assert(run(spans) == mirror(lifetimes(spans)))
  }

  test("tied churn times aggregate into one step") {
    val spans = Seq(
      (1L, 0L, 3L), (2L, 7L, 10L), (3L, 20L, 23L), // three churns at dur 3
      (4L, 0L, 8L), (5L, 92L, 100L))
    val got = run(spans)
    assert(got == mirror(lifetimes(spans)))
    assert(got.count(_._1 == 3L) == 1 && got.find(_._1 == 3L).get._3 == 3L,
      s"one step with d=3 at t=3: $got")
  }

  test("final step where every remaining user churns lands survival exactly 0") {
    // the corpus-max user (5) is censored by construction but has a SHORT
    // duration, so the longest-lived user (1) churns alone at the last
    // step: d = n_risk = 1 → survival must be the 0.0 literal, not
    // exp(ln 0)
    val spans = Seq(
      (1L, 0L, 20L), (2L, 0L, 5L), (3L, 10L, 15L),
      (4L, 50L, 57L), (5L, 93L, 100L))
    val got = run(spans)
    assert(got == mirror(lifetimes(spans)))
    assert(got.last._4 == 0.0, s"all churned by the last step: $got")
  }

  test("gate equals the scalar mirror on the real sf0.001 events") {
    val spans = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr(s"unix_micros(ts) div ${EventOps.DAY_US}").as("di"))
      .groupBy("user_id").agg(min(col("di")).as("d0"),
        max(when(col("event_type") === "purchase", col("di"))).as("d1"))
      .filter(col("d1").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = EventOps.qKaplanMeier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == mirror(lifetimes(spans)), s"rows=${got.size}")
  }
}
