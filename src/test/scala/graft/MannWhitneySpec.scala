package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** q_mann_whitney proofs: the cumulative-tie-count rendering equals a
  * from-scratch rank-based mirror (materialize every observation's
  * average rank, sum group A's ranks directly) on tie-heavy fixtures and
  * the real sf0.001 events.
  */
class MannWhitneySpec extends AnyFunSuite {
  import SparkTestBase._

  private def rp(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  /** Textbook mirror: explicit average ranks over the pooled sample. */
  private def mirror(a: Seq[Double], b: Seq[Double]): (Long, Long, Double, Double) = {
    val pooled = (a.map((_, true)) ++ b.map((_, false))).sortBy(_._1)
    val ranks = scala.collection.mutable.Map.empty[Double, Double]
    var i = 0
    while (i < pooled.size) {
      val v = pooled(i)._1
      val j = pooled.indexWhere(_._1 != v, i) match { case -1 => pooled.size; case k => k }
      ranks(v) = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1..j
      i = j
    }
    val ra = a.map(ranks).sum
    val na = a.size.toLong
    val nb = b.size.toLong
    val n = (na + nb).toDouble
    val ua = ra - na.toDouble * (na.toDouble + 1.0) / 2.0
    val mu = na.toDouble * nb.toDouble / 2.0
    val ties = pooled.groupBy(_._1).values.map(_.size.toDouble)
    val corr = ties.map(t => t * t * t - t).sum
    val va = na.toDouble * nb.toDouble / 12.0 * ((n + 1.0) - corr / (n * (n - 1.0)))
    (na, nb, ua, rp((ua - mu) / math.sqrt(va)))
  }

  private def run(a: Seq[Double], b: Seq[Double]): (Long, Long, Double, Double) = {
    import spark.implicits._
    val ev = (a.map(("purchase", _)) ++ b.map(("click", _)) :+ (("view", 9.99)))
      .zipWithIndex.map { case ((et, v), i) => (i.toLong, 1L, i * 60L, et, v) }
      .toDF("event_id", "user_id", "sec", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("sec")).as("ts"),
        col("event_type"), col("value"), lit("{}").as("props"))
    val dir = java.nio.file.Files.createTempDirectory("mw").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.qMannWhitney(spark, dir).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
  }

  test("tie-heavy groups: cumulative-count ranks equal explicit average ranks") {
    val a = Seq(1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 5.0)
    val b = Seq(2.0, 2.0, 4.0, 5.0, 6.0, 6.0)
    assert(run(a, b) == mirror(a, b))
  }

  test("clearly shifted groups give a large |z|; direction follows group A") {
    val lo = Seq(1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5)
    val hi = lo.map(_ + 100.0)
    val (_, _, _, zLow) = run(lo, hi)
    assert(run(lo, hi) == mirror(lo, hi))
    assert(zLow < -2.0, s"A stochastically below B must give strongly negative z: $zLow")
    val (_, _, _, zHi) = run(hi, lo)
    assert(zHi > 2.0, s"reversed direction must flip the sign: $zHi")
  }

  test("identical distributions give z exactly 0") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0)
    val got = run(xs, xs)
    assert(got == mirror(xs, xs))
    assert(got._4 == 0.0, s"U = μ when the groups tie rank-for-rank: $got")
  }

  test("gate equals the rank mirror on the real sf0.001 events") {
    val vs = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = vs.collect { case ("purchase", v) => v }.toSeq
    val b = vs.collect { case ("click", v) => v }.toSeq
    val r = EventOps.qMannWhitney(spark, sfDir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) == mirror(a, b))
  }
}
