package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewOps

/** Salting must never change results — only where rows land. Both forms
  * are checked against their unsalted twins on the events table (5 hot
  * event types over tens of thousands of rows: exactly the hot-key shape).
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val events = Tables.events(spark, sfDir)
    .select(col("event_id"), col("event_type"), col("user_id"), col("value"))

  test("salted join equals the plain join on a hot key") {
    val dim = events.select(col("event_type")).distinct()
      .withColumn("type_tag", concat(lit("tag_"), col("event_type")))
    val plain = events.join(dim, "event_type")
      .select("event_id", "type_tag").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = SkewOps.saltedJoin(events, dim, "event_type", "event_id", 8)
      .select("event_id", "type_tag").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(salted.length == plain.length, s"${salted.length} != ${plain.length}")
    assert(salted.sameElements(plain))
  }

  test("salted two-phase collect equals the direct collect_list") {
    val direct = events.groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("user_id"))).as("user_id_list"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val salted = SkewOps.saltedCollect(events, "event_type", "user_id", "event_id", 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, vs) => assert(vs == direct(k), s"mismatch for $k") }
  }

  test("salted join spreads the hot key across salt partitions in the plan") {
    val dim = events.select(col("event_type")).distinct()
    val df = SkewOps.saltedJoin(events, dim, "event_type", "event_id", 8)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), "join not keyed by the salt column:\n" + plan)
  }

  test("salting rejects non-positive salt counts") {
    val dim = events.select(col("event_type")).distinct()
    intercept[IllegalArgumentException](
      SkewOps.saltedJoin(events, dim, "event_type", "event_id", 0))
    intercept[IllegalArgumentException](
      SkewOps.saltedCollect(events, "event_type", "user_id", "event_id", -1))
  }

  test("a caller-owned _salt column survives salting untouched") {
    val tagged = events.withColumn("_salt", lit(99))
    val dim = events.select(col("event_type")).distinct()
      .withColumn("type_tag", concat(lit("tag_"), col("event_type")))
    val out = SkewOps.saltedJoin(tagged, dim, "event_type", "event_id", 4)
    assert(out.columns.count(_ == "_salt") == 1, out.columns.mkString(","))
    val vals = out.select("_salt").distinct().collect().map(_.getInt(0)).toSeq
    assert(vals == Seq(99), s"caller _salt corrupted: $vals")
  }
}
