package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Fns, Kmv}
import graft.operators.{SketchOps, TemporalOps}

/** Brute-force cross-checks for the temporal joins and the KMV sketch —
  * the gated plans are bucketed/windowed for scale, so an independent
  * O(n²)/driver-side rendering pins their semantics.
  */
class TemporalSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val ev: Array[(Long, Long, String, Long)] =
    Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) as t_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("Tables.events adapts to every on-disk ts layout (nanos-long, micros NTZ, micros LTZ)") {
    // The driver's testdata regeneration flipped events.ts from parquet
    // TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds 7 and 8, which
    // silently killed every events query for two rounds. This fixture pins
    // the schema-adaptive loader against all three layouts the branch
    // handles: a raw nanos LONG (what the legacy nanosAsLong conf yields
    // for NANOS files), a TIMESTAMP_NTZ micros column (current testdata),
    // and an adjusted-to-UTC TIMESTAMP micros column.
    import org.apache.spark.sql.functions.{col, expr, lit, timestamp_micros, unix_micros}
    val tUs = 1700000000123456L // an exact-micros instant
    val base = java.nio.file.Files.createTempDirectory("graft-evts")
    def write(dir: java.nio.file.Path, tsCol: org.apache.spark.sql.Column): String = {
      spark.range(1)
        .select(lit(1L).as("event_id"), tsCol.as("ts"), lit(7L).as("user_id"),
          lit("click").as("event_type"), lit(1.5).as("value"), lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      dir.toString
    }
    val dirs = Seq(
      write(base.resolve("nanos"), lit(tUs * 1000L)),
      write(base.resolve("ntz"), timestamp_micros(lit(tUs)).cast("timestamp_ntz")),
      write(base.resolve("ltz"), timestamp_micros(lit(tUs))))
    dirs.foreach { d =>
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
        s"$d: ts must normalize to the session TIMESTAMP")
      val got = df.select(unix_micros(col("ts"))).collect().map(_.getLong(0))
      assert(got.sameElements(Array(tUs)), s"$d: expected instant $tUs, got ${got.toSeq}")
    }
  }

  test("Tables.documents/embeddings normalize drifted int widths and vector element types") {
    // the generalized events-ts lesson: a regeneration that narrows ints
    // or flips float/double must degrade to a widening cast, not break
    // every gate at analysis time
    import org.apache.spark.sql.functions.{array, col, lit}
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft-drift")
    spark.range(1)
      .select(lit(5).cast("int").as("doc_id"), lit("hi").as("text"),
        lit("en").as("lang"), lit("web").as("source"), lit(2).cast("int").as("n_chars"))
      .write.parquet(s"$base/documents.parquet")
    spark.range(1)
      .select(lit(3).cast("int").as("vec_id"),
        array(lit(1.5), lit(2.5)).as("embedding"), lit(0).as("label"))
      .write.parquet(s"$base/embeddings.parquet")
    val docs = Tables.documents(spark, base.toString)
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)
    assert(docs.select("doc_id", "n_chars").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sameElements(Array((5L, 2L))))
    val emb = Tables.embeddings(spark, base.toString)
    assert(emb.schema("vec_id").dataType == LongType)
    assert(emb.schema("embedding").dataType == ArrayType(FloatType, true) ||
      emb.schema("embedding").dataType == ArrayType(FloatType, false))
    assert(emb.select("embedding").collect()(0).getSeq[Float](0) == Seq(1.5f, 2.5f))
  }

  test("as-of join matches a brute-force per-row scan") {
    val purchases = ev.filter(_._3 == "purchase")
    val got = TemporalOps.qAsofJoin(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3)))))
      .toMap
    val clicks = ev.filter(_._3 == "click")
    assert(got.size == clicks.length, "every click must appear exactly once")
    clicks.foreach { case (cid, user, _, tUs) =>
      // most recent purchase at-or-before; ties on ts resolved to the
      // larger ref_id (the window's last row in (t, kind, ref_id) order)
      val cands = purchases.filter(p => p._2 == user && p._4 <= tUs)
      val want =
        if (cands.isEmpty) None
        else {
          val best = cands.maxBy(p => (p._4, p._1))
          Some((best._1, tUs - best._4))
        }
      assert(got(cid) == want, s"click $cid: got ${got(cid)}, want $want")
    }
  }

  test("range join matches a brute-force pair count") {
    val clicks = ev.filter(_._3 == "click")
    val got = TemporalOps.qRangeJoin(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val errors = ev.filter(_._3 == "error")
    assert(got.size == errors.length, "every error must appear exactly once")
    errors.foreach { case (eid, user, _, tUs) =>
      val want = clicks.count(c =>
        c._2 == user && math.abs(c._4 - tUs) <= TemporalOps.RANGE_US).toLong
      assert(got(eid) == want, s"error $eid: got ${got(eid)}, want $want")
    }
    assert(got.values.sum > 0, "the window must capture at least one pair")
  }

  test("range join plan is an equi-join on (user, bucket), not a cartesian") {
    val plan = TemporalOps.qRangeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      "range join must not degrade to an unconditioned pair scan:\n" + plan)
  }

  test("KMV kth-min equals the driver-side bottom-K and the estimate is sane") {
    val kth = ev.map { case (_, user, typ, tUs) =>
      (typ, user.toString + "_" + (tUs / 86400000000L).toString)
    }.distinct
      .map { case (typ, s) => (typ, hash32Local(s)) }
      .groupBy(_._1)
      .map { case (typ, hs) => typ -> hs.map(_._2).distinct.sorted.apply(Kmv.K - 1) }
    val got = SketchOps.qKmvDistinct(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == kth.size)
    got.foreach { case (typ, nExact, est) =>
      val want = Kmv.EST_NUM / kth(typ).toDouble
      assert(math.abs(est - want) < 1e-3, s"$typ: est $est != $want")
      // k=8 gives a loose but bounded estimator; a broken sketch is off by
      // orders of magnitude, a correct one lands within ~3x at this k
      assert(est > nExact / 3.0 && est < nExact * 3.0,
        s"$typ: estimate $est implausible vs exact $nExact")
    }
  }

  /** JVM twin of [[Fns.hash32]] (first 32 md5 bits, unsigned). */
  private def hash32Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
  }
}
