package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions.{col, max, timestamp_micros, unix_micros}
import org.scalatest.funsuite.AnyFunSuite

/** The Structured Streaming window aggregation must agree with the batch
  * EventOps.qWindowAgg on the same data (complete mode over one file batch
  * — no rows are late relative to the watermark in a single batch). */
class StreamingSpec extends AnyFunSuite {
  import SparkTestBase._

  test("streaming windowed counts equal the batch window aggregation") {
    // the file streaming source requires a directory
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventStream.windowedCounts(spark, dir.toString)
    val q = stream.writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("win_counts")
      .orderBy("ws", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = operators.EventOps.qWindowAgg(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
  }

  test("streaming dedup drops re-delivered events with bounded state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream3")
    // the same events file delivered twice = an at-least-once source
    // re-delivering every event in a later micro-batch
    for (name <- Seq("a.parquet", "b.parquet"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"), dir.resolve(name))
    val q = EventStream.dedupedEvents(spark, dir.toString)
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val ids = spark.table("deduped").collect().map(_.getLong(0))
    val distinctInSource = Tables.events(spark, sfDir)
      .select("event_id").distinct().count()
    assert(ids.length.toLong == distinctInSource,
      s"expected $distinctInSource unique events, got ${ids.length}")
    assert(ids.distinct.length == ids.length, "output contains duplicate event_ids")
  }

  test("stateful sessionization (flatMapGroupsWithState) equals batch qSessionize") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.sessionCounts(spark, dir.toString)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("sessions")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = operators.EventOps.qSessionize(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
  }

  test("stream-stream interval join equals the batch interval join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream4")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.clickPurchaseJoin(spark, dir.toString)
      .writeStream.format("memory").queryName("cpjoin").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("cpjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    // batch twin: the same (click, purchase-in-previous-24h) pairs
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) as t_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = ev.filter(_._3 == "purchase")
    val batch = (for {
      c <- ev.iterator if c._3 == "click"
      p <- purchases
      if p._2 == c._2 && p._4 <= c._4 && p._4 >= c._4 - 86400000000L
    } yield (c._1, p._1)).toArray.sorted
    assert(streamed.nonEmpty, "the interval must capture at least one pair")
    assert(streamed.sameElements(batch),
      s"streamed ${streamed.length} pairs, batch ${batch.length}")
  }

  test("streaming anomaly detector scores each batch against prior history") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = EventStream.anomalyUpdatesOf(mem.toDF().toDF("event_type", "value"))
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    val b1 = Seq.tabulate(50)(i => ("click", 10.0 + (i % 5)))       // tight cluster
    val b2 = Seq(("click", 12.0), ("click", 500.0), ("click", 11.0),
                 ("click", 900.0))                                   // 2 wild outliers
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("anom").orderBy("n_prior").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // batch 1: no baseline yet
    assert(rows(0) === (("click", 0L, 50L, -1L)))
    // batch 2 scored against batch 1's exact integer moments
    val cents = b1.map(v => math.round(v._2 * 100))
    val n = cents.length
    val mean = cents.sum.toDouble / 100.0 / n
    val std = math.sqrt((cents.map(c => c * c).sum.toDouble / 10000.0 -
      n * mean * mean) / (n - 1))
    val expect = b2.count(v => math.abs(v._2 - mean) > 3.0 * std).toLong
    assert(expect === 2L, s"test fixture should have exactly 2 outliers, got $expect")
    assert(rows(1) === (("click", 50L, 4L, expect)))
  }

  test("stream-stream LEFT OUTER interval join emits unmatched clicks after watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-loj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.clickPurchaseLeftJoin(spark, dir.toString)
      .writeStream.format("memory").queryName("cploj").outputMode("append").start()
    try {
      q.processAllAvailable()
      // outer-join nulls can only flush once a LATER batch advances both
      // watermarks past the buffered clicks' windows — deliver a far-
      // future sentinel (click + purchase, excluded from the comparison)
      import spark.implicits._
      val sentinelTs = Tables.events(spark, sfDir)
        .agg(max(unix_micros(col("ts")))).head().getLong(0) + 7L * 86400000000L
      Seq((9000001L, sentinelTs, 999999L, "click", 0.0, "{}"),
          (9000002L, sentinelTs, 999998L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cploj").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .filter(_._1 < 9000000L).sorted
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) as t_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = ev.filter(_._3 == "purchase")
    val batch = ev.iterator.filter(_._3 == "click").flatMap { c =>
      val ms = purchases.filter(p =>
        p._2 == c._2 && p._4 <= c._4 && p._4 >= c._4 - 86400000000L)
      if (ms.isEmpty) Iterator((c._1, -1L)) else ms.iterator.map(p => (c._1, p._1))
    }.toArray.sorted
    assert(batch.exists(_._2 == -1L), "fixture surprise: every click matched")
    assert(streamed.sameElements(batch),
      s"streamed ${streamed.length} rows, batch ${batch.length}")
  }

  test("streaming EWMA final state equals the batch query on any batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // (event_id, ts_us, user_id, value): user 1 has > EWMA_W events so the
    // truncation path is exercised; user 2 straddles batches OUT OF ORDER
    // (older event arrives in a later batch) to prove the top-W merge is
    // arrival-order independent; a ts tie on user 2 exercises the
    // event_id tiebreak
    val ev: Seq[(Long, Long, Long, Double)] =
      (1L to 15L).map(i => (i, 1000000L * i, 1L, 10.0 + i)) ++
      Seq((100L, 7000000L, 2L, 5.5), (101L, 3000000L, 2L, 7.25),
          (102L, 7000000L, 2L, 9.0))
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val stream = mem.toDF().toDF("event_id", "ts_us", "user_id", "value")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("value"))
    val q = EventStream.ewmaUpdatesOf(stream)
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append").start()
    try {
      mem.addData(ev.take(6))          // batch 1
      q.processAllAvailable()
      mem.addData(ev.slice(6, 16))     // batch 2 (includes user 2's late 101)
      q.processAllAvailable()
      mem.addData(ev.drop(16))         // batch 3
      q.processAllAvailable()
    } finally q.stop()
    // newest emission per user (largest n_events) == the stream's final view
    val streamed = spark.table("ewma_stream").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.maxBy(_.getLong(1)) }
    val batchDf = ev.toDF("event_id", "ts_us", "user_id", "value")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("value"))
    val batch = operators.EventOps.ewmaCore(batchDf).collect()
    assert(batch.length === 2)
    batch.foreach { b =>
      val st = streamed(b.getLong(0))
      assert(st.getLong(1) === b.getAs[Long]("n_events"),
        s"user ${b.getLong(0)} event count")
      assert(st.getDouble(2) === b.getAs[Double]("ewma"),
        s"user ${b.getLong(0)} ewma stream/batch mismatch")
    }
  }

  test("streaming funnel state machine equals the batch min-chain on any batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // (event_id, ts_us, user_id, type). Per-user streams are TIME-ORDERED
    // across batches (the per-key-ordered log contract) but interleaved
    // across users and SHUFFLED within each batch (the handler sorts).
    // user 1: full conversion, with a pre-view click (id 2, ts 5) that must
    //   NOT count (click must be strictly after first view) and a ts-tie
    //   click (id 4, ts==t1) that must not count either (strict >).
    // user 2: view+click, never purchases (purchase BEFORE click, id 22).
    // user 3: clicks/purchases only — stays at stage 0 (no view).
    val ev: Seq[(Long, Long, Long, String)] = Seq(
      (2L, 5L, 1L, "click"), (1L, 10L, 1L, "view"), (4L, 10L, 1L, "click"),
      (3L, 20L, 1L, "click"), (5L, 25L, 1L, "click"), (6L, 30L, 1L, "purchase"),
      (20L, 8L, 2L, "view"), (22L, 9L, 2L, "purchase"), (21L, 15L, 2L, "click"),
      (30L, 7L, 3L, "click"), (31L, 12L, 3L, "purchase"))
    val mem = MemoryStream[(Long, Long, Long, String)]
    val stream = mem.toDF().toDF("event_id", "ts_us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
        col("user_id"), col("event_type"))
    val q = EventStream.funnelStagesOf(stream)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // batch 1 ends mid-funnel for user 1; batches are internally shuffled
      mem.addData(scala.util.Random.shuffle(ev.take(4)))
      q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(ev.slice(4, 8)))
      q.processAllAvailable()
      mem.addData(scala.util.Random.shuffle(ev.drop(8)))
      q.processAllAvailable()
    } finally q.stop()
    // newest emission per user (memory sink appends in batch order)
    val streamed = spark.table("funnel_stream").collect()
      .zipWithIndex.groupBy(_._1.getLong(0))
      .map { case (u, rs) => u -> rs.maxBy(_._2)._1 }
    // batch definition, computed independently: t1 = min view ts,
    // t2 = min click ts > t1, t3 = min purchase ts > t2
    val expected = ev.groupBy(_._3).map { case (u, es) =>
      val t1 = es.filter(_._4 == "view").map(_._2).minOption.getOrElse(Long.MaxValue)
      val t2 = es.filter(e => e._4 == "click" && e._2 > t1).map(_._2)
        .minOption.getOrElse(Long.MaxValue)
      val t3 = es.filter(e => e._4 == "purchase" && e._2 > t2).map(_._2)
        .minOption.getOrElse(Long.MaxValue)
      u -> (if (t3 != Long.MaxValue) 3 else if (t2 != Long.MaxValue) 2
            else if (t1 != Long.MaxValue) 1 else 0, t1, t2, t3)
    }
    assert(expected(1L)._1 == 3 && expected(2L)._1 == 2 && expected(3L)._1 == 0,
      s"fixture does not exercise all stages: $expected")
    expected.foreach { case (u, (stage, t1, t2, t3)) =>
      val r = streamed(u)
      def o(t: Long) = if (t == Long.MaxValue) -1L else t
      assert(r.getInt(1) == stage, s"user $u stage: stream ${r.getInt(1)} vs $stage")
      assert(r.getLong(2) == o(t1) && r.getLong(3) == o(t2) && r.getLong(4) == o(t3),
        s"user $u ts chain mismatch: $r vs ($t1, $t2, $t3)")
    }
  }

  test("streaming CMS counters equal the batch sketch build") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream5")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.cmsCounters(spark, dir.toString)
      .writeStream.format("memory").queryName("cms_counters")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    val streamed = rows(spark.table("cms_counters"))
    val batch = rows(EventStream.cmsCountersCore(Tables.events(spark, sfDir)))
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch),
      s"streamed ${streamed.length} counters, batch ${batch.length}")
  }

  test("native session_window sessionization equals the window-function batch form") {
    // batch: the declarative session_window over the same events must
    // produce per-user session counts equal to qSessionize's lag-based
    // formulation (and per-session event counts that sum to the total)
    val sw = EventStream.sessionWindowsOf(Tables.events(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perUser = sw.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._4).sum)).toMap
    val batch = operators.EventOps.qSessionize(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(perUser == batch)
    // sessions are disjoint and gap-bounded: start < end, end = last+gap
    assert(sw.forall { case (_, s, e, _) => s < e })

    // streaming over the same file converges to the same sessions
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sw")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.sessionWindows(spark, dir.toString)
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("sess_win").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(streamed.sameElements(sw.sorted))
  }

  test("stream-static enrichment equals the batch left join, unknowns kept") {
    import org.apache.spark.sql.functions.{concat, lit, pmod}
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-enr")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    // static dimension with a deliberate coverage gap (user_id % 7 == 0
    // users are absent) so the left-join 'unknown' lane is exercised
    val dim = Tables.events(spark, sfDir).select("user_id").distinct()
      .filter(pmod(col("user_id"), lit(7)) =!= 0)
      .withColumn("segment", concat(lit("seg"), pmod(col("user_id"), lit(3))))
    val q = EventStream.enrichedEvents(spark, dir.toString, dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sorted
    val streamed = rows(spark.table("enriched"))
    val batch = rows(EventStream.enrichedOf(Tables.events(spark, sfDir), dim))
    assert(streamed.nonEmpty)
    assert(streamed.exists(_._4 == "unknown"), "coverage gap never exercised")
    assert(streamed.count(_._4 == "unknown") < streamed.length,
      "every row fell through to unknown — dim join broken")
    assert(streamed.sameElements(batch))
  }

  test("streaming HLL cardinality monitor converges to the batch gate, bounded state, exact replay") {
    val root = java.nio.file.Files.createTempDirectory("graft-hllmon")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val (regs, report) = (s"$root/regs", s"$root/report")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    def writeAsFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val f = java.nio.file.Files.list(java.nio.file.Paths.get(tmp)).iterator()
      val part = Iterator.continually(f).takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$src/$name"))
    }
    // two half-corpus deliveries; the monitor's cumulative estimate after
    // the second must equal the BATCH gate over the whole table — HLL
    // union (element-wise register max) makes the split invisible
    writeAsFile(raw.filter(col("event_id") % 2 === 0), "b0.parquet")
    writeAsFile(raw.filter(col("event_id") % 2 === 1), "b1.parquet")
    def run(ck: String): Unit = {
      val q = EventStream.startCardinalityMonitor(spark, src, regs, report, ck)
      try q.awaitTermination()
      finally if (q.isActive) q.stop()
    }
    run(s"$root/ckpt")
    val rep = spark.read.parquet(report).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("v_zero"), r.getAs[Double]("hll_est")))
    assert(rep.map(_._1).toSet == Set(0L, 1L), s"two batches expected: ${rep.map(_._1).toSet}")
    val lastRep = rep.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).sorted.toSeq
    val gate = operators.SketchOps.qHllDistinct(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).sorted.toSeq
    assert(lastRep == gate,
      s"cumulative streamed estimate must equal the batch gate:\n$lastRep\nvs\n$gate")
    // register store is sketch-bounded: ≤ m rows per (event_type, batch)
    val regCounts = spark.read.parquet(regs)
      .groupBy("batch_id", "event_type").count().collect().map(_.getLong(2))
    assert(regCounts.forall(_ <= operators.SketchOps.HLL_M),
      "register store exceeded m rows per group — storing keys, not registers?")
    // exact replay: wipe ONLY the checkpoint; both files re-deliver with
    // the same batch ids and must overwrite byte-identical rows
    val before = spark.read.parquet(report).collect().map(_.toString).sorted
    run(s"$root/ckpt2")
    val after = spark.read.parquet(report).collect().map(_.toString).sorted
    assert(before.sameElements(after), "replay must recompute identical reports")
  }

  test("streaming latency monitor: quantiles converge to the batch sketch, bounded state, exact replay") {
    val root = java.nio.file.Files.createTempDirectory("graft-latmon")
    val src = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val (bucks, report) = (s"$root/bucks", s"$root/report")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    def writeAsFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val f = java.nio.file.Files.list(java.nio.file.Paths.get(tmp)).iterator()
      val part = Iterator.continually(f).takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$src/$name"))
    }
    // two half-corpus deliveries; the cumulative report after the second
    // must equal the one-shot batch sketch over the whole table — bucket
    // counts are sum-mergeable, so the split is invisible
    writeAsFile(raw.filter(col("event_id") % 2 === 0), "b0.parquet")
    writeAsFile(raw.filter(col("event_id") % 2 === 1), "b1.parquet")
    def run(ck: String): Unit = {
      val q = EventStream.startLatencyMonitor(spark, src, bucks, report, ck)
      try q.awaitTermination()
      finally if (q.isActive) q.stop()
    }
    run(s"$root/ckpt")
    val rep = spark.read.parquet(report).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("q"), r.getAs[Long]("n"), r.getAs[Int]("bucket"),
        r.getAs[Double]("est")))
    assert(rep.map(_._1).toSet == Set(0L, 1L), s"two batches expected: ${rep.map(_._1).toSet}")
    val lastRep = rep.filter(_._1 == 1L).map(t => (t._2, t._3, t._4, t._5, t._6)).sorted.toSeq
    val batchTwin = operators.SketchOps
      .ddsketchOf(Tables.events(spark, sfDir), "event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3),
        r.getDouble(4))).sorted.toSeq
    assert(lastRep == batchTwin,
      s"cumulative streamed sketch must equal the batch twin:\n$lastRep\nvs\n$batchTwin")
    // and the estimates honor the DDSketch guarantee against exact ranks
    val vals = Tables.events(spark, sfDir).filter(col("value") > 0)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    batchTwin.foreach { case (et, q, n, _, est) =>
      val sorted = vals.filter(_._1 == et).map(_._2).sorted
      assert(n == sorted.length)
      val exact = sorted((math.floor(q * (n - 1)).toLong).toInt)
      assert(math.abs(est - exact) / exact <= operators.SketchOps.DD_ALPHA + 1e-9,
        s"$et q=$q est=$est exact=$exact breaks the relative-error guarantee")
    }
    // register store is sketch-bounded per (batch, type): O(log_gamma range)
    val bCounts = spark.read.parquet(bucks)
      .groupBy("batch_id", "event_type").count().collect().map(_.getLong(2))
    assert(bCounts.forall(_ <= 2048),
      "bucket store exceeded the log-range bound — storing values, not buckets?")
    // exact replay: wipe ONLY the checkpoint
    val before = spark.read.parquet(report).collect().map(_.toString).sorted
    run(s"$root/ckpt2")
    val after = spark.read.parquet(report).collect().map(_.toString).sorted
    assert(before.sameElements(after), "replay must recompute identical reports")
  }
}
