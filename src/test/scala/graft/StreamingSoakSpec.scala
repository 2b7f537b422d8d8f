package graft

import java.sql.Timestamp

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Soak evidence for the bounded-state claims in [[EventStream]]: the
  * correctness suite ([[StreamingSpec]]) proves the streaming paths agree
  * with their batch twins, but agreement says nothing about whether state
  * is actually DROPPED as the watermark advances — the difference between
  * a pipeline that runs for a year and one that OOMs in week two. Here a
  * MemoryStream feeds batches whose event time marches forward well past
  * the watermark delay each step, and `stateOperators.numRowsTotal` (from
  * the progress feed) must PLATEAU: state after every later advance stays
  * ≤ the high-water mark set in the warm-up batches, across ≥3 watermark
  * advances. Without eviction both operators grow linearly in batches, so
  * a regression fails by a wide margin, not a flaky one.
  */
object StreamingSoakSpec {
  /** Event rows shaped like the post-read events stream (top-level so the
    * case-class Encoder needs no outer reference). */
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)
}

class StreamingSoakSpec extends AnyFunSuite {
  import SparkTestBase._
  import StreamingSoakSpec.Ev

  private def evBatch(hour: Int, n: Int): Seq[Ev] =
    (0 until n).map { i =>
      Ev(hour.toLong * 1000 + i,
        new Timestamp(hour * 3600L * 1000L + i * 1000L),
        i % 7, if (i % 2 == 0) "click" else "purchase", i.toDouble)
    }

  /** Latest reported total state rows (the progress feed may end on an
    * empty no-data batch that still carries the state metrics). */
  private def stateRows(q: StreamingQuery): Long =
    q.recentProgress.reverse
      .flatMap(p => Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
      .headOption.getOrElse(-1L)

  /** Drive `batches` through `build`, returning state-row totals observed
    * after each batch. */
  private def soak(name: String,
                   build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                   batches: Seq[Seq[Ev]]): Seq[Long] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[Ev]
    val q = build(mem.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.map { b =>
        mem.addData(b)
        q.processAllAvailable()
        stateRows(q)
      }
    } finally q.stop()
  }

  test("windowed-agg state plateaus across watermark advances") {
    // each batch is its own 1-hour window, 3 hours later than the last —
    // far beyond the 10-minute delay, so earlier windows must age out
    val totals = soak("soak_win", EventStream.windowedCountsOf,
      (0 until 8).map(b => evBatch(b * 3, n = 40)))
    info(s"windowed-agg state rows per batch: ${totals.mkString(", ")}")
    assert(totals.last > 0, "state metrics never reported")
    val highWater = totals.take(3).max
    // ≥3 watermark advances after warm-up, none growing past the mark
    totals.drop(3).foreach(t =>
      assert(t <= highWater,
        s"state grew past the warm-up high-water mark: $totals"))
  }

  test("watermarked dedup state plateaus across watermark advances") {
    // 200 fresh keys per batch, 2 hours apart vs a 1-hour watermark delay:
    // without eviction state is ~200×batches; with it, ~one batch's keys
    val totals = soak("soak_dedup", EventStream.dedupedEventsOf,
      (0 until 8).map(b => evBatch(b * 2, n = 200)))
    info(s"dedup state rows per batch: ${totals.mkString(", ")}")
    assert(totals.last > 0, "state metrics never reported")
    val highWater = totals.take(3).max
    totals.drop(3).foreach(t =>
      assert(t <= highWater,
        s"dedup state grew past the warm-up high-water mark: $totals"))
    // the wide-margin check: eight batches of disjoint keys must not
    // retain anywhere near all 1600
    assert(totals.last < 800, s"state looks unbounded: $totals")
  }
}
