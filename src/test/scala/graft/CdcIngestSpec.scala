package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.CdcIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CDC merge table must equal the all-at-once batch fold for any
  * micro-batch split, ignore re-delivered changes, and converge again
  * after a checkpoint-less restart. */
class CdcIngestSpec extends AnyFunSuite {
  import SparkTestBase._

  private def changesDf(rows: Seq[(Long, String, Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("cid", "op", "doc_id", "text", "ts")
  }

  test("latest-wins merge equals the batch fold; re-delivery and restart are no-ops") {
    val root = Files.createTempDirectory("graft-cdc")
    val (src, store, ckpt) = (s"$root/src", s"$root/store", s"$root/ckpt")
    Files.createDirectories(Paths.get(src))

    // doc 1: upsert then newer upsert (in different batches, delivered out
    // of ts order); doc 2: upsert then delete; doc 3: delete then LATER
    // upsert (revival); doc 4: ts tie broken by cid; doc 5: plain upsert
    val b1 = Seq(
      (101L, "U", 1L, "one-v2", 200L),
      (102L, "U", 2L, "two-v1", 100L),
      (103L, "D", 3L, null: String, 100L),
      (104L, "U", 4L, "four-a", 100L))
    val b2 = Seq(
      (105L, "U", 1L, "one-v1", 100L), // late arrival, must NOT win
      (106L, "D", 2L, null: String, 300L),
      (107L, "U", 3L, "three-revived", 400L),
      (108L, "U", 4L, "four-b", 100L), // same ts as 104, higher cid wins
      (109L, "U", 5L, "five", 100L))
    def deliver(name: String, rows: Seq[(Long, String, Long, String, Long)]): Unit = {
      val stage = s"$root/stage_$name"
      changesDf(rows).coalesce(1).write.parquet(stage)
      val pf = Files.list(Paths.get(stage)).iterator()
      val f = Iterator.continually(pf).takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(f, Paths.get(s"$src/$name.parquet"))
    }
    deliver("b1", b1)
    deliver("b2", b2)

    def run(ck: String): Unit = {
      val q = CdcIngest.start(spark, src, store, ck)
      try q.processAllAvailable()
      finally q.stop()
    }
    run(ckpt)

    def snapshot(): Map[Long, (String, Long, Long)] =
      CdcIngest.table(spark, store).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("text"), r.getAs[Long]("ts"), r.getAs[Long]("cid"))))
        .toMap

    val got = snapshot()
    assert(got === Map(
      1L -> (("one-v2", 200L, 101L)),
      3L -> (("three-revived", 400L, 107L)),
      4L -> (("four-b", 100L, 108L)),
      5L -> (("five", 100L, 109L))), s"merge result wrong: $got")

    // batch twin: fold everything at once through the same merge
    val empty = changesDf(Nil).filter(lit(false))
    val batchTwin = CdcIngest.mergeChanges(empty, changesDf(b1 ++ b2))
      .filter(col("op") === "U")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("ts"), r.getAs[Long]("cid"))))
      .toMap
    assert(batchTwin === got, "stream fold diverged from the all-at-once fold")

    // re-delivery: the same changes arrive again under a new file name
    deliver("b1_redelivered", b1)
    run(ckpt)
    assert(snapshot() === got, "re-delivered changes must be a no-op")

    // checkpoint-less restart: a fresh consumer replays EVERYTHING
    run(s"$root/ckpt2")
    assert(snapshot() === got, "restart replay must converge to the same table")
  }
}
