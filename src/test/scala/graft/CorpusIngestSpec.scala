package graft

import java.nio.file.{Files, Paths}

import graft.streaming.CorpusIngest
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once guarantees of the incremental corpus ingest: re-delivered
  * files, cross-delivery duplicates, and a restart with new data must each
  * leave exactly one copy of every distinct text in the corpus. */
class CorpusIngestSpec extends AnyFunSuite {
  import SparkTestBase._

  private def runIngest(src: String, corpus: String, ckpt: String): Unit = {
    val q = CorpusIngest.start(spark, src, corpus, ckpt)
    try q.awaitTermination() // AvailableNow terminates when caught up
    finally if (q.isActive) q.stop()
  }

  test("re-delivered and duplicated documents ingest exactly once, across restarts") {
    val root = Files.createTempDirectory("graft-ingest")
    val (src, corpus, ckpt) =
      (s"$root/src", s"$root/corpus", s"$root/ckpt")
    Files.createDirectories(Paths.get(src))

    // delivery 1: the documents table; delivery 2: the SAME file again
    // (at-least-once source re-delivery)
    for (name <- Seq("d1.parquet", "d2.parquet"))
      Files.copy(Paths.get(s"$sfDir/documents.parquet"), Paths.get(s"$src/$name"))
    runIngest(src, corpus, ckpt)

    val distinctTexts = Tables.documents(spark, sfDir)
      .selectExpr("md5(lower(trim(text))) AS ck").distinct().count()
    val afterTwo = spark.read.parquet(corpus)
    assert(afterTwo.count() == distinctTexts,
      s"corpus must hold one row per distinct text: ${afterTwo.count()} vs $distinctTexts")
    assert(afterTwo.select("ck").distinct().count() == distinctTexts)

    // restart with one genuinely new document + one more re-delivery:
    // only the new text lands
    import spark.implicits._
    // the file source reads FILES, not directories — write the one-doc
    // parquet aside and copy its part file in as a plain file
    val novelDir = s"$root/novel"
    Seq((999999L, "a genuinely novel document text", "en", "src0", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(novelDir)
    val part = Files.list(Paths.get(novelDir)).iterator()
    val partFile = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(fail("no part file written"))
    Files.copy(partFile, Paths.get(s"$src/d3.parquet"))
    Files.copy(Paths.get(s"$sfDir/documents.parquet"), Paths.get(s"$src/d4.parquet"))
    runIngest(src, corpus, ckpt)

    val afterRestart = spark.read.parquet(corpus)
    assert(afterRestart.count() == distinctTexts + 1,
      s"restart must add exactly the one novel doc: ${afterRestart.count()}")
    assert(afterRestart.filter($"doc_id" === 999999L).count() == 1)
  }
}
