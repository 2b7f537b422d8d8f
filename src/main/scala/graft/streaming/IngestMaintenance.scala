package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline maintenance for the per-batch ingest layouts
  * ([[CorpusIngest]], [[VectorIngest]]): a long-running ingest writes one
  * `batch=<id>` directory per micro-batch, and thousands of small files
  * are the classic way a streaming corpus store degrades — every reader
  * pays file-listing and per-file footer costs that dwarf the data scan.
  *
  * [[compact]] rewrites ALL batch partitions of one directory into a
  * single consolidated `batch=<maxBid>` partition (preserving declared
  * secondary partition columns, e.g. the vector store's `cell`), sized at
  * `targetFileRows` rows per output file. The batch id is preserved as
  * the MAXIMUM existing id, so the exactly-once protocol is undisturbed:
  * the streaming checkpoint's next batch id is strictly greater, and the
  * `batch < bid` ledger filter still sees every compacted row.
  *
  * Run it with the ingest STOPPED (it is a maintenance pass, not a
  * concurrent operation). The swap is staged: the consolidated copy is
  * fully written to a sibling `<dir>.compact` first, the live directory
  * moves aside, the copy moves in, and only then is the old data
  * deleted — a crash at any point leaves a complete old or new directory
  * on disk (plus debris a re-run clears). Local-filesystem moves; on an
  * object store the swap step becomes the catalog's atomic pointer flip. */
object IngestMaintenance {

  def compact(s: SparkSession, dir: String,
              secondaryPartitions: Seq[String] = Nil,
              targetFileRows: Long = 1000000L): Unit = {
    require(targetFileRows > 0, "targetFileRows must be positive")
    val src = Paths.get(dir)
    if (!Files.exists(src)) return
    val df = s.read.parquet(dir)
    require(df.columns.contains("batch"), s"$dir is not a per-batch ingest dir")
    require(secondaryPartitions.forall(df.columns.contains),
      s"unknown partition column among $secondaryPartitions")
    val maxBid = df.agg(max(col("batch").cast("long"))).head().getLong(0)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetFileRows).toInt)
    val staging = Paths.get(dir + ".compact")
    deleteTree(staging)
    val writer = df.drop("batch").repartition(nFiles).write.mode("overwrite")
    (if (secondaryPartitions.nonEmpty) writer.partitionBy(secondaryPartitions: _*)
     else writer)
      .parquet(staging.resolve(s"batch=$maxBid").toString)
    // staged swap: old aside → new in → old gone
    val old = Paths.get(dir + ".old")
    deleteTree(old)
    Files.move(src, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, src, StandardCopyOption.ATOMIC_MOVE)
    deleteTree(old)
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally st.close()
    }
}
