package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
  * single consolidated `batch=-1` partition. -1 is deliberate: it is
  * strictly below every real micro-batch id, so the `batch < bid` ledger
  * filter sees every compacted row, and it can NEVER collide with a
  * replayed batch — if the ingest died with its last batch written but
  * uncommitted, the restart replays that id and overwrites that id's
  * directory; had the consolidated data been parked there, the replay
  * would wipe the whole store. Secondary partition levels (e.g. the
  * vector store's `cell=` dirs) are INFERRED from the existing layout and
  * preserved — the caller cannot accidentally flatten the pruning
  * structure. Output files are sized at `targetFileRows`, repartitioned
  * BY the secondary columns so partitionBy cannot fan each task out
  * across every cell.
  *
  * Run it with the ingest STOPPED (it is a maintenance pass, not a
  * concurrent operation). The swap is staged — consolidated copy fully
  * written to `<dir>.compact`, live dir aside to `<dir>.old`, copy moved
  * in, old deleted — and [[compact]] begins by REPAIRING any interrupted
  * swap it finds (a crash between the moves leaves no live dir; the
  * complete staged copy, or failing that the old dir, is restored).
  * Local-filesystem moves; on an object store the swap step becomes the
  * catalog's atomic pointer flip. */
object IngestMaintenance {

  def compact(s: SparkSession, dir: String,
              targetFileRows: Long = 1000000L): Unit = {
    require(targetFileRows > 0, "targetFileRows must be positive")
    val src = Paths.get(dir)
    val staging = Paths.get(dir + ".compact")
    val old = Paths.get(dir + ".old")
    // repair an interrupted swap: the staged copy is only moved aside
    // once it is COMPLETE, so if the live dir is missing, staging (best)
    // or the old dir (fallback) is a full store
    if (!Files.exists(src)) {
      if (Files.exists(staging)) {
        Files.move(staging, src, StandardCopyOption.ATOMIC_MOVE)
        deleteTree(old)
      } else if (Files.exists(old)) {
        Files.move(old, src, StandardCopyOption.ATOMIC_MOVE)
      } else return
    }
    val df = s.read.parquet(dir)
    require(df.columns.contains("batch"), s"$dir is not a per-batch ingest dir")
    val secondary = inferSecondaryPartitions(src)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetFileRows).toInt)
    deleteTree(staging)
    val repartitioned =
      if (secondary.isEmpty) df.drop("batch").repartition(nFiles)
      else df.drop("batch").repartition(nFiles, secondary.map(col): _*)
    val writer = repartitioned.write.mode("overwrite")
    (if (secondary.nonEmpty) writer.partitionBy(secondary: _*) else writer)
      .parquet(staging.resolve("batch=-1").toString)
    // staged swap: old aside → new in → old gone
    deleteTree(old)
    Files.move(src, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, src, StandardCopyOption.ATOMIC_MOVE)
    deleteTree(old)
  }

  /** Partition levels BELOW batch=, read off the directory names of the
    * first batch dir (depth-ordered): `batch=3/cell=5/part-...` infers
    * Seq("cell"). */
  private def inferSecondaryPartitions(src: Path): Seq[String] = {
    def partCol(p: Path): Option[String] = {
      val n = p.getFileName.toString
      val i = n.indexOf('=')
      if (Files.isDirectory(p) && i > 0) Some(n.substring(0, i)) else None
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var level: Option[Path] = {
      val st = Files.list(src)
      try st.iterator().asScala.find(p => partCol(p).contains("batch"))
      finally st.close()
    }
    while (level.isDefined) {
      val st = Files.list(level.get)
      val next =
        try st.iterator().asScala.flatMap(p => partCol(p).map(_ -> p)).toSeq.headOption
        finally st.close()
      next.foreach { case (c, _) => out += c }
      level = next.map(_._2)
    }
    out.toSeq
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally st.close()
    }
}
