package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-style partitioned layout + partition pruning — the data-layout
  * half of the 100 TB story (SURVEY §4): a corpus written partitioned by
  * a query key turns that predicate into directory pruning (no I/O at
  * all), which is what the IVF/dedup comments mean by "pruning is I/O".
  * Asserted from the executed plan: the lang predicate must ride in
  * PartitionFilters (metadata-only), NOT in the post-scan data filter.
  */
class PartitionPruneSpec extends AnyFunSuite {
  import SparkTestBase._

  test("lang-partitioned write prunes non-matching partitions at read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.documents(spark, sfDir)
      .write.partitionBy("lang").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    // FileSourceScanExec prints "... PartitionFilters: [...], PushedFilters:
    // [...], ReadSchema: ..." on ONE line — split the scan line there so
    // each assertion reads its own section, not the whole line.
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(scanLine.isDefined, s"no PartitionFilters in scan:\n$plan")
    val pushedIdx = scanLine.get.indexOf("PushedFilters")
    assert(pushedIdx >= 0, s"scan line has no PushedFilters section: ${scanLine.get}")
    val (partSection, pushedSection) = scanLine.get.splitAt(pushedIdx)
    assert(partSection.contains("lang"),
      s"lang predicate did not become a partition filter: $partSection")
    // and it must NOT degrade to a row-level pushed/data filter
    assert(!pushedSection.contains("lang"),
      s"lang filtered row-by-row instead of by directory: $pushedSection")

    val expected = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en").count()
    assert(pruned.count() === expected)
  }
}
