package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the PROPERTY q_zorder exists for: a z-ordered file layout lets
  * predicates on EITHER dimension prune at the file level, where a
  * single-column (time) order serves one dimension and scatters the
  * other. The gate pins the z-key arithmetic cross-engine; this spec pins
  * the layout consequence — file min/max boxes from an actual write.
  */
class ZorderLayoutSpec extends AnyFunSuite {
  import SparkTestBase._

  private val FILES = 16

  /** Write df range-partitioned+sorted by sortCol, return per-file
    * (min,max) of u and h. */
  private def fileBoxes(sortCol: String): Array[(Long, Long, Long, Long)] = {
    val keyed = SparkEntry.queries("q_zorder")(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    keyed.repartitionByRange(FILES, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("u").as("ulo"), max("u").as("uhi"),
        min("h").as("hlo"), max("h").as("hhi"))
      .collect()
      .map(r => (r.getAs[Long]("ulo"), r.getAs[Long]("uhi"),
        r.getAs[Long]("hlo"), r.getAs[Long]("hhi")))
  }

  test("z-ordered files prune on BOTH dimensions; a time layout scatters users") {
    val z = fileBoxes("zv")
    val t = fileBoxes("event_id") // event ids arrive in time order
    assert(z.length > FILES / 2 && t.length > FILES / 2, "not enough files to compare")

    val (umin, umax) = (z.map(_._1).min, z.map(_._2).max)
    val (hmin, hmax) = (z.map(_._3).min, z.map(_._4).max)
    // narrow probe band in each dimension (1/8 of its range)
    val uBand = (umin, umin + math.max((umax - umin) / 8, 1))
    val hBand = (hmin + (hmax - hmin) / 2,
      hmin + (hmax - hmin) / 2 + math.max((hmax - hmin) / 8, 1))

    def hits(boxes: Array[(Long, Long, Long, Long)],
             uQ: Option[(Long, Long)], hQ: Option[(Long, Long)]): Double = {
      val n = boxes.count { case (ulo, uhi, hlo, hhi) =>
        uQ.forall { case (lo, hi) => ulo <= hi && uhi >= lo } &&
          hQ.forall { case (lo, hi) => hlo <= hi && hhi >= lo }
      }
      n.toDouble / boxes.length
    }

    val zCost = (hits(z, Some(uBand), None) + hits(z, None, Some(hBand))) / 2
    val tCost = (hits(t, Some(uBand), None) + hits(t, None, Some(hBand))) / 2
    // time order reads EVERY file for a user predicate (u scatters), so its
    // averaged scan fraction cannot get below ~0.5; the z-curve bounds both
    // dimensions per file and must beat it by a wide margin
    assert(hits(t, Some(uBand), None) > 0.9,
      s"fixture surprise: time layout pruned a user predicate (${hits(t, Some(uBand), None)})")
    assert(zCost < tCost * 0.7,
      s"z-order avg scan fraction $zCost not substantially under time-order $tCost")
  }
}
