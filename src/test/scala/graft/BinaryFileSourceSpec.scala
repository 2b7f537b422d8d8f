package graft

import graft.operators.MultimodalOps.Ppm
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The `binaryFile` source — Spark's native ingest path for a media corpus
  * laid out as one blob per file (images/audio dropped into object
  * storage), vs the table-embedded payload column the q_mm_* gates use.
  * The spec proves the two ingest routes converge: PPM blobs written as
  * files, read back through `spark.read.format("binaryFile")`, decoded
  * with the same pure-JVM codec, yield byte-identical rasters to the
  * in-table encode→decode route — and `pathGlobFilter` prunes non-media
  * junk at the SOURCE (the listing level), not with a post-read filter. */
class BinaryFileSourceSpec extends AnyFunSuite {
  import SparkTestBase._

  private val MM_W = graft.operators.MultimodalOps.MM_W
  private val ROW_BYTES = graft.operators.MultimodalOps.ROW_BYTES

  private def ppmBytes(docId: Long, text: String): Array[Byte] = {
    val payload = text.getBytes("UTF-8")
    val h = (payload.length + ROW_BYTES - 1) / ROW_BYTES
    val raster = java.util.Arrays.copyOf(payload, h * ROW_BYTES)
    Ppm.encode(MM_W, h, raster, s"graft doc $docId")
  }

  test("binaryFile ingest of PPM blobs decodes identically to the table route") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").limit(20).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-binfile")
    docs.foreach { case (id, text) =>
      java.nio.file.Files.write(dir.resolve(f"doc_$id%05d.ppm"), ppmBytes(id, text))
    }
    // non-media junk the glob must exclude at the listing level
    java.nio.file.Files.write(dir.resolve("README.txt"), "not an image".getBytes)

    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.ppm")
      .load(dir.toString)
      .select(col("path"), col("content"))
    import spark.implicits._
    val decoded = files.as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (path, bytes) =>
          val id = path.split("doc_")(1).takeWhile(_.isDigit).toLong
          val img = Ppm.decode(bytes)
          (id, img.width, img.height,
            graft.operators.MultimodalOps.Decoder.md5hex(img.raster))
        }
      }
      .collect().sortBy(_._1)

    assert(decoded.length == docs.length, "glob filter failed to prune junk or lost a file")
    val expected = docs.sortBy(_._1).map { case (id, text) =>
      val payload = text.getBytes("UTF-8")
      val h = (payload.length + ROW_BYTES - 1) / ROW_BYTES
      val raster = java.util.Arrays.copyOf(payload, h * ROW_BYTES)
      (id, MM_W, h, graft.operators.MultimodalOps.Decoder.md5hex(raster))
    }
    assert(decoded.sameElements(expected))
  }
}
