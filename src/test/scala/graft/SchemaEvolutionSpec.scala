package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift robustness — the lesson of the round-8 events-ts
  * regeneration, generalized and pinned: (1) an evolved per-batch layout
  * (new columns appearing mid-stream) stays readable via mergeSchema,
  * (2) the Tables loaders normalize a regenerated file whose physical
  * types drifted (narrowed ints, float/double flips) instead of letting
  * 40 gates die at analysis time. The events-ts dual-schema fixture
  * lives in TemporalSpec; these cover documents/embeddings.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  import SparkTestBase._

  test("mergeSchema read spans an evolved per-batch layout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "alpha")).toDF("doc_id", "text")
      .write.parquet(s"$dir/batch=0")
    Seq((2L, "beta", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/batch=1")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.toSet ===
      Set("doc_id", "text", "lang", "source", "n_chars", "batch"))
    val rows = df.collect()
    assert(rows.length === 2)
    val r1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
    assert(r1.isNullAt(r1.fieldIndex("lang")),
      "pre-evolution rows must read the new column as null")
  }

  test("Tables.documents widens a narrowed-int regeneration to LONG") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-docnarrow").toString
    Seq((7, "gamma delta", "en", "web", 11))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val df = Tables.documents(spark, dir)
    assert(df.schema("doc_id").dataType === LongType)
    assert(df.schema("n_chars").dataType === LongType)
    assert(df.head().getAs[Long]("doc_id") === 7L)
  }

  test("Tables.embeddings normalizes a double-vector regeneration to float") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-embdrift").toString
    Seq((3, Array(0.5d, 0.25d), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("vec_id").dataType === LongType)
    assert(df.schema("embedding").dataType === ArrayType(FloatType, true) ||
      df.schema("embedding").dataType === ArrayType(FloatType, false))
    val v = df.head().getAs[scala.collection.Seq[Float]]("embedding")
    assert(v.toSeq === Seq(0.5f, 0.25f))
  }
}
