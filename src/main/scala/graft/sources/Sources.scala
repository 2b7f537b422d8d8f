package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1 S11 `import` + the reference's CSV
  * ingestion path, /root/reference/test/storage.cpp MovieLens load /
  * test/movielens.cpp:26-91). On Spark the formats are built-in; this
  * module pins the graft conventions: explicit schemas (no inference scans
  * over 100 TB), header CSVs, JSON-lines, and parquet as the canonical
  * storage format.
  */
object Sources {
  /** CSV with header and an explicit schema — schema inference is a full
    * extra pass over the data; never at scale. */
  def csv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.option("header", "true").schema(schema).csv(path)

  /** JSON-lines with explicit schema (same inference argument). */
  def jsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def parquet(s: SparkSession, path: String): DataFrame = s.read.parquet(path)

  /** Canonical sink: snappy parquet, overwrite. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Minimal DOT reader for the `graph`/`digraph` subset the reference's
    * test fixtures use (the .dot files under /root/reference/test/graphs):
    * `a -- b [weight = N];` and `a -> b;` statements. Parsed driver-side —
    * DOT files are hand-written graph fixtures, not data — into an
    * (src, dst, directed, weight) DataFrame for the walk/analytics
    * operators (weight null when unlabelled). */
  def dot(s: SparkSession, path: String): DataFrame = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val edge =
      """([A-Za-z0-9_]+)\s*(--|->)\s*([A-Za-z0-9_]+)\s*(?:\[\s*weight\s*=\s*([0-9.]+)\s*\])?\s*;""".r
    val rows: java.util.List[org.apache.spark.sql.Row] =
      edge.findAllMatchIn(text).map { m =>
        org.apache.spark.sql.Row(
          m.group(1), m.group(3), m.group(2) == "->",
          Option(m.group(4)).map(_.toDouble).orNull)
      }.toList.asJava
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("src", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("dst", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("directed", org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("weight", org.apache.spark.sql.types.DoubleType)))
    s.createDataFrame(rows, schema)
  }
}
