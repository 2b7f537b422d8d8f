package graft.sources

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
}
