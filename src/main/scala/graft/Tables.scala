package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Every operator entry in [[SparkEntry.queries]] receives `(spark, sfDir)`
  * and reads only these tables — the scan itself is the DataFrame, so
  * Catalyst gets full pushdown/pruning on the parquet source.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.parquet`'s `ts` physical type has shifted across testdata
    * generations — TIMESTAMP(NANOS) originally, TIMESTAMP(MICROS) since the
    * round-8 regeneration — so the loader adapts to whatever is on disk
    * instead of assuming either:
    *
    *  - NANOS: Spark rejects it by default (PARQUET_TYPE_ILLEGAL); the
    *    legacy conf reads it as a raw nanos LONG, converted here with
    *    integral division (`ts / 1000` through doubles would lose precision
    *    above 2^53 ns ≈ 1970+104 days).
    *  - MICROS without tz: Spark infers TIMESTAMP_NTZ; cast to the session
    *    TIMESTAMP. Every entry point pins `spark.sql.session.timeZone=UTC`,
    *    so the cast re-interprets the same micros value as the identical
    *    UTC instant the nanos path produced (asserted by TemporalSpec's
    *    dual-schema fixture).
    *  - MICROS adjusted-to-UTC: already the session TIMESTAMP, pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => // TIMESTAMP_NTZ: naive micros == UTC instants (session tz is UTC)
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
