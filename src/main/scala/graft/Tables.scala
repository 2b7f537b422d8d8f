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
  /** Documents with the id/count columns normalized to LONG. The casts are
    * conditional — when the on-disk schema already matches (today's layout)
    * the frame is returned untouched, so filter pushdown on doc_id is
    * unaffected; a regeneration that narrows the ints (the events-ts
    * lesson, generalized) degrades to a widening cast instead of breaking
    * 40 gates at analysis time. */
  def documents(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "documents")
    import org.apache.spark.sql.types.LongType
    Seq("doc_id", "n_chars").foldLeft(df) { (acc, c) =>
      if (!acc.schema.fieldNames.contains(c)) acc // minimal fixtures omit n_chars
      else if (acc.schema(c).dataType == LongType) acc
      else acc.withColumn(c, col(c).cast(LongType))
    }
  }

  /** Embeddings with the vector normalized to array&lt;float&gt; and vec_id
    * to LONG — same conditional-normalization posture as [[documents]]
    * (a float↔double flip in a regenerated embeddings.parquet would
    * otherwise kill every typed Dataset[(Long, Array[Float])] operator). */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
    val df = apply(s, d, "embeddings")
    val withVec = df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case _ => df.withColumn("embedding", col("embedding").cast("array<float>"))
    }
    if (withVec.schema("vec_id").dataType == LongType) withVec
    else withVec.withColumn("vec_id", col("vec_id").cast(LongType))
  }

  /** AQE initial shuffle-partition count scaled with the SF dir's on-disk
    * bytes. The fixed dev `shuffle.partitions = 32` was the one superlinear
    * curve in the sf10 cold sweep (q_suffix_dup 12.1× for 10× data,
    * PERF.md): an 83 M-gram shuffle over 32 reducers pays n·log n sort +
    * spill per reducer as SF grows. On a real cluster partitions scale with
    * input; this mirrors that by feeding
    * `spark.sql.adaptive.coalescePartitions.initialPartitionNum` — AQE then
    * coalesces SMALL shuffles back down (parallelismFirst keeps the
    * default-parallelism floor), so only the genuinely large exchanges fan
    * out. ~32 MB of INPUT bytes per initial partition (shuffle volume
    * runs 3–10× input for the gram/wedge families after the digest-key
    * discipline, so this bounds reducers near the 100–300 MB cluster rule
    * of thumb); floor = cpus (dev dirs keep today's exact plans and gate
    * hashes), cap = 4096 (task-launch sanity). Measured at sf10
    * (q_suffix_dup cold, same host, post-digest): 32 parts 54 s /
    * 64 parts 69 s / 128 parts 103 s / 215 parts 74 s — local[32] pays
    * scheduling overhead for extra reducers because one shared heap has
    * no per-executor memory wall, so the target is set for the CLUSTER
    * memory bound (5.6 GB gram shuffle at sf10 over 32 reducers is
    * 175 MB each — fine; at sf100 it would be 1.75 GB each — OOM), not
    * for local wall-clock. */
  def scaledInitialPartitions(sfDir: String, cpus: Int): Int = {
    import java.nio.file.{Files, Paths}
    // dev A/B knob: pin the initial count regardless of input bytes
    sys.env.get("SPARK_GRAFT_INIT_PARTS").foreach(v => return v.toInt)
    val bytes =
      try {
        val s = Files.walk(Paths.get(sfDir))
        try s.filter(p => Files.isRegularFile(p)).mapToLong(p => Files.size(p)).sum
        finally s.close()
      } catch { case _: Throwable => 0L }
    val perPart = 32L << 20
    math.min(4096L, math.max(cpus.toLong, (bytes + perPart - 1) / perPart)).toInt
  }
}
