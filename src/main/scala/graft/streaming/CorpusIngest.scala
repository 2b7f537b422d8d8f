package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Incremental DEDUPED corpus ingest — the missing end of the dedup story:
  * batch dedup cleans a snapshot ([[graft.operators.DedupOps]]), streaming
  * dedup drops re-deliveries inside one run
  * ([[EventStream.dedupedEventsOf]]); this builds the PERSISTENT corpus a
  * training pipeline actually accumulates, exactly-once across restarts.
  *
  * Shape: a file stream of document batches → `foreachBatch`:
  *   1. within-batch exact dedup on the content key (md5 of normalized
  *      text — the same key as q_dedup_exact, 32 bytes however large the
  *      document);
  *   2. LEFT ANTI join against the content keys already in the corpus dir
  *      (at 100 TB the corpus is content-key-bucketed parquet, so the
  *      anti join is key-local and reads only the key column — column
  *      pruning keeps the probe narrow);
  *   3. append only the novel documents.
  * Re-delivered files, duplicate documents across deliveries, and restarts
  * (checkpointed source offsets + idempotent-by-key appends) all land
  * exactly one copy of each distinct text in the corpus.
  */
object CorpusIngest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Content identity: the exact-dedup key of DedupOps.qDedupExact. */
  def contentKey(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(lower(trim(text)))

  /** Start the ingest: watch `srcDir` for document parquet files, append
    * novel-content docs to `corpusDir`. `checkpointDir` carries source
    * offsets so a restart resumes instead of re-reading everything. */
  def start(s: SparkSession, srcDir: String, corpusDir: String,
            checkpointDir: String): StreamingQuery = {
    val corpusPath = new org.apache.hadoop.fs.Path(corpusDir)
    s.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1") // deliveries stay distinct micro-batches
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val keyed = batch
          .withColumn("ck", contentKey(col("text")))
          // within-batch winner: smallest doc_id per content key, chosen
          // deterministically (same rule as the batch exact dedup)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("ck")).orderBy(col("doc_id"))))
          .filter(col("rn") === 1).drop("rn")
        val fs = corpusPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val novel =
          if (!fs.exists(corpusPath)) keyed
          else {
            // probe only the key column of the existing corpus — at scale
            // this is a narrow scan of a bucketed column, not a table read
            val seen = spark.read.parquet(corpusDir).select("ck")
            keyed.join(seen, Seq("ck"), "left_anti")
          }
        novel.write.mode("append").parquet(corpusDir)
      }
      .start()
  }
}
