package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Incremental VECTOR-STORE ingest — the streaming end of the
  * similarity-search story (as [[CorpusIngest]] is for dedup/curation):
  * embeddings arrive in batches and land in an IVF-cell-partitioned
  * store, so ANN queries against the store read only the probed cells'
  * partitions (partition pruning does the IVF scan cut at the FILE level
  * — the layout [[graft.operators.VectorOps.qAnnIvf]] assumes at 100 TB).
  *
  * Per micro-batch:
  *   1. exactly-once by vec_id: within-batch dropDuplicates + anti-join
  *      against the seen ledger of strictly-earlier batches;
  *   2. row-local cell assignment against the broadcast coarse-quantizer
  *      centroids ([[graft.operators.VectorOps.assignCells]] — the
  *      identical argmin arithmetic the k-means gate pins, zero
  *      exchange);
  *   3. append to `storeDir/batch=<bid>` partitioned by cell, with the
  *      per-batch-id overwrite protocol of [[CorpusIngest.startCurated]]
  *      — re-delivery and crash-replay recompute identical batches.
  * The centroids are FIXED for the ingest's lifetime (the IVF contract:
  * re-clustering is a batch rebuild, not an incremental drift — cells
  * must mean the same thing for every stored vector or the pruned scan
  * lies). */
object VectorIngest {

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def start(s: SparkSession, srcDir: String, storeDir: String,
            checkpointDir: String, seenDir: String,
            centroids: Seq[(Int, Seq[Double])]): StreamingQuery = {
    require(centroids.nonEmpty, "vector ingest needs a coarse quantizer")
    s.readStream
      .schema(vecSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val spark = batch.sparkSession
        // same-vec_id rows within a delivery are identical payloads;
        // dropDuplicates is deterministic over them, so replay rebuilds
        // the same batch
        val keyed = batch.dropDuplicates("vec_id")
        // novel feeds isEmpty, the store write, and the ledger write —
        // persist, or the anti-join re-runs per consumer
        val novel = Ledger.withoutSeen(spark, keyed, seenDir, bid, "vec_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (!novel.isEmpty) {
            // label rides THROUGH the argmin (assignCells passes input
            // columns along) — a projection, not a join-back shuffle
            graft.operators.VectorOps.assignCells(
                novel.select(col("vec_id"),
                  col("embedding").cast("array<double>").as("v"), col("label")),
                centroids)
              .select(col("vec_id"), col("v"), col("label"), col("cid").as("cell"))
              .write.mode("overwrite").partitionBy("cell")
              .parquet(s"$storeDir/batch=$bid")
            novel.select("vec_id")
              .write.mode("overwrite").parquet(s"$seenDir/batch=$bid")
          }
        } finally novel.unpersist()
      }
      .start()
  }
}
