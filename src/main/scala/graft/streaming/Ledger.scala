package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared exactly-once scaffolding for the foreachBatch ingests
  * ([[CorpusIngest.startCurated]], [[CorpusIngest.startFuzzy]],
  * [[VectorIngest.start]]): every output lands in a per-batch-id
  * OVERWRITE subdirectory (`<dir>/batch=<id>`, read back through
  * partition discovery), and novelty is judged against the ledger of
  * STRICTLY EARLIER batches — never a replaying batch's own partial
  * writes. The two invariants live here once, because they are the whole
  * crash-replay argument: a replayed batch recomputes from identical
  * inputs and overwrites its own outputs byte-for-byte. */
private[streaming] object Ledger {

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** `keyed` minus rows whose `keyCol` appears in a strictly-earlier
    * batch of the ledger at `dir` (all of `keyed` when no ledger exists
    * yet). */
  def withoutSeen(spark: SparkSession, keyed: DataFrame, dir: String,
                  bid: Long, keyCol: String): DataFrame =
    if (!exists(spark, dir)) keyed
    else keyed.join(
      spark.read.parquet(dir).filter(col("batch") < bid).select(keyCol),
      Seq(keyCol), "left_anti")
}
