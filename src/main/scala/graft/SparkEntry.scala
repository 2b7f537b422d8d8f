package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 re-expressed
  * Spark-first; [[oracleSql]] carries the DuckDB-equivalent SQL the driver
  * uses for the hash-compare correctness gate. Column aliases match exactly
  * between both sides (the compare sorts columns by name).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
    operators.TextOps.queries ++
    operators.DedupOps.queries ++
    operators.VectorOps.queries ++
    operators.GraphOps.queries ++
    operators.BigGraphOps.queries ++
    operators.EventOps.queries ++
    operators.TemporalOps.queries ++
    operators.SketchOps.queries ++
    operators.GqlOps.queries ++
    operators.WalkOps.queries ++
    operators.MultimodalOps.queries ++
    operators.SourceOps.queries ++
    operators.SkewOps.queries ++
    operators.CorpusOps.queries ++
    operators.ModelOps.queries ++
    operators.BasketOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
    operators.TextOps.oracles ++
    operators.DedupOps.oracles ++
    operators.VectorOps.oracles ++
    operators.GraphOps.oracles ++
    operators.BigGraphOps.oracles ++
    operators.EventOps.oracles ++
    operators.TemporalOps.oracles ++
    operators.SketchOps.oracles ++
    operators.GqlOps.oracles ++
    operators.WalkOps.oracles ++
    operators.MultimodalOps.oracles ++
    operators.SourceOps.oracles ++
    operators.SkewOps.oracles ++
    operators.CorpusOps.oracles ++
    operators.ModelOps.oracles ++
    operators.BasketOps.oracles
}
