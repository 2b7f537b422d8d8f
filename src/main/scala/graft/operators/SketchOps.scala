package graft.operators

import graft.Tables
import graft.functions.{Fns, Kmv}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch operators — deterministic cardinality estimation at sketch-sized
  * shuffle cost (see [[graft.functions.Kmv]] for the estimator and why it
  * is oracle-gateable where HyperLogLog is not).
  */
object SketchOps {
  type Q = (SparkSession, String) => DataFrame

  /** Micros per day — the activity grain being counted. */
  private val DAY_US = 86400000000L

  /** KMV distinct (user, day) pairs per event type — "daily active users"
    * cardinality, the canonical pipeline sketch workload. Reports the
    * count of DISTINCT HASH VALUES beside the estimate so the gate pins
    * both the sketch math and its input (`n_distinct_hashes`, not
    * "exact": a 32-bit collision between two (user, day) pairs would
    * undercount the true pair count — at these cardinalities vs 2^32 the
    * gap is cosmetic, but the column is named for what it measures). The
    * distinct() pre-pass dedupes hashes on the compound key (one
    * spread-out shuffle, same de-skew shape as q_distinct_users); the
    * sketch itself then shuffles ≤K longs per group. At 100 TB the
    * distinct-hash column is the expensive one — a production run keeps
    * only the sketch. A kth value of 0 (p ≈ K·2⁻³², impossible on this
    * corpus but guarded anyway) yields a null estimate on BOTH engines
    * rather than an Infinity. */
  val qKmvDistinct: Q = (s, d) => {
    val day = floor(unix_micros(col("ts")) / lit(DAY_US)).cast("string")
    val h = Tables.events(s, d)
      .select(col("event_type"),
        Fns.hash32(concat(col("user_id").cast("string"), lit("_"), day)).as("h"))
      .distinct()
    val kthMin = udaf(new Kmv.KthMinAgg())
    h.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct_hashes"), kthMin(col("h")).as("kth"))
      .filter(col("kth").isNotNull)
      .select(col("event_type"), col("n_distinct_hashes"),
        when(col("kth") > 0,
          Fns.roundP(lit(Kmv.EST_NUM) / col("kth").cast("double"), 4)).as("kmv_est"))
      .orderBy("event_type")
  }

  val queries: Map[String, Q] = Map("q_kmv_distinct" -> qKmvDistinct)

  val oracles: Map[String, String] = Map(
    "q_kmv_distinct" ->
      s"""WITH h AS (
         |  SELECT DISTINCT event_type,
         |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || '_' ||
         |      CAST(CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / $DAY_US) AS BIGINT) AS VARCHAR)), 1, 8) AS BIGINT) AS h
         |  FROM events),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |      FROM h),
         |ex AS (SELECT event_type, count(*) AS n_distinct_hashes FROM h GROUP BY 1)
         |SELECT r.event_type, ex.n_distinct_hashes,
         |  CASE WHEN r.h > 0
         |    THEN ${Fns.roundPSql(s"${Kmv.EST_NUM} / CAST(r.h AS DOUBLE)", 4)}
         |    ELSE NULL END AS kmv_est
         |FROM r JOIN ex ON r.event_type = ex.event_type
         |WHERE rn = ${Kmv.K} ORDER BY r.event_type""".stripMargin,
  )
}
