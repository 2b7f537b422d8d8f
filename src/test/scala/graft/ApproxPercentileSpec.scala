package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the documented 100 TB swap for q_length_percentiles
  * (TextOps.qLengthPercentiles): exact `percentile` is a holistic
  * sort-per-group aggregate, so at scale the operator swaps in
  * `percentile_approx` — a mergeable KLL-style sketch with a RANK error
  * bound of 1/accuracy. This spec measures that bound instead of
  * narrating it: at sf0.1, for every source and every gated percentile,
  * the approximate answer must land between the exact order statistics at
  * rank ⌊(p − 1/acc)·(n−1)⌋ and ⌈(p + 1/acc)·(n−1)⌉. A sketch regression
  * (or a Spark behavior change on upgrade) fails here, not at 100 TB.
  */
class ApproxPercentileSpec extends AnyFunSuite {
  import SparkTestBase.spark

  /** sf0.1 — the bench SF, big enough per group (~thousands of docs) that
    * the rank window is meaningfully narrower than the value range. */
  private val dir = "/root/testdata/sf0.1"

  private val ACC = 100 // rank error ≤ n/100 per the percentile_approx contract
  private val PS = Seq(0.5, 0.9, 0.99) // the gated percentiles

  test("percentile_approx lands within the documented rank-error window of exact") {
    val approx = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        percentile_approx(length(col("text")), array(PS.map(lit): _*), lit(ACC)).as("ap"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1))
      .toMap

    val bySource = Tables.documents(spark, dir)
      .select(col("source"), length(col("text")).as("len"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1)
      .map { case (src, rows) => src -> rows.map(_._2).sorted }

    assert(approx.keySet == bySource.keySet)
    for ((src, sorted) <- bySource; (p, i) <- PS.zipWithIndex) {
      val n = sorted.length
      val lo = sorted(math.max(0, math.floor((p - 1.0 / ACC) * (n - 1)).toInt))
      val hi = sorted(math.min(n - 1, math.ceil((p + 1.0 / ACC) * (n - 1)).toInt))
      val got = approx(src)(i)
      assert(got >= lo && got <= hi,
        s"source=$src p=$p n=$n: approx $got outside exact rank window [$lo, $hi]")
      info(f"source=$src p=$p: approx=$got exact-window=[$lo,$hi] n=$n")
    }
  }
}
