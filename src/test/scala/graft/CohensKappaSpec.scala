package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** q_cohens_kappa proofs: the one-agg gate equals a scalar mirror on the
  * real corpus, and a constructed 2×2 fixture hits the closed-form value.
  */
class CohensKappaSpec extends AnyFunSuite {
  import SparkTestBase._

  private def rp6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def kappaOf(n11: Long, n10: Long, n01: Long, n00: Long)
      : (Double, Double, Double) = {
    val n = (n11 + n10 + n01 + n00).toDouble
    val po = (n11.toDouble + n00.toDouble) / n
    val pa = (n11.toDouble + n10.toDouble) / n
    val pb = (n11.toDouble + n01.toDouble) / n
    val pe = pa * pb + (1.0 - pa) * (1.0 - pb)
    (po, pe, (po - pe) / (1.0 - pe))
  }

  test("gate equals the scalar mirror on sf0.001") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("n_chars", "text").collect()
      .map { r =>
        val lt = r.getString(1).replaceAll("^\\s+|\\s+$", "")
        val toks = if (lt.isEmpty) 0 else lt.split("\\s+").length
        (r.getLong(0) >= CorpusOps.KAPPA_CHARS, toks >= CorpusOps.KAPPA_TOKS)
      }
    val n11 = docs.count { case (a, b) => a && b }.toLong
    val n10 = docs.count { case (a, b) => a && !b }.toLong
    val n01 = docs.count { case (a, b) => !a && b }.toLong
    val n00 = docs.count { case (a, b) => !a && !b }.toLong
    val (po, pe, k) = kappaOf(n11, n10, n01, n00)
    val r = CorpusOps.qCohensKappa(spark, sfDir).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((n11, n10, n01, n00)), s"confusion mismatch: $r")
    assert(r.getDouble(5) == rp6(po) && r.getDouble(6) == rp6(pe) &&
      r.getDouble(7) == rp6(k), s"stats mismatch: $r vs ($po, $pe, $k)")
    // the off-diagonals must be populated or the gate is degenerate
    assert(n10 + n01 > 0, "no rater disagreement at sf0.001 — thresholds drifted")
  }

  test("balanced 2×2 fixture: independence gives kappa = 0") {
    import spark.implicits._
    // one doc per confusion cell: chars≥300 ⊕ 55-token text
    val long55 = Seq.fill(55)("w").mkString(" ")
    val df = Seq(
      (1L, long55, 300L), // TT
      (2L, "w w", 300L),  // TF
      (3L, long55, 100L), // FT
      (4L, "w w", 100L)   // FF
    ).toDF("doc_id", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("kap").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CorpusOps.qCohensKappa(spark, dir).head()
    assert(r.getLong(0) == 4L &&
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 1L, 1L, 1L)), s"$r")
    assert(r.getDouble(5) == 0.5 && r.getDouble(6) == 0.5 && r.getDouble(7) == 0.0, s"$r")
  }
}
