package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** q_good_turing proofs: the distributed count-of-counts pipeline equals a
  * from-scratch scalar trigram count over the same corpus, and the
  * reported columns satisfy the estimator's identities.
  */
class GoodTuringSpec extends AnyFunSuite {
  import SparkTestBase._

  private def rp(x: Double, p: Double) = math.floor(x * p + 0.5) / p

  /** Scalar mirror of the gate's gram stream: lowercase, full-whitespace
    * trim, whitespace split, length-GT_N sliding windows. */
  private def mirrorGrams(): Seq[String] = {
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    texts.flatMap { t =>
      val lt = t.toLowerCase.replaceAll("^\\s+|\\s+$", "")
      val w = if (lt.isEmpty) Array.empty[String] else lt.split("\\s+")
      if (w.length >= CorpusOps.GT_N)
        w.sliding(CorpusOps.GT_N).map(_.mkString(" ")).toSeq
      else Seq.empty
    }
  }

  private lazy val rows =
    CorpusOps.qGoodTuring(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)

  test("count-of-counts rows equal the scalar trigram mirror") {
    val freq = mirrorGrams().groupBy(identity).map { case (_, v) => v.size.toLong }
    val nr = freq.groupBy(identity).map { case (r, v) => r -> v.size.toLong }
    val nTokens = freq.sum
    val expect = nr.keys.filter(_ <= CorpusOps.GT_MAX).toSeq.sorted.map { r =>
      val nR = nr(r); val nR1 = nr.getOrElse(r + 1, 0L)
      val rStar = (r + 1).toDouble * nR1.toDouble / nR.toDouble
      (r, nR, nR1, nTokens, rp(rStar, 1e6), rp(rStar / nTokens.toDouble, 1e9))
    }
    assert(rows.toSeq == expect,
      s"gate:\n${rows.mkString("\n")}\nmirror:\n${expect.mkString("\n")}")
  }

  test("the r = 1 row prices the missing mass: p_gt(1) = 2*N_2/(N_1*N)") {
    val r1 = rows.find(_._1 == 1L).get
    assert(r1._2 > 0, "corpus lost its trigram hapaxes — gate degenerate")
    // r_star(1) = 2*N_2/N_1 by definition
    assert(r1._5 == rp(2.0 * r1._3 / r1._2, 1e6), s"$r1")
  }
}
