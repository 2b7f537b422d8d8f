package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q_bleu proofs: the distributed BLEU-4/ROUGE-2 equals a from-scratch
  * scalar mirror (clipped n-gram matches, add-one smoothing, brevity
  * penalty, per-source decimal-sum means) on hand-built fixtures covering
  * the clipping and brevity corners, and on the real sf0.001 corpus.
  */
class BleuSpec extends AnyFunSuite {
  import SparkTestBase._
  import TextOps.BLEU_N

  /** Spark's cast(x as decimal(28,18)) executed driver-side. */
  private def dec18(x: Double): java.math.BigDecimal = {
    val dd = org.apache.spark.sql.types.Decimal(x)
    require(dd.changePrecision(28, 18), s"decimal(28,18) overflow on $x")
    dd.toJavaBigDecimal
  }

  /** Scalar mirror, straight from the gate's documented formula. */
  private def bleuRouge(cand: String, ref: String): (Double, Double) = {
    val c = cand.trim.split("\\s+").toVector
    val r = ref.trim.split("\\s+").toVector
    def counts(t: Vector[String], n: Int): Map[Vector[String], Int] =
      t.sliding(n).toVector.filter(_.size == n).groupBy(identity)
        .map { case (g, xs) => g -> xs.size }
    val m = (1 to BLEU_N).map { n =>
      val cc = counts(c, n)
      val rc = counts(r, n)
      n -> cc.map { case (g, k) => math.min(k, rc.getOrElse(g, 0)) }.sum
    }.toMap
    val bp = if (c.size >= r.size) 1.0
             else math.exp(1.0 - r.size.toDouble / c.size.toDouble)
    val lnSum = (1 to BLEU_N).map { n =>
      math.log((m(n) + 1).toDouble / (c.size - n + 2).toDouble)
    }.reduce(_ + _)
    val bleu = bp * math.exp(lnSum * 0.25)
    val rouge2 = m(2).toDouble / (r.size - 1).toDouble
    (bleu, rouge2)
  }

  /** Per-source means over lag-paired docs, mirroring the gate's
    * decimal(28,18) sums and roundP(·, 6). */
  private def mirror(docs: Seq[(Long, String, String)]): Map[String, (Long, Double, Double)] =
    docs.groupBy(_._2).flatMap { case (src, ds) =>
      val sorted = ds.sortBy(_._1)
      val pairs = sorted.zip(sorted.drop(1)).collect {
        case ((_, _, ref), (_, _, cand))
            if cand.trim.split("\\s+").length >= BLEU_N &&
               ref.trim.split("\\s+").length >= BLEU_N =>
          bleuRouge(cand, ref)
      }
      if (pairs.isEmpty) None
      else {
        val bs = pairs.map(p => dec18(p._1)).reduce(_.add(_))
        val rs = pairs.map(p => dec18(p._2)).reduce(_.add(_))
        def rp(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
        Some(src -> ((pairs.size.toLong,
          rp(bs.doubleValue / pairs.size), rp(rs.doubleValue / pairs.size))))
      }
    }

  private def run(docs: Seq[(Long, String, String)]): Map[String, (Long, Double, Double)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = docs.toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    TextOps.bleuOf(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
  }

  test("identical pair scores BLEU exactly 1") {
    val got = run(Seq(
      (1L, "a", "the cat sat on the mat"),
      (2L, "a", "the cat sat on the mat")))
    assert(got("a")._1 == 1L && got("a")._2 == 1.0, s"identical pair: $got")
  }

  test("clipping caps repeated candidate grams at the reference count") {
    // cand repeats 'the' 6x; ref has 2 — unigram matches clip at 2, and the
    // scalar mirror (which clips by construction) must agree exactly
    val docs = Seq(
      (1L, "a", "the cat is on the mat"),
      (2L, "a", "the the the the the the"))
    assert(run(docs) == mirror(docs))
  }

  test("brevity penalty fires only when the candidate is shorter") {
    val short = Seq(
      (1L, "a", "the quick brown fox jumps over the lazy dog"),
      (2L, "a", "the quick brown fox"))
    val long = Seq(
      (1L, "b", "the quick brown fox"),
      (2L, "b", "the quick brown fox jumps over the lazy dog"))
    assert(run(short) == mirror(short), "short candidate must be penalized")
    assert(run(long) == mirror(long), "long candidate must not be")
    assert(run(short)("a")._2 < run(long)("b")._2,
      "BP must make the short-candidate direction score lower")
  }

  test("pairs below the token floor are excluded; singleton sources vanish") {
    val docs = Seq(
      (1L, "a", "one two three"),          // 3 tokens < BLEU_N: never a side
      (2L, "a", "one two three four five"),
      (3L, "a", "one two three four six"),
      (4L, "b", "lonely doc in its source"))
    val got = run(docs)
    assert(got.keySet == Set("a") && got("a")._1 == 1L,
      s"only the (2,3) pair survives: $got")
    assert(got == mirror(docs))
  }

  test("pairing survives BLEU_BKT bucket boundaries (two-level window repair)") {
    // doc_ids straddle the ⌊doc_id/BLEU_BKT⌋ boundary at 1024 (and an
    // EMPTY bucket gap before 3072): the bucket-first rows must pair with
    // the tail of the previous NON-EMPTY bucket, exactly like the single
    // global lag would
    val ids = Seq(1022L, 1023L, 1024L, 1025L, 3072L)
    val docs = ids.map(i => (i, "a", s"token one two three four id$i"))
    val got = run(docs)
    assert(got("a")._1 == 4L, s"all 4 adjacent pairs must survive: $got")
    assert(got == mirror(docs))
  }

  test("gate equals the scalar mirror on the real sf0.001 corpus") {
    val corpus = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val got = TextOps.qBleu(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got == mirror(corpus))
  }
}
