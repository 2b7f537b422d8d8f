package graft

import java.nio.file.Files
import java.security.MessageDigest

import graft.operators.{CorpusOps, DedupOps, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-selection operators: greedy MMR on a hand-built geometry where the
  * diverse pick must beat the higher-scoring near-duplicate, and the
  * train→held-out n-gram novelty gate against a from-scratch mirror. */
class SelectionSpec extends AnyFunSuite {
  import SparkTestBase._

  test("q_mmr_select skips the near-duplicate in favor of the diverse item") {
    import spark.implicits._
    // probe p = e1; A and C sit at equal angles on OPPOSITE sides of p
    // (rel 0.9 each), B is an exact duplicate of A. Step 1 is a three-way
    // rel tie -> smallest vec_id (A). Step 2: B scores
    // λ·0.9 − μ·cos(B,A)=1, C scores λ·0.9 − μ·cos(C,A)≈0.62 — C must win
    // despite equal relevance. Step 3 takes the remaining B.
    val dir = Files.createTempDirectory("mmr_fix").toString
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), "p"),
      (1L, Seq(0.9f, 0.436f, 0.0f, 0.0f), "a"),
      (2L, Seq(0.9f, 0.436f, 0.0f, 0.0f), "b"),
      (3L, Seq(0.9f, -0.436f, 0.0f, 0.0f), "c"),
    ).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = VectorOps.qMmrSelect(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1, 2, 3), "steps must be 1..3 (pool of 3)")
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L),
      s"expected selection order A, C, B; got ${got.map(_._2).mkString(",")}")
    // equal relevance by construction; the duplicate's full μ penalty
    // must rank it below the diverse item's partial one
    assert(got.map(_._3).distinct.length == 1, s"rels differ: $got")
    assert(got(1)._4 > got(2)._4, s"diverse pick must outscore the dup: $got")
  }

  test("q_mmr_select invariants on real data: pool-top first, penalties only shrink scores") {
    val rows = VectorOps.qMmrSelect(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == VectorOps.MMR_K)
    assert(rows.map(_._1).toSeq == (1 to VectorOps.MMR_K))
    assert(rows.map(_._2).distinct.length == rows.length, "an item was selected twice")
    // step 1 is the raw relevance argmax: its mmr score is λ·rel exactly
    val r1 = rows.head
    assert(math.abs(r1._4 - VectorOps.MMR_LAMBDA * r1._3) < 2e-6)
    assert(r1._3 == rows.map(_._3).max, "step 1 must take the max-relevance item")
    // every later score carries a non-negative-similarity penalty only if
    // vectors correlate; it can never EXCEED λ·rel + μ (cos ≥ −1)
    rows.tail.foreach { case (_, id, rel, mmr) =>
      assert(mmr <= VectorOps.MMR_LAMBDA * rel + VectorOps.MMR_MU + 2e-6,
        s"score above the λ·rel + μ ceiling for $id")
    }
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def hash32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  private def toks(text: String): Seq[String] = {
    val t = text.replaceAll("^\\s+|\\s+$", "")
    if (t.isEmpty) Seq.empty else t.split("\\s+").toSeq
  }

  test("q_ngram_novelty matches a from-scratch split/gram mirror") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def splitOf(id: Long): String = {
      val h = hash32(s"spl_$id") % 100
      if (h < DedupOps.TRAIN_PCT) "train"
      else if (h < DedupOps.VALID_PCT) "valid" else "test"
    }
    def gramsOf(text: String): Set[String] = {
      val ws = toks(text)
      if (ws.length >= CorpusOps.NOV_N)
        ws.sliding(CorpusOps.NOV_N).map(_.mkString(" ")).toSet
      else Set(text.replaceAll("^\\s+|\\s+$", ""))
    }
    val bySplit = docs.map { case (id, t) => (id, splitOf(id), gramsOf(t)) }
    val trainGrams = bySplit.collect { case (_, "train", gs) => gs }
      .foldLeft(Set.empty[String])(_ union _)
    val expected = bySplit.collect { case (id, sp, gs) if sp != "train" =>
      val seen = gs.count(trainGrams.contains)
      (id, sp, gs.size.toLong, seen.toLong,
        math.floor((1.0 - seen.toDouble / gs.size) * 1e4 + 0.5) / 1e4)
    }.toSet
    val got = CorpusOps.qNgramNovelty(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected, s"novelty mismatch")
    // the metric must discriminate on this corpus: not all docs fully novel
    assert(got.exists(_._5 < 1.0), "no memorized grams found at all — width mis-tuned")
  }

  test("q_weighted_sample is the exact ES top-K of an independent mirror") {
    // independent path: MD5 via MessageDigest, keys as u^(1/w) with
    // math.pow — the gate ranks by ln(u)/w, and ES's whole point is that
    // the two orderings are identical; membership AND order must agree
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val keyed = docs.map { case (id, t) =>
      val w = toks(t).length
      val u = (hash32(s"wes_$id").toDouble + 0.5) / 4294967296.0
      (id, w.toLong, math.pow(u, 1.0 / w))
    }.filter(_._2 > 0)
    val expect = keyed.sortBy { case (id, _, k) => (-k, id) }
      .take(DedupOps.WEIGHTED_K).map(t => (t._1, t._2)).toSeq
    val got = DedupOps.qWeightedSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == expect, "ES top-K membership/order diverged from the mirror")
    // weighting must bite: the sample's mean token count exceeds the
    // corpus mean (long docs over-selected by construction)
    val corpusMean = keyed.map(_._2).sum.toDouble / keyed.length
    val sampleMean = got.map(_._2).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean — weights ignored")
  }
}
