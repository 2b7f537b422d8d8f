package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** q_quality_ensemble proofs: the drop precedence is FIXED (duplicate ≻
  * gopher ≻ lang-mismatch ≻ keep), the keeper election spares exactly one
  * copy, and on the real corpus the board is byte-consistent with the
  * source gates it composes (q_gopher_rules' keep column, q_langid's
  * prediction, qDupRatio's md5 content key) — the shared-builder refactor
  * made divergence impossible; this spec keeps it observable.
  */
class EnsembleSpec extends AnyFunSuite {
  import SparkTestBase._

  // a gopher-passing English text: >50 words, mean word length in [3,10],
  // no symbols, plenty of 'the/and' stopwords
  private val goodEn =
    Iterator.continually("the quick brown fox jumps over the lazy dog and runs")
      .take(8).mkString(" ")
  // fails gopher (11 words < 50) but is confidently English
  private val shortEn = "the cat and the dog sat on the mat again today"
  // gopher-passing German-profiled text: de stopword hits dominate en, but
  // the tail injects the ≥2 ENGLISH stopwords the (en-centric) Gopher
  // stopword rule demands
  private val goodDe =
    Iterator.continually("der hund und die katze das haus ist und gross der und")
      .take(8).mkString(" ") + " the king and queen"

  private def run(rows: Seq[(Long, String, String, String)]): Map[(String, String), Long] = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "source", "lang", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    TextOps.ensembleOf(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("precedence: duplicate beats gopher beats lang-mismatch") {
    val got = run(Seq(
      (1L, "s0", "en", goodEn),                    // keeper, passes all -> keep
      (2L, "s0", "en", goodEn),                    // dup copy of 1 -> drop_duplicate
      (3L, "s0", "de", shortEn + " alpha"),        // unique, fails gopher AND lang -> drop_gopher
      (4L, "s0", "de", goodEn + " and the bonus"), // unique, passes gopher, en text declared de -> drop_lang_mismatch
      (5L, "s1", "de", goodDe),                    // passes gopher, de matches -> keep
      (6L, "s1", "de", shortEn + " beta")          // unique, fails gopher -> drop_gopher
    ))
    assert(got == Map(
      ("s0", "keep") -> 1L,
      ("s0", "drop_duplicate") -> 1L,
      ("s0", "drop_gopher") -> 1L,
      ("s0", "drop_lang_mismatch") -> 1L,
      ("s1", "keep") -> 1L,
      ("s1", "drop_gopher") -> 1L), s"got $got")
  }

  test("a dup copy that ALSO fails gopher still reports as duplicate") {
    val got = run(Seq(
      (1L, "s0", "en", shortEn),   // keeper of the dup group -> drop_gopher
      (2L, "s0", "en", shortEn)))  // copy -> drop_duplicate (not drop_gopher)
    assert(got == Map(
      ("s0", "drop_gopher") -> 1L,
      ("s0", "drop_duplicate") -> 1L), s"got $got")
  }

  test("board equals the composition of the source gates on the real sf0.001 corpus") {
    val gopher = TextOps.qGopherRules(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val lang = TextOps.qLangId(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1) == r.getString(2))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val keeper = docs.groupBy(_._3).map { case (h, xs) => h -> xs.map(_._1).min }
    val expected = docs.map { case (id, src, h) =>
      val dec =
        if (id != keeper(h)) "drop_duplicate"
        else if (!gopher(id)) "drop_gopher"
        else if (!lang(id)) "drop_lang_mismatch"
        else "keep"
      (src, dec)
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val got = TextOps.qQualityEnsemble(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("dataset card rates equal the source gates' own counts on sf0.001") {
    val gopher = TextOps.qGopherRules(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val lang = TextOps.qLangId(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1) == r.getString(2))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def rp(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = TextOps.qDatasetCard(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    docs.groupBy(_._2).foreach { case (src, xs) =>
      val n = xs.size
      val want = (n.toLong,
        rp(1.0 - xs.map(_._3).distinct.size.toDouble / n.toDouble),
        rp(xs.count(x => gopher(x._1)).toDouble / n.toDouble),
        rp(xs.count(x => lang(x._1)).toDouble / n.toDouble))
      assert(got(src) == want, s"source $src: ${got(src)} != $want")
    }
  }
}
