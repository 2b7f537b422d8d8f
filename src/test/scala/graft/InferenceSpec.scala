package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gql.GqlEngine

/** E10 inference — the classic rainy/sunny Viterbi example, hand-derived:
  * states v1 (rainy) / v2 (sunny), uniform start, observations
  * walk → shop → clean. δ-table on paper:
  *   t1: v1 .5·.1 = .05,  v2 .5·.6 = .30
  *   t2: v1 max(.035, .12)·.4 = .048 (from v2),  v2 .18·.3 = .054
  *   t3: v1 max(.0336, .0216)·.5 = .0168 (from v1),  v2 .0324·.1 = .00324
  * Best path: v2 → v1 → v1. Also covers the README's own statement with
  * `gassian(...)` weights and symbolic observations (mode evaluation),
  * and the ast rendering of the new statement. */
class InferenceSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def freshEngine(): GqlEngine = {
    val dir = java.nio.file.Files.createTempDirectory("gql-inf").toString
    new GqlEngine(spark, dir)
  }

  private val weather =
    """{query: hidden_variant,
      | event: [{e1: 'walk'}, {e2: 'shop'}, {e3: 'clean'}],
      | where: [
      |  [hidden_variant.v1, {->: 0.1}, e1],
      |  [hidden_variant.v1, {->: 0.4}, e2],
      |  [hidden_variant.v1, {->: 0.5}, e3],
      |  [hidden_variant.v2, {->: 0.6}, e1],
      |  [hidden_variant.v2, {->: 0.3}, e2],
      |  [hidden_variant.v2, {->: 0.1}, e3],
      |  [hidden_variant.v1, {->: 0.7}, hidden_variant.v1],
      |  [hidden_variant.v1, {->: 0.3}, hidden_variant.v2],
      |  [hidden_variant.v2, {->: 0.4}, hidden_variant.v1],
      |  [hidden_variant.v2, {->: 0.6}, hidden_variant.v2]]};""".stripMargin

  test("Viterbi decodes the hand-derived best path with exact ln-space deltas") {
    val rows = freshEngine().query(weather).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getDouble(4)))
    assert(rows.map(_._4).toSeq == Seq("v2", "v1", "v1"),
      s"best path wrong: ${rows.toSeq}")
    assert(rows.map(_._3).toSeq == Seq("walk", "shop", "clean"))
    // mirror the gate's LN-SPACE arithmetic (sums of ln terms, not
    // ln-of-product) so equality is to the 6-dp round, no tolerance games
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val d1 = math.log(1.0 / 2) + math.log(0.6)
    val d2 = d1 + math.log(0.4) + math.log(0.4)
    val d3 = d2 + math.log(0.7) + math.log(0.5)
    assert(rows.map(_._5).toSeq == Seq(r6(d1), r6(d2), r6(d3)),
      s"ln deltas: ${rows.map(_._5).toSeq} vs ${Seq(r6(d1), r6(d2), r6(d3))}")
  }

  test("the README's declared statement parses and runs (gassian at the mode)") {
    // README §4.6 verbatim shape: symbolic observations, mixed plain and
    // gassian weights; v4 is declared but unreachable by any emission
    val readme =
      """{query: hidden_variant,
        | event: [{e1: 'sun'}, {e2: 'rain'}, {e3: 'wind'}],
        | where: [
        |  [hidden_variant.v1, {->: 0.2}, e1],
        |  [hidden_variant.v2, {->: gassian(0.2, 0.1)}, e2],
        |  [hidden_variant.v3, {->: gassian(0.2, 0.1)}, e3],
        |  [hidden_variant.v1, {->: 0.2}, hidden_variant.v2],
        |  [hidden_variant.v2, {->: 0.2}, hidden_variant.v3],
        |  [hidden_variant.v1, {->: 0.2}, hidden_variant.v4]]};""".stripMargin
    val rows = freshEngine().query(readme).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getDouble(4)))
    // the only chain emitting all three observations is v1 → v2 → v3
    assert(rows.map(_._2).toSeq == Seq("v1", "v2", "v3"), rows.toSeq.toString)
    // symbolic observations put every gassian at its mode: 1/(0.1·√2π)
    val mode = 1.0 / (0.1 * math.sqrt(2 * math.Pi))
    val lp = math.log(1.0 / 4) + math.log(0.2) + math.log(0.2) +
      math.log(mode) + math.log(0.2) + math.log(mode)
    assert(math.abs(rows.last._3 - lp) < 1e-6, s"${rows.last._3} vs $lp")
  }

  test("ast renders the inference statement") {
    val e = freshEngine()
    val res = e.exec(s"ast ${weather.dropRight(1)};")
    val txt = res.last.text.getOrElse("")
    assert(txt.contains("Inference"), txt)
    assert(txt.contains("InfArc"), txt)
    assert(txt.contains("WGauss") || txt.contains("WNum"), txt)
  }
}
