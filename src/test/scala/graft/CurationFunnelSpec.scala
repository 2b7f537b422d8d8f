package graft

import graft.operators.{CorpusOps, DedupOps, TextOps, VectorOps}
import org.scalatest.funsuite.AnyFunSuite

/** The curation funnel must count exactly what its constituent gated
  * filters report — recomputed here from the gates' own collected
  * outputs, not from re-derived predicates. */
class CurationFunnelSpec extends AnyFunSuite {
  import SparkTestBase._

  test("funnel stages equal conjunctions of the constituent gate outputs") {
    val gopher = TextOps.qGopherRules(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val exactKeep = DedupOps.qDedupExact(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val deconOk = CorpusOps.qDecontaminate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> !r.getBoolean(4)).toMap // absent = bench doc
    val semKeep = VectorOps.qSemanticDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val ids = gopher.keys.toSeq
    val n1 = ids.size.toLong
    val s2 = ids.filter(gopher)
    val s3 = s2.filter(exactKeep)
    val s4 = s3.filter(id => deconOk.getOrElse(id, false))
    val s5 = s4.filter(id => semKeep.getOrElse(id, true))
    val expected = Seq(
      (1, "total", n1), (2, "quality", s2.size.toLong),
      (3, "exact_dedup", s3.size.toLong), (4, "decontaminated", s4.size.toLong),
      (5, "semantic_dedup", s5.size.toLong))
    val got = CorpusOps.qCurationFunnel(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected, s"funnel mismatch: $got vs $expected")
    // the funnel must actually filter at every stage on the test corpus
    // (catches a predicate wired to `true`): stages weakly decrease and
    // the final stage drops something
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
    assert(got.last._3 < n1)
  }
}
