package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SkewOps, VectorOps}

/** Invariants of the round-7 operators that the value-exact gate can't
  * state: the quantizer's mathematical error bound, and salt-count
  * invariance of the salted operators (the gate pins ONE salt count; the
  * operator must be correct for ANY). */
class QuantizeSpec extends AnyFunSuite {
  import SparkTestBase._

  test("int8 quantization error is bounded by scale/2 for every vector") {
    val rows = VectorOps.qEmbedQuantize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, scale, codeSum, maxErr) =>
      // round-half-up to the nearest code ⟹ |x − q·scale| ≤ scale/2
      // (+ a rounding-output epsilon from the 8-dp gate rounding)
      assert(maxErr <= scale / 2 + 1e-8,
        s"vec $id: max_err $maxErr exceeds scale/2 = ${scale / 2}")
      // codes span int8: |Σq| ≤ 127·dim is the loosest sanity bound
      assert(math.abs(codeSum) <= 127L * VectorOps.DIM, s"vec $id code_sum $codeSum")
    }
  }

  test("salted join and collect are invariant to the salt count") {
    val events = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "user_id")
    val dim = events.select("event_type").distinct()
    def joinRows(salts: Int): Seq[Long] =
      SkewOps.saltedJoin(events, dim, "event_type", "event_id", salts)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    def collectRows(salts: Int): Map[String, Seq[Long]] =
      SkewOps.saltedCollect(events, "event_type", "user_id", "event_id", salts)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val (j1, c1) = (joinRows(1), collectRows(1))
    for (salts <- Seq(2, 7, 32)) {
      assert(joinRows(salts) == j1, s"saltedJoin changed results at salts=$salts")
      assert(collectRows(salts) == c1, s"saltedCollect changed results at salts=$salts")
    }
  }
}
