package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ModelOps

/** q_isotonic proofs: the bounded minimax-join formulation equals a
  * from-scratch sequential pool-adjacent-violators fit (the textbook
  * algorithm it replaces), is monotone non-decreasing, and preserves the
  * weighted mean (the PAVA least-squares invariant).
  */
class IsotonicSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Sequential weighted PAVA over ordered (n, ok) buckets: merge any
    * block whose mean is ≥ its successor's until monotone; each bucket's
    * fit is its block's pooled ok/n. */
  private def pava(buckets: Seq[(Long, Long)]): Seq[Double] = {
    val blocks = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    for ((n, ok) <- buckets) {
      var (cn, cok, cc) = (n, ok, 1)
      // prev mean >= curr mean  <=>  prev.ok * cn >= cok * prev.n (integers)
      while (blocks.nonEmpty &&
        blocks.last._2 * cn >= cok * blocks.last._1) {
        val (pn, pok, pc) = blocks.remove(blocks.length - 1)
        cn += pn; cok += pok; cc += pc
      }
      blocks += ((cn, cok, cc))
    }
    blocks.flatMap { case (n, ok, c) =>
      Seq.fill(c)(ok.toDouble / n.toDouble) }.toSeq
  }

  private lazy val rows =
    ModelOps.qIsotonic(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)

  test("minimax fit equals sequential PAVA on the sf0.001 calibration buckets") {
    // recover integer ok from the rounded acc (n ≤ corpus size, so the
    // 5e-7 rounding error can't move the nearest integer)
    val nOk = rows.map { case (_, n, acc, _) =>
      (n, math.round(acc * n)) }
    val expect = pava(nOk)
    rows.zip(expect).foreach { case ((b, _, _, iso), e) =>
      assert(math.abs(iso - e) <= 1.1e-6,
        s"bucket $b: gate iso=$iso, PAVA=$e")
    }
  }

  test("fit is monotone non-decreasing in the bucket order") {
    val iso = rows.map(_._4)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b + 1.1e-6 },
      s"non-monotone fit: ${iso.mkString(", ")}")
  }

  test("fit preserves the weighted mean (least-squares invariant)") {
    val lhs = rows.map { case (_, n, _, iso) => n * iso }.sum
    val rhs = rows.map { case (_, n, acc, _) => math.round(acc * n).toDouble }.sum
    assert(math.abs(lhs - rhs) <= 1e-3 * math.max(1.0, rhs),
      s"sum n*iso=$lhs != sum ok=$rhs")
  }

  test("PAVA mirror pools a constructed violation correctly") {
    // means 0.5, 0.25 (violation), 1.0 → first two pool to 3/8
    assert(pava(Seq((4L, 2L), (4L, 1L), (4L, 4L))) ==
      Seq(0.375, 0.375, 1.0))
  }
}
