package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** q_kcenter proofs: the driver-loop Gonzalez traversal equals a
  * from-scratch scalar greedy (explicit dmin recomputation each step) on
  * a hand-traceable fixture and on the real sf0.001 embeddings.
  */
class KcenterSpec extends AnyFunSuite {
  import SparkTestBase._
  import VectorOps.KC_K

  private def rp(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  /** Scalar greedy k-center: seed = min id, then argmax of
    * min-dist²-to-chosen, ties to the smaller id. */
  private def mirror(pts: Seq[(Long, Seq[Double])], k: Int): Seq[(Int, Long, Double)] = {
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = pts.minBy(_._1)
    var chosen = Vector(seed)
    var out = Vector((0, seed._1, 0.0))
    for (step <- 1 until k) {
      val pick = pts.map { p => (p, chosen.map(c => d2(p._2, c._2)).min) }
        .maxBy { case ((id, _), dm) => (dm, -id) }
      chosen :+= pick._1
      out :+= ((step, pick._1._1, rp(pick._2)))
    }
    out
  }

  private def run(pts: Seq[(Long, Seq[Double])]): Seq[(Int, Long, Double)] = {
    import spark.implicits._
    val df = pts.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"),
        (col("vec_id") % 3).cast("string").as("label"))
    val dir = java.nio.file.Files.createTempDirectory("kc").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    VectorOps.qKcenter(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("line fixture: farthest-point order is the hand trace") {
    // points on a line at 0, 4, 7, 10 (ids 0..3): seed 0, then 10
    // (d²=100), then 4 (dmin 16 beats 7's 9), then 7
    val pts = Seq(0L -> Seq(0.0), 1L -> Seq(4.0), 2L -> Seq(7.0), 3L -> Seq(10.0))
    val got = run(pts)
    assert(got.take(4).map(_._2) == Seq(0L, 3L, 1L, 2L), s"pick order: $got")
    assert(got == mirror(pts.map { case (i, v) => (i, v.map(_.toFloat.toDouble)) }, KC_K))
  }

  test("tie on dmin resolves to the smaller vec_id") {
    // 5 and -5 are both d²=25 from the seed at 0: id 1 must win step 1
    val pts = Seq(0L -> Seq(0.0), 1L -> Seq(5.0), 2L -> Seq(-5.0))
    val got = run(pts)
    assert(got(1)._2 == 1L, s"tie must go to the smaller id: $got")
    assert(got == mirror(pts, KC_K))
  }

  test("gate equals the scalar greedy on the real sf0.001 embeddings") {
    val pts = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val got = VectorOps.qKcenter(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == mirror(pts, KC_K))
    // coverage radius must be non-increasing (the greedy invariant)
    val rs = got.drop(1).map(_._3)
    assert(rs == rs.sorted.reverse, s"radius curve must decrease: $rs")
  }
}
