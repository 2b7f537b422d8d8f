package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** q_mmd_drift proofs: the group-sampled linear MMD² equals a from-scratch
  * scalar estimator (explicit hash split, quadruple scan, direct kernel
  * sums) on the real sf0.001 embeddings, detects a planted mean shift,
  * and sits near zero when both snapshots share a distribution.
  */
class MmdSpec extends AnyFunSuite {
  import SparkTestBase._
  import VectorOps.MMD_GAMMA

  private def rp(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  /** Fns.hash32 twin: first 8 md5 hex chars as a long, mod 2. */
  private def snap(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"snap_$id".getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16) % 2
  }

  /** Scalar mirror over (vec_id, v): ⌊id/4⌋ groups with exactly 2+2
    * members, h via direct kernel algebra, decimal(28,18) term sums. */
  private def mirror(pts: Seq[(Long, Seq[Double])]): (Long, Double) = {
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def k(a: Seq[Double], b: Seq[Double]) = math.exp(-MMD_GAMMA * d2(a, b))
    def dec18(x: Double) = {
      val dd = org.apache.spark.sql.types.Decimal(x)
      require(dd.changePrecision(28, 18)); dd.toJavaBigDecimal
    }
    val hs = pts.groupBy(_._1 / 4).toSeq.sortBy(_._1).flatMap { case (_, ms) =>
      val a = ms.filter(p => snap(p._1) == 0).sortBy(_._1)
      val b = ms.filter(p => snap(p._1) == 1).sortBy(_._1)
      if (a.size == 2 && b.size == 2)
        Some(k(a(0)._2, a(1)._2) + k(b(0)._2, b(1)._2)
          - k(a(0)._2, b(1)._2) - k(a(1)._2, b(0)._2))
      else None
    }
    val s = hs.map(dec18).reduce(_.add(_))
    (hs.size.toLong, rp(s.doubleValue / hs.size))
  }

  private def run(pts: Seq[(Long, Seq[Double])]): (Long, Double) = {
    import spark.implicits._
    val df = pts.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"),
        lit("x").as("label"))
    val dir = java.nio.file.Files.createTempDirectory("mmd").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = VectorOps.qMmdDrift(spark, dir).collect().head
    (r.getLong(0), r.getDouble(1))
  }

  /** Deterministic pseudo-vectors; shift applied to snapshot-1 members
    * makes A and B genuinely different distributions. */
  private def corpus(n: Int, shift: Double): Seq[(Long, Seq[Double])] =
    (0L until n.toLong).map { i =>
      val base = Seq.tabulate(4)(j => math.sin(i * 13.7 + j * 2.1).abs)
      val v = if (snap(i) == 1) base.map(_ + shift) else base
      // the gate stores float32 embeddings — mirror the rounded values
      (i, v.map(_.toFloat.toDouble))
    }

  test("planted mean shift drives MMD² up; same distribution stays near 0") {
    val same = run(corpus(400, 0.0))
    val drift = run(corpus(400, 6.0))
    assert(same == mirror(corpus(400, 0.0)))
    assert(drift == mirror(corpus(400, 6.0)))
    assert(math.abs(same._2) < 0.05, s"no-drift MMD² must be near 0: $same")
    // shift 6 across 4 dims: within-kernels ~1, cross-kernels ~e^{-2.25}
    assert(drift._2 > 0.5, s"shifted snapshot must score high: $drift")
  }

  test("gate equals the scalar mirror on the real sf0.001 embeddings") {
    val pts = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val r = VectorOps.qMmdDrift(spark, sfDir).collect().head
    assert((r.getLong(0), r.getDouble(1)) == mirror(pts))
  }
}
