package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** ADVICE r5: LSH bucket bits (`dot >= 0`) and IVF cell assignment (argmin
  * over dist2) hinge on unrounded cross-engine double comparisons — Spark's
  * sequential `aggregate` fold and DuckDB's `list_sum` must land on the
  * same side of the boundary. Summation-order differences perturb a sum by
  * ~1 ulp (relative ~1e-16), so the gates are robust iff no vector sits
  * within a comfortably larger margin of a decision boundary. This spec
  * pins that property on the test corpus: if the driver regenerates data
  * that violates it, these fail loudly instead of a gate hash flipping.
  */
class BoundaryMarginSpec extends AnyFunSuite {
  import SparkTestBase._

  /** Margin far above any summation-order perturbation (~1e-16 relative)
    * yet far below real data spacing. */
  private val EPS = 1e-9

  private lazy val rows: Array[(Long, Array[Double], Long)] =
    Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v",
        "cast(label as bigint) as label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))

  test("no LSH hyperplane dot product sits within EPS of zero") {
    val planes = Array.tabulate(VectorOps.LSH_BITS, VectorOps.DIM)(VectorOps.planeVal)
    var minAbs = Double.MaxValue
    for ((id, v, _) <- rows; h <- 0 until VectorOps.LSH_BITS) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * planes(h)(i); i += 1 }
      assert(math.abs(dot) > EPS,
        s"vec $id dot plane $h = $dot — inside the cross-engine danger zone")
      minAbs = math.min(minAbs, math.abs(dot))
    }
    info(f"minimum |dot| over corpus x planes: $minAbs%.3e")
  }

  test("IVF cell assignment gaps exceed EPS at both probe widths") {
    // centroids as the operators compute them: per-(label, dim) mean
    val byLabel = rows.groupBy(_._3)
    val centroids = byLabel.map { case (lbl, vs) =>
      val dim = vs.head._2.length
      val c = new Array[Double](dim)
      vs.foreach(t => for (i <- 0 until dim) c(i) += t._2(i))
      for (i <- 0 until dim) c(i) /= vs.length
      lbl -> c
    }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var minGap = Double.MaxValue
    for ((id, v, _) <- rows) {
      val ds = centroids.values.map(c => d2(v, c)).toArray.sorted
      // the NASSIGN-th/(NASSIGN+1)-th gap pins q_cosine_blocked's 2-probe
      // assignment; the NPROBE boundary pins q_ann_ivf's probe set
      for (k <- Seq(VectorOps.NASSIGN, VectorOps.NPROBE).distinct
           if k < ds.length) {
        val gap = ds(k) - ds(k - 1)
        assert(gap > EPS, s"vec $id: cell ranks ${k - 1}/$k separated by only $gap")
        minGap = math.min(minGap, gap)
      }
    }
    info(f"minimum assignment gap over corpus: $minGap%.3e")
  }

  /** ADVICE r6: the corpus loops above cover the probe only because
    * PROBE_ID happens to be a corpus row — pin the PROBE's own decision
    * boundaries by name so the guarantee survives any future probe that
    * is NOT part of the table (a user query vector). These are the two
    * boundaries that pick what q_ann_ivf scans (centroid ranking at rank
    * NPROBE) and where q_ann_lsh looks (the probe's bucket bits). */
  test("the fixed probe vector's own margins: NPROBE centroid gap and plane dots") {
    val probe = rows.find(_._1 == VectorOps.PROBE_ID)
      .getOrElse(fail(s"probe ${VectorOps.PROBE_ID} missing from embeddings"))._2

    // LSH: every bucket bit of the probe is decided by a comfortable margin
    val planes = Array.tabulate(VectorOps.LSH_BITS, VectorOps.DIM)(VectorOps.planeVal)
    for (h <- 0 until VectorOps.LSH_BITS) {
      var dot = 0.0
      var i = 0
      while (i < probe.length) { dot += probe(i) * planes(h)(i); i += 1 }
      assert(math.abs(dot) > EPS, s"probe dot plane $h = $dot — bucket bit unstable")
      info(f"probe plane $h%d dot: $dot%.3e")
    }

    // IVF: the probe's centroid ranking is stable at the NPROBE cut
    val byLabel = rows.groupBy(_._3)
    val centroids = byLabel.map { case (lbl, vs) =>
      val dim = vs.head._2.length
      val c = new Array[Double](dim)
      vs.foreach(t => for (i <- 0 until dim) c(i) += t._2(i))
      for (i <- 0 until dim) c(i) /= vs.length
      lbl -> c
    }
    val ds = centroids.values.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { val d = probe(i) - c(i); s += d * d; i += 1 }
      s
    }.toArray.sorted
    assert(VectorOps.NPROBE < ds.length, "corpus has too few cells to rank")
    val gap = ds(VectorOps.NPROBE) - ds(VectorOps.NPROBE - 1)
    assert(gap > EPS,
      s"probe centroid ranks ${VectorOps.NPROBE - 1}/${VectorOps.NPROBE} separated by only $gap")
    info(f"probe NPROBE-cut centroid gap: $gap%.3e")
  }

  test("corpus-mix keep test survives the int64 overflow boundary (decimal(38) promotion)") {
    import graft.operators.DedupOps
    import org.apache.spark.sql.functions._
    // t_src big enough that h·n_src·t_src·MIX_DEN wraps int64
    // (99999·20·6e17·10 ≈ 1.2e24 ≫ 2⁶³ ≈ 9.2e18) but the true compare is
    // well-defined; expected side computed in BigInt.
    val cases = Seq(
      (99999L, 20L, 600000000000000000L, 1200000000000000000L),
      (1L, 20L, 600000000000000000L, 1200000000000000000L),
      // exact lhs == rhs (6·10⁶ both sides): strict < must NOT keep
      (6L, 1L, 100000L, 10L))
    val df = spark.createDataFrame(cases).toDF("h", "n_src", "t_src", "t_total")
      .withColumn("kept", DedupOps.mixKeepTest(
        col("h"), col("n_src"), col("t_src"), col("t_total")))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4)))
    for ((h, n, t, tt, kept) <- got) {
      val expect = BigInt(h) * n * t * DedupOps.MIX_DEN <
        BigInt(tt) * DedupOps.MIX_NUM * DedupOps.SAMPLE_SPACE
      val wrapped = h * n * t * DedupOps.MIX_DEN <
        tt * DedupOps.MIX_NUM * DedupOps.SAMPLE_SPACE
      assert(kept == expect, s"(h=$h n=$n t=$t tt=$tt): got $kept want $expect")
      info(s"h=$h: decimal=$kept int64-would-say=$wrapped exact=$expect")
    }
    // the spec is only meaningful if int64 actually disagrees somewhere
    assert(got.exists { case (h, n, t, tt, _) =>
      (BigInt(h) * n * t * DedupOps.MIX_DEN < BigInt(tt) * DedupOps.MIX_NUM * DedupOps.SAMPLE_SPACE) !=
        (h * n * t * DedupOps.MIX_DEN < tt * DedupOps.MIX_NUM * DedupOps.SAMPLE_SPACE)
    }, "no case exercised the overflow region — boundary spec is vacuous")
  }
}
