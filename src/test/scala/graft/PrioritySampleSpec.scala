package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** q_priority_sample proofs: the TakeOrdered pipeline equals a scalar
  * Duffield–Lund–Thorup mirror (same md5 hash, same double trees), τ is
  * the (K+1)-th priority, and every sampled row carries ŵ = max(w, τ).
  */
class PrioritySampleSpec extends AnyFunSuite {
  import SparkTestBase._

  private def rp4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4

  private def hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  private def mirror(): (Seq[(Long, String, Long, Double, Double)], Double) = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pri = docs.map { case (id, src, w) =>
      val u = (hash32(s"pri_$id").toDouble + 0.5) / 4294967296.0
      (id, src, w, w.toDouble / u)
    }
    val top = pri.sortBy { case (id, _, _, p) => (-p, id) }
      .take(DedupOps.PRI_K + 1)
    val tau = top.map(_._4).min
    val sample = top.take(DedupOps.PRI_K)
      .map { case (id, src, w, p) =>
        (id, src, w, rp4(p), rp4(math.max(w.toDouble, tau))) }
      .sortBy(_._1)
    (sample.toSeq, tau)
  }

  private lazy val rows =
    DedupOps.qPrioritySample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .toSeq

  test("sample membership, priorities, and HT weights equal the scalar mirror") {
    val (expect, _) = mirror()
    assert(rows == expect,
      s"gate:\n${rows.take(5).mkString("\n")}\nmirror:\n${expect.take(5).mkString("\n")}")
  }

  test("every HT weight is at least the raw weight and at least τ-floor-consistent") {
    val (_, tau) = mirror()
    rows.foreach { case (id, _, w, _, est) =>
      assert(est + 1e-9 >= w.toDouble, s"doc $id: est_w $est < w $w")
      assert(est + 1e-4 >= math.min(w.toDouble, rp4(tau)),
        s"doc $id: est_w $est below both w and τ")
    }
  }

  test("the estimator's subset-sum totals are within the DLT variance band") {
    // Σŵ over the whole sample estimates total corpus weight with at most
    // one 'effective free unit' of variance (DLT 2007) — on this corpus a
    // loose 3× band is ample and pins gross τ/weight regressions.
    val (expect, _) = mirror()
    val estTotal = expect.map(_._5).sum
    val trueTotal = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("CAST(sum(n_chars) AS DOUBLE)").head().getDouble(0)
    assert(estTotal > trueTotal / 3 && estTotal < trueTotal * 3,
      s"estimated total $estTotal vs true $trueTotal")
  }
}
