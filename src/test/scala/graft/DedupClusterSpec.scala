package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Properties of the near-dup cluster assignment that the flat DuckDB gate
  * can't express directly: the transitive-closure semantics (every verified
  * pair shares a cluster even when only connected through a chain) and the
  * keeper invariants a downstream "drop non-keepers" filter relies on.
  */
class DedupClusterSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val clusters =
    DedupOps.qDedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  private lazy val pairs =
    DedupOps.qMinhashDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("every document is assigned, keepers are the cluster minima") {
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(clusters.size.toLong == nDocs, "assignment must cover the corpus")
    clusters.foreach { case (doc, (cid, keep)) =>
      assert(cid <= doc, s"cluster id must be the component minimum: $doc -> $cid")
      assert(keep == (cid == doc), s"keep flag inconsistent for $doc")
    }
    // exactly one keeper per cluster, and it is the cluster id itself
    val byCluster = clusters.groupBy(_._2._1)
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_._2._2) == 1, s"cluster $cid needs exactly one keeper")
      assert(members(cid)._2, s"the keeper of $cid must be doc $cid")
    }
  }

  test("cluster assignment is the transitive closure of the verified pairs") {
    assert(pairs.nonEmpty, "corpus must contain near-dup pairs for this spec")
    // endpoints of every verified pair land in the same cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1,
        s"pair ($a,$b) split across clusters ${clusters(a)._1}/${clusters(b)._1}")
    }
    // and the assignment equals an independent union-find over the pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    paired.foreach { doc =>
      assert(clusters(doc)._1 == find(doc),
        s"doc $doc: propagation ${clusters(doc)._1} != union-find ${find(doc)}")
    }
    // docs in no pair are singletons
    clusters.foreach { case (doc, (cid, _)) =>
      if (!paired.contains(doc)) assert(cid == doc, s"singleton $doc moved to $cid")
    }
  }

  test("stratified sample is deterministic and respects per-source rates") {
    val s1 = DedupOps.qStratifiedSample(spark, sfDir).collect().map(_.getLong(0)).toSeq
    val s2 = DedupOps.qStratifiedSample(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "the sample must be reproducible run-to-run")
    val rates = DedupOps.qStratifiedSample(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .join(Tables.documents(spark, sfDir).groupBy("source").agg(count(lit(1)).as("t")), "source")
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble / r.getLong(2)))
    rates.foreach { case (src, rate) =>
      val want = if (src.replaceAll("[^0-9]", "").toInt % 2 == 0) 0.3 else 0.7
      // small strata (25 docs at sf0.001) → wide tolerance; the point is
      // even-sources sample LOW and odd-sources HIGH, deterministically
      assert(math.abs(rate - want) < 0.25, s"$src sampled at $rate, want ~$want")
    }
  }

  test("q_lsh_quality counts are the exact set identities of the two index gates") {
    // cand ∩ truth ≡ the minhash VERIFIED pairs (a candidate that is a
    // true pair passes verify, and every verified pair is a banded
    // candidate in the exact truth set), and truth ≡ the PPJoin gate's
    // exact-recall output — so the eval's three counts are pinned by two
    // independently-mirrored gates, not by re-running its own dataflow
    val row = DedupOps.qLshQuality(spark, sfDir).collect().head
    val (nTrue, nCand, nHit) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nTrue == DedupOps.qJaccardPairs(spark, sfDir).count(),
      "n_true must equal the PPJoin exact gate")
    assert(nHit == DedupOps.qMinhashDedup(spark, sfDir).count(),
      "n_hit must equal the verified banded pairs")
    assert(nHit <= nCand && nHit <= nTrue)
    assert(nTrue > 0 && nCand > 0, "vacuous eval — no pairs on this corpus")
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(row.getDouble(3) == r4(nHit.toDouble / nTrue))
    assert(row.getDouble(4) == r4(nHit.toDouble / nCand))
  }
}
