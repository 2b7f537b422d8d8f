package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Recall contract of the IVF-cell-blocked cosine near-dup scan: every pair
  * it reports must also be reported (with the identical similarity) by the
  * exhaustive all-pairs baseline, and on the test corpus the blocking must
  * retain a usable fraction of the true pairs (near-dups cluster, so their
  * members land in the same nearest-centroid cell).
  */
class CosineBlockingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("blocked pairs are a subset of brute-force pairs with identical cosines") {
    val brute = pairs(VectorOps.qCosinePairs(spark, dir))
    val blocked = pairs(VectorOps.qCosineBlocked(spark, dir))
    assert(blocked.nonEmpty, "blocking must retain at least one near-dup pair")
    blocked.foreach { case (ids, cos) =>
      assert(brute.contains(ids), s"blocked pair $ids missing from brute force")
      assert(brute(ids) == cos, s"cosine mismatch for $ids")
    }
    // sanity on recall — not a tight bound, but a collapse to ~0 recall
    // (e.g. every vector assigned to one cell of singletons) must fail
    assert(blocked.size * 2 >= brute.size,
      s"blocked recall too low: ${blocked.size}/${brute.size}")
  }

  test("cell sub-bucketing: inert at the default cap, bounds bucket pops and keeps subset semantics under a small cap") {
    import org.apache.spark.sql.functions._
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))

    // at the default cap every testdata cell is under-cap: nb = 0 and the
    // whole frame sits in sub-bucket 0 — the property that keeps the gate
    // hashes byte-identical to the pre-capping dataflow
    val inert = VectorOps.cellBucketed(v, VectorOps.CELL_CAP)
      .groupBy("bkt").count().collect()
    assert(inert.map(_.getLong(0)).toSet == Set(0L),
      s"default cap must be inert on testdata, got buckets ${inert.mkString(",")}")

    // a small cap forces the split: no (cell, bkt) key may hold more than
    // cap×4 members (hyperplane splits halve in expectation; 4× slack
    // covers skew + the doubled multi-probe memberships)
    val cap = 30
    val capped = VectorOps.cellBucketed(v, cap)
    val maxPop = capped.groupBy("cell", "bkt").count()
      .agg(max("count")).head().getLong(0)
    assert(maxPop <= cap * 4L, s"bucket pop $maxPop exceeds ${cap * 4}")

    // capped pairs are a SUBSET of the uncapped blocked pairs (the join
    // key only refines), with identical cosines, and recall does not
    // collapse — the multi-probe flip must keep a usable fraction even at
    // the loose COS_T where per-bit collision odds are worst
    val uncapped = pairs(VectorOps.qCosineBlocked(spark, dir))
    val sub = pairs(VectorOps.cosineBlockedWith(cap)(spark, dir))
    sub.foreach { case (ids, cos) =>
      assert(uncapped.contains(ids), s"capped pair $ids not in uncapped set")
      assert(uncapped(ids) == cos, s"cosine drifted for $ids")
    }
    assert(sub.size * 10 >= uncapped.size,
      s"capped recall collapsed: ${sub.size}/${uncapped.size}")
  }

  test("q_semantic_dedup equals union-find over the blocked pairs") {
    val edges = pairs(VectorOps.qCosineBlocked(spark, dir)).keys.toSeq
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = VectorOps.qSemanticDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.nonEmpty)
    got.foreach { case (id, cid, keep) =>
      assert(cid == find(id), s"vec $id: cluster $cid vs union-find ${find(id)}")
      assert(keep == (cid == id))
    }
    // deduplication really happens at spec scale: some vec must not be kept
    assert(got.exists(!_._3), "no duplicates found — pair stage broke")
    // exactly one keeper per cluster
    val byCluster = got.groupBy(_._2)
    byCluster.foreach { case (cid, ms) =>
      assert(ms.count(_._3) == 1, s"cluster $cid has ${ms.count(_._3)} keepers")
    }
  }

  test("LSH-bucketed ANN recalls exact neighbors and never invents distances") {
    val exact = VectorOps.qKnn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = VectorOps.qAnnLsh(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(lsh.length == VectorOps.TOPK, s"LSH returned ${lsh.length} rows")
    // any id both paths return must carry the identical rounded distance
    lsh.foreach { case (id, d) =>
      exact.get(id).foreach(ed => assert(ed == d, s"dist mismatch for $id")) }
    // recall floor: the corpus is unclustered random noise (the same data
    // property PERF.md records for IVF), so 4-bit hyperplane LSH recall is
    // modest — but fully deterministic run to run. A collapse to zero
    // overlap would mean the bucketing or multi-probe broke.
    val recall = lsh.count { case (id, _) => exact.contains(id) }
    assert(recall >= 2, s"LSH recall collapsed: $recall/10 of exact top-k")
  }
}
