package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Contracts of the block-capped entity-match path: the default cap is
  * inert on testdata (gate hashes unchanged), a window that covers a
  * whole over-cap block reproduces the exact pair set, and a window
  * narrower than the block yields a subset with non-collapsed recall and
  * linear candidate volume by construction.
  */
class EntityMatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir // sf0.001: 150 customers, ~6/block

  private def pairs(df: org.apache.spark.sql.DataFrame): Map[(Int, Long, Long), Int] =
    df.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2)) -> r.getInt(3)).toMap

  test("default cap is inert: capped dataflow equals the plain within-block join") {
    val plain = pairs(DedupOps.entityMatchWith(Int.MaxValue, DedupOps.ER_W)(spark, dir))
    val gate = pairs(DedupOps.qEntityMatch(spark, dir))
    assert(gate == plain, "default-cap output must match the uncapped pair set")
    assert(gate.nonEmpty)
  }

  test("capped branch with a window covering the block reproduces the exact pairs") {
    // cap=3 forces EVERY block onto the sorted-neighborhood path; a
    // window as wide as the largest block (and the ER_PFX prefix being
    // constant at this id range) means the window sees every pair — the
    // capped dataflow must then agree with the exact join, proving the
    // two branches implement the same verify semantics
    val maxBlock = spark.read.parquet(s"$dir/customer.parquet")
      .groupBy("c_nationkey").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0).toInt
    val exact = pairs(DedupOps.qEntityMatch(spark, dir))
    val capped = pairs(DedupOps.entityMatchWith(3, maxBlock)(spark, dir))
    assert(capped == exact,
      s"full-window capped pairs diverge: ${capped.size} vs ${exact.size}")
  }

  test("narrow window yields a subset with usable recall") {
    val exact = pairs(DedupOps.qEntityMatch(spark, dir))
    val capped = pairs(DedupOps.entityMatchWith(3, 3)(spark, dir))
    capped.foreach { case (k, dist) =>
      assert(exact.contains(k), s"capped pair $k not in exact set")
      assert(exact(k) == dist, s"distance drifted for $k")
    }
    // W=3 on ~6-member blocks surfaces adjacent-in-key pairs only; the
    // two complementary passes must still retain a usable fraction
    assert(capped.size * 3 >= exact.size,
      s"capped recall collapsed: ${capped.size}/${exact.size}")
  }
}
