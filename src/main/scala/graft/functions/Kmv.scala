package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch — the brief's "novel
  * sketch" slot. Classic bottom-k estimator (Bar-Yossef et al. 2002;
  * the same family as DataSketches' Theta sketch): keep the K smallest
  * distinct hash values of a stream; if the K-th smallest of D uniform
  * 32-bit hashes is h, then h/2^32 ≈ K/D and the unbiased estimate is
  * D ≈ (K-1)·2^32/h.
  *
  * Unlike Spark's `approx_count_distinct` (HyperLogLog++, whose register
  * layout has no DuckDB twin), KMV over [[Fns.hash32]] is fully
  * DETERMINISTIC and cross-engine reproducible: the K smallest values of
  * a fixed set do not depend on partitioning, merge order, or engine —
  * so the sketch is hash-compare gateable like any exact query.
  *
  * Scale: the aggregation buffer is ≤K longs regardless of input size,
  * partial-aggregates map-side (each partition contributes its own ≤K
  * minima), and the merge is a K-way bounded merge — the shuffle carries
  * K longs per (partition × group), the HLL posture at 1/4 the footprint.
  */
object Kmv {
  /** Sketch size. K=8 keeps the sketch defined on the smallest test SF
    * (15 distinct users/type at sf0.001); production would use 256+. */
  val K = 8

  /** 2^32 as an exact double — hash32 values are uniform in [0, 2^32). */
  val HASH_SPACE = 4294967296.0

  /** The estimate's constant numerator (K-1)·2^32, exact in double. */
  val EST_NUM: Double = (K - 1).toDouble * HASH_SPACE

  /** Shared bottom-K buffer insert: keeps the ≤K smallest distinct hashes
    * in ascending order. Partition-order independent by construction (the
    * K smallest of a fixed set are the K smallest regardless of arrival
    * or merge order), which is what makes both aggregators gateable. */
  private def insert(b: Array[Long], h: Long): Array[Long] =
    if (b.length >= K && h >= b(b.length - 1)) b
    else if (b.contains(h)) b // defensive: inputs are pre-distinct
    else {
      val m = (b :+ h).sorted
      if (m.length > K) m.take(K) else m
    }

  /** Bounded bottom-K aggregator over (assumed-distinct) hash values.
    * Returns the K-th smallest hash, or null when the group has fewer
    * than K distinct hashes (the sketch is undefined there — callers
    * filter, matching the oracle's `WHERE rn = K`). */
  class KthMinAgg extends Aggregator[Long, Array[Long], Option[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = b.foldLeft(a)(insert)
    def finish(b: Array[Long]): Option[Long] =
      if (b.length < K) None else Some(b(K - 1))
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Option[Long]] = ExpressionEncoder[Option[Long]]()
  }

  /** Bottom-K aggregator that keeps the WHOLE sketch (the ≤K smallest
    * hashes, ascending) instead of just the K-th value — the theta-sketch
    * form that supports set algebra: union/intersect two sketches, clip at
    * θ = min(θ_A, θ_B), and estimate overlap from the surviving sample
    * (Bar-Yossef et al. 2002 §4; Dasgupta et al., "Theta sketch framework",
    * 2016). Same bounded buffer and merge posture as [[KthMinAgg]]. */
  class BottomKAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = b.foldLeft(a)(insert)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}
