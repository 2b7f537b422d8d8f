package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SketchOps

/** Pins the 100 TB swap SURVEY §2.5 names for cardinality work:
  * `approx_count_distinct` (HyperLogLog++) against the exact distinct
  * count AND against the gated KMV estimate (q_kmv_distinct), on the same
  * (user, day)-per-event-type workload at sf0.1.
  *
  * HLL's rsd parameter is a *standard deviation*, not a hard bound, so the
  * assertion allows 4×rsd relative error — far beyond plausible estimator
  * noise, tight enough that a broken sketch (or a Spark upgrade changing
  * HLL behavior) fails here instead of at 100 TB. KMV's analogous figure
  * is ~1/√(K−2); with the gate's tiny K=8 that is ~40% — the spec asserts
  * that looser bound for it, which is exactly the trade the two sketches
  * embody (see PERF.md: HLL for mergeable fixed-size production counting,
  * KMV for oracle-gateable determinism and sketch set algebra).
  */
class ApproxCountDistinctSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private val dir = "/root/testdata/sf0.1"
  private val RSD = 0.02

  test("approx_count_distinct tracks exact within 4x rsd; KMV within its K-bound") {
    val day = floor(unix_micros(col("ts")) / lit(SketchOps.DAY_US)).cast("string")
    val keyed = Tables.events(spark, dir)
      .select(col("event_type"),
        concat(col("user_id").cast("string"), lit("_"), day).as("key"))

    val exact = keyed.distinct()
      .groupBy("event_type").agg(count(lit(1)).as("exact"))
    val approx = keyed
      .groupBy("event_type").agg(approx_count_distinct(col("key"), RSD).as("approx"))
    val rows = exact.join(approx, "event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "no event types at sf0.1")

    for ((typ, ex, ap) <- rows) {
      val rel = math.abs(ap - ex).toDouble / ex
      assert(rel <= 4 * RSD,
        s"$typ: approx_count_distinct $ap vs exact $ex — rel err $rel > ${4 * RSD}")
      info(f"$typ: exact=$ex hll=$ap rel=${rel}%.4f (bound ${4 * RSD})")
    }

    // the gated KMV estimate on the identical workload: same grain, same
    // hash input (q_kmv_distinct), so its n_distinct_hashes ≈ exact and
    // its estimate must sit inside the bottom-K error envelope
    val kmvBound = 4.0 / math.sqrt(graft.functions.Kmv.K - 2)
    val kmv = SketchOps.qKmvDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exByType = rows.map(t => t._1 -> t._2).toMap
    for ((typ, nHash, est) <- kmv) {
      val ex = exByType(typ)
      assert(math.abs(nHash - ex) <= math.max(1L, ex / 1000),
        s"$typ: KMV distinct-hash count $nHash far from exact $ex — hash-collision burst?")
      val rel = math.abs(est - ex) / ex
      assert(rel <= kmvBound,
        s"$typ: KMV estimate $est vs exact $ex — rel err $rel > $kmvBound (K=${graft.functions.Kmv.K})")
      info(f"$typ: exact=$ex kmv=$est%.0f rel=${rel}%.4f (bound $kmvBound%.3f)")
    }
  }

  test("q_hll_distinct matches a from-scratch register mirror and its error bound") {
    // independent path: collect the distinct (event_type, hash32) pairs and
    // run classic HLL in plain Scala Maps — registers, dyadic sum, and the
    // correction branches recomputed with no shared code — then the gate
    // must agree exactly on v_zero and on the estimate to its 4-dp round
    val day = floor(unix_micros(col("ts")) / lit(SketchOps.DAY_US)).cast("string")
    val hs = Tables.events(spark, dir)
      .select(col("event_type"),
        graft.functions.Fns.hash32(
          concat(col("user_id").cast("string"), lit("_"), day)).as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val m = SketchOps.HLL_M
    val mirror = hs.groupBy(_._1).map { case (typ, rows) =>
      val regs = scala.collection.mutable.Map.empty[Long, Int]
      rows.foreach { case (_, h) =>
        val bucket = h >> SketchOps.HLL_BITS
        val w = h & ((1L << SketchOps.HLL_BITS) - 1)
        val r = SketchOps.HLL_BITS + 1 -
          (if (w == 0) 0 else java.lang.Long.toBinaryString(w).length)
        regs(bucket) = math.max(regs.getOrElse(bucket, 0), r)
      }
      val v = m - regs.size
      val sum = regs.values.map(r => 1.0 / (1L << r)).sum + v.toDouble
      val eRaw = SketchOps.HLL_ALPHA_M2 / sum
      val est =
        if (eRaw <= SketchOps.HLL_SMALL && v > 0) m * math.log(m.toDouble / v)
        else if (eRaw > SketchOps.HLL_LARGE)
          -graft.functions.Kmv.HASH_SPACE * math.log(1.0 - eRaw / graft.functions.Kmv.HASH_SPACE)
        else eRaw
      typ -> (rows.length.toLong, v.toLong, est)
    }
    val got = SketchOps.qHllDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == mirror.keySet)
    for ((typ, nHash, vZero, est) <- got) {
      val (mN, mV, mEst) = mirror(typ)
      assert(nHash == mN, s"$typ: distinct-hash count $nHash vs mirror $mN")
      assert(vZero == mV, s"$typ: zero registers $vZero vs mirror $mV")
      assert(math.abs(est - mEst) < 5e-5 + 1e-9 * math.abs(mEst),
        s"$typ: estimate $est vs mirror $mEst")
      // estimator quality: 4× the 1.04/√m standard error
      val rel = math.abs(est - nHash) / nHash
      assert(rel <= 4 * 1.04 / math.sqrt(m.toDouble),
        s"$typ: HLL estimate $est vs exact-ish $nHash — rel err $rel")
      info(f"$typ: exact=$nHash hll=$est%.1f v=$vZero rel=$rel%.4f")
    }
  }
}
