package graft

import org.scalatest.funsuite.AnyFunSuite

/** Codegen-presence pin for the literal-heavy vector stages.
  *
  * The janino 64 KB per-method limit has silently degraded these plans to
  * interpreted mode twice (round-10 cellBucketed probe, round-11
  * q_pq_adc / q_ann_ivfpq): Spark logs `ERROR CodeGenerator` and falls back,
  * so nothing fails — the queries just run 2–4× slower. This spec turns that
  * silent fallback into a hard test failure by executing the affected
  * queries with BOTH fallback escapes closed:
  *
  *  - `spark.sql.codegen.fallback=false` — a whole-stage compile error
  *    (janino CompileException, e.g. "grows beyond 64 KB") rethrows instead
  *    of re-executing the child interpreted;
  *  - `spark.sql.codegen.factoryMode=CODEGEN_ONLY` — per-expression codegen
  *    (UnsafeProjection / MutableProjection / predicate) throws instead of
  *    swapping in the interpreted evaluator.
  *
  * If the 64 KB regression ever returns (an unrolled literal-matrix tree
  * instead of the HOF fold — see PERF.md), these queries throw and the
  * suite fails.
  */
class CodegenPinSpec extends AnyFunSuite {
  import SparkTestBase._

  private val pinned = Seq(
    "q_pq_adc",     // literal-codebook ADC scan
    "q_ann_ivfpq",  // IVF cell filter + PQ encode + ADC
    "q_cosine_blocked") // cellBucketed hyperplane sub-bucket pair scan

  private def withCodegenOnly[A](body: => A): A = {
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body
    finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(v =>
        conf.set("spark.sql.codegen.fallback", v))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
    }
  }

  test("vector literal-matrix stages compile under codegen-only (no 64 KB fallback)") {
    withCodegenOnly {
      for (q <- pinned) {
        val df = SparkEntry.queries(q)(spark, sfDir)
        // Full execution (not .count()): the encode/dot projections must
        // actually compile and run, not just plan.
        val n = df.collect().length
        assert(n > 0, s"$q returned no rows under codegen-only")
        // The HOF encode Project is CodegenFallback by design (higher-order
        // functions never enter WSCG) — the pin above is that its
        // UnsafeProjection still COMPILES. Additionally require at least one
        // whole-stage span (rendered as "*(n) " — AQE hides the final plan
        // from TreeNode.collect, so match the rendered string).
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains("*("),
          s"$q executed with no whole-stage codegen span:\n$p")
      }
    }
  }
}
