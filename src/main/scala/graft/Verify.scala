package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names (dev iteration);
    // the driver always runs the full set
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // SF-scaled AQE fan-out (PERF.md: q_suffix_dup's sf10 curve) —
      // floor = cpus, so dev-SF dirs keep today's exact partitioning and
      // gate hashes; only large dirs (sf1+) raise the initial count.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Tables.scaledInitialPartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // q_mst's DuckDB oracle unrolls MST_ROUNDS Borůvka rounds (each with
    // MST_DOUBLE pointer doublings) — exact only while the co-purchase
    // vertex count ≤ 2^MST_ROUNDS. The Spark side converges at any scale,
    // so an undersized constant would otherwise surface as a confusing
    // hash mismatch. Make the bound violation explicit here, where the
    // oracle is about to be compared (the bench/ScaleProbe paths have no
    // oracle and must not pay or trip this check). Runs inside q_mst's own
    // try so a violation fails THAT gate loudly, never the whole dump.
    def mstOracleBoundCheck(): Unit = {
      import operators.BigGraphOps
      val e = BigGraphOps.coEdges(spark, sfDir)
      val v = e.select(org.apache.spark.sql.functions.col("src").as("n"))
        .unionByName(e.select(org.apache.spark.sql.functions.col("dst").as("n")))
        .distinct().count()
      require(v <= (1L << BigGraphOps.MST_ROUNDS),
        s"q_mst oracle bound violated: co-purchase graph has $v vertices > " +
        s"2^${BigGraphOps.MST_ROUNDS}; raise BigGraphOps.MST_ROUNDS / " +
        s"MST_DOUBLE (oracle unroll depth) to cover this SF")
    }
    // r17 (verdict #5): periodic cache drop. Query functions persist
    // bounded frames for their own multi-consumer stages; Bench drops them
    // per pass, but Verify ran all 252 gates in ONE session with no drop,
    // so sf1/sf10 sweeps accumulated every gate's MEMORY_AND_DISK blocks
    // (correct — spills — but unbounded dead weight). Clearing every
    // CLEAR_EVERY gates bounds the footprint to one window's frames while
    // keeping most cross-gate stage sharing (shared chains re-persist on
    // next use; values cannot change — persist is execution-transparent).
    val CLEAR_EVERY = 32
    var sinceClear = 0
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        if (name == "q_mst") mstOracleBoundCheck()
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      sinceClear += 1
      if (sinceClear >= CLEAR_EVERY) { spark.catalog.clearCache(); sinceClear = 0 }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
