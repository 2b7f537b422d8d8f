package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan and wall time of one or
  * more SparkEntry queries. `runMain graft.Explain <sfDir> <name> [name...]`
  * — the plan-iteration loop the build demands (explain, fix, re-explain).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Tables.scaledInitialPartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      // time construction separately: statement-style entries (the GQL
      // mutation gates) do their writes eagerly while BUILDING the frame,
      // so exec-only timing would hide their real cost
      val tb = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val buildS = (System.nanoTime() - tb) / 1e9
      println(s"===== $n =====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[time] $n build $buildS%.3f s + exec ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
