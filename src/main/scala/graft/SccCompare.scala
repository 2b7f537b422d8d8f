package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (like [[Explain]]): time the GraphX Pregel SCC gate against
  * the DataFrame-superstep coloring SCC on the same edge relation — the
  * measured comparison the r10 verdict asked for before (not) retiring
  * the repo's one RDD-path gate. Usage: runMain graft.SccCompare <dir>. */
object SccCompare {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(spark.read.parquet(s"$dir/orders.parquet"))
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCCCOMPARE $tag%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($dir)")
    }
    time("graphx") { noop(operators.BigGraphOps.qSccBig(spark, dir)) }
    spark.catalog.clearCache()
    time("df") {
      noop(operators.BigGraphOps.dfScc(operators.BigGraphOps.sccEdges(spark, dir))
        .orderBy("node"))
    }
    spark.stop()
  }
}
