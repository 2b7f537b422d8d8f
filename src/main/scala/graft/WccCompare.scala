package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (like [[SccCompare]]): time GraphX connectedComponents against
  * the two-phase large-star/small-star DataFrame CC on the same edge
  * relation, and assert label parity (both emit the component's MIN vertex
  * id per node). Run on the ScaleProbe replica dirs for the 16×/64× rows.
  * Usage: runMain graft.WccCompare <dir> [parity]. */
object WccCompare {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val checkParity = args.length > 1 && args(1) == "parity"
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
      println(f"WCCCOMPARE $tag%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($dir)")
    }
    val edges = operators.BigGraphOps.sccEdges(spark, dir)
    time("graphx") {
      val g = graft.graph.GraphXBridge.fromLongEdgeDF(edges)
      noop(spark.createDataFrame(g.connectedComponents().vertices)
        .toDF("node", "wcc").orderBy("node"))
    }
    spark.catalog.clearCache()
    time("df") { noop(operators.BigGraphOps.ccTwoPhase(edges).orderBy("node")) }
    if (checkParity) {
      val g = graft.graph.GraphXBridge.fromLongEdgeDF(edges)
      val gx = spark.createDataFrame(g.connectedComponents().vertices)
        .toDF("node", "wcc")
      val df = operators.BigGraphOps.ccTwoPhase(edges)
      val diff = gx.except(df).count() + df.except(gx).count()
      println(s"WCCCOMPARE parity diff rows: $diff")
      require(diff == 0, "GraphX and two-phase CC disagree")
    }
    spark.stop()
  }
}
