package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Throwaway measurement main for the r17 optimization round (deleted
  * before round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Tables.scaledInitialPartitions(d, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stageAgg = TrieMap.empty[String, (Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val name = sc.stageInfo.name.split(":").head
        val ms = sc.stageInfo.completionTime.getOrElse(0L) -
          sc.stageInfo.submissionTime.getOrElse(0L)
        val (c, t) = stageAgg.getOrElse(name, (0, 0L))
        stageAgg(name) = (c + 1, t + ms)
      }
    })
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    try noop(spark.read.parquet(s"$d/orders.parquet")) catch { case _: Throwable => }
    val t0 = System.nanoTime()
    noop(operators.BigGraphOps.qSccBig(spark, d))
    println(f"SCRATCH qSccBig wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
    stageAgg.toSeq.sortBy(-_._2._2).foreach { case (n, (c, t)) =>
      println(f"SCRATCH stage $n%-60s n=$c%4d  ${t / 1e3}%.2f s")
    }
    spark.stop()
  }
}
