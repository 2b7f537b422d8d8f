package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB co-located-join story, demonstrated for real: write orders
  * and lineitem bucketed by the join key, join them, and assert the plan
  * contains NO shuffle — bucketing pre-partitions both sides so the join
  * is executed in place (SURVEY §4 partitioning row; PERF.md posture). */
class BucketingSpec extends AnyFunSuite {
  import SparkTestBase._

  test("bucketed orders join lineitem plans without an exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val db = s"bucketdb_${System.nanoTime()}"
    spark.sql(s"CREATE DATABASE $db LOCATION '$wh/$db'")
    try {
      Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")

      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table(s"$db.lineitem_b")
          .join(spark.table(s"$db.orders_b"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("price"))
        val plan = joined.queryExecution.executedPlan.toString
        // the join itself must be exchange-free (bucket co-location);
        // only the final 25-key aggregate may shuffle
        val joinPart = plan.split("HashAggregate").last
        assert(joinPart.contains("SortMergeJoin") || joinPart.contains("ShuffledHashJoin"))
        assert(!joinPart.contains("Exchange"),
          s"join subtree still shuffles:\n$joinPart")
        assert(joined.count() > 0)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
