package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkSpec

/** The co-located join pattern for repeated fact-fact joins at scale: both
  * sides written bucketed on the join key join WITHOUT any shuffle exchange.
  * This is the engine's answer to "is this join's shuffle avoidable?" —
  * verified here by inspecting the physical plan.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact tables join with zero shuffle exchanges") {
    // tables land in the default ./spark-warehouse (warehouse.dir is a
    // static conf); dropped below and gitignored
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    // disable broadcast so the join strategy must be sort-merge — the case
    // bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == li.count())

      val planned = joined.queryExecution.executedPlan
      val finalPlan = planned match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shufflesBeforeAgg = finalPlan.collect { case e: ShuffleExchangeLike => e }
      // the ONLY allowed exchange is the final single-column aggregation;
      // the join itself must consume bucket-partitioned scans directly
      assert(shufflesBeforeAgg.length <= 1,
        s"expected bucketed join to avoid join-side shuffles, got:\n$finalPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
