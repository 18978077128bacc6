package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on lineitem part keys") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).as("approx"),
      countDistinct(col("l_partkey")).as("exact")).collect()(0)
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
  }
}
