package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GeoMeanSpec extends SparkSpec {

  import spark.implicits._

  test("geomean: exact on a dyadic fixture; nulls and non-positives ignored") {
    GeoMean.register(spark)
    // 2 * 8 = 16, geomean = 4 exactly; null / 0 / negative rows must not count
    val df = Seq(("a", Some(2.0)), ("a", Some(8.0)), ("a", None),
      ("a", Some(0.0)), ("a", Some(-3.0)), ("b", Some(5.0)))
      .toDF("g", "x")
    val rows = df.groupBy(col("g")).agg(expr("geomean(x)").as("gm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows("a") - 4.0) < 1e-12, s"got ${rows("a")}")
    assert(math.abs(rows("b") - 5.0) < 1e-12)
    // an all-ignored group evaluates to null
    val nullRow = Seq(("c", 0.0)).toDF("g", "x")
      .groupBy(col("g")).agg(expr("geomean(x)").as("gm")).collect()(0)
    assert(nullRow.isNullAt(1), "all-ignored group must be null")
  }

  test("geomean: partial-aggregate merge across many partitions matches one partition") {
    GeoMean.register(spark)
    val xs = (1 to 1000).map(i => 1.0 + (i % 97) * 0.25)
    val one = xs.toDF("x").coalesce(1)
      .agg(expr("geomean(x)")).collect()(0).getDouble(0)
    val many = xs.toDF("x").repartition(32)
      .agg(expr("geomean(x)")).collect()(0).getDouble(0)
    // merge order differs, so allow ULP-scale drift only
    assert(math.abs(one - many) < 1e-9, s"one=$one many=$many")
    val want = math.exp(xs.map(math.log).sum / xs.size)
    assert(math.abs(one - want) < 1e-9)
  }

  test("geomean partial-aggregates map-side and stays inside whole-stage codegen") {
    GeoMean.register(spark)
    // static plan (AQE off): the adaptive wrapper prints pre-codegen trees
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try (1 to 100).map(_.toDouble).toDF("x").agg(expr("geomean(x)"))
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(plan.contains("partial_geomean"),
      s"no map-side partial aggregation:\n$plan")
    // the *(n) prefix is the WholeStageCodegen stage marker in plan prints
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(plan).isDefined,
      s"aggregate outside a codegen stage:\n$plan")
    assert(!plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate"),
      s"declarative aggregate fell out of HashAggregate:\n$plan")
  }
}
