package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class HdrSketchSpec extends SparkSpec {

  import spark.implicits._

  private def sketch(xs: Seq[Double], parts: Int): Seq[(Long, Long)] = {
    HdrSketch.register(spark)
    xs.toDF("x").repartition(parts)
      .agg(expr("hdr_sketch(x)").as("sk"))
      .collect()(0).getSeq[Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
  }

  test("hdr_sketch: bucket edges — unit below 256, top-8-bit truncation above") {
    // v_fix = floor(x * 2^20); below 256 the edge IS v_fix
    assert(HdrSketch.bucketEdge(0.0) === 0L)
    assert(HdrSketch.bucketEdge(255.0 / 1048576.0) === 255L)
    // 256 = 2^8: first truncated magnitude, width 2 (msb 9, shift 1)
    assert(HdrSketch.bucketEdge(256.0 / 1048576.0) === 256L)
    assert(HdrSketch.bucketEdge(257.0 / 1048576.0) === 256L)
    assert(HdrSketch.bucketWidth(256L) === 2L)
    // hand value: 490.02 → v_fix = 513823211 (verified in DuckDB),
    // msb = 29, shift = 21, edge = (v >> 21) << 21
    val v = math.floor(490.02 * 1048576.0).toLong
    assert(v === 513823211L)
    val e = HdrSketch.bucketEdge(490.02)
    assert(e === (v >> 21) << 21)
    assert(HdrSketch.bucketWidth(e) === (1L << 21))
    // the relative-error contract: width/edge ≤ 2^-7 for every edge ≥ 256
    Seq(256L, 511L, 1L << 20, (1L << 40) + (1L << 33)).foreach { edge =>
      val w = HdrSketch.bucketWidth(edge)
      assert(w.toDouble / edge.toDouble <= 1.0 / 128.0 + 1e-15,
        s"edge=$edge width=$w")
    }
    // negative input raises (fail-loud domain contract)
    intercept[IllegalArgumentException](HdrSketch.bucketEdge(-0.5))
  }

  test("hdr_sketch: merge-order invariance — 1 partition == 32 partitions bit-for-bit") {
    val xs = (1 to 5000).map(i => 0.01 + (i % 977) * 0.501 + (i % 13) * 0.007)
    val one = sketch(xs, 1)
    val many = sketch(xs, 32)
    assert(one === many, "sketch must not depend on merge order")
    assert(one.map(_._2).sum === 5000L, "counts must be exact")
    // ~#magnitudes × 128 buckets, never #distinct-values entries
    assert(one.size < 1500, s"state blow-up: ${one.size} buckets")
  }

  test("hdr_sketch: nulls skipped; SQL edge replay (conv/shift) matches the JVM path") {
    HdrSketch.register(spark)
    val withNulls = Seq(Some(1.5), None, Some(300.25), None).toDF("x")
    val sk = withNulls.agg(expr("hdr_sketch(x)").as("sk"))
      .collect()(0).getSeq[Row](0)
    assert(sk.map(_.getLong(1)).sum === 2L)
    // the oracle-side SQL formula (length(conv)/shifts) must reproduce
    // bucketEdge exactly — this is what makes cross-engine parity possible
    val vals = Seq(0.01, 0.25, 255.9 / 1048576.0, 490.02, 123.456, 0.0001)
    val sqlEdges = vals.toDF("x")
      .withColumn("v", floor(col("x") * 1048576.0).cast("long"))
      .withColumn("edge", when(col("v") < 256, col("v"))
        .otherwise(expr("shiftleft(shiftright(v, length(conv(v, 10, 2)) - 8)," +
          " length(conv(v, 10, 2)) - 8)")))
      .select("edge").as[Long].collect()
    assert(sqlEdges.toSeq === vals.map(HdrSketch.bucketEdge))
  }

  test("quantileSketchWindow: bound holds on events-shaped data and est covers exact") {
    val rows = (1 to 400).map { i =>
      val day = 1 + (i % 10)
      (i.toLong, Timestamp.valueOf(f"2024-03-$day%02d 08:00:00"),
        0.01 + (i * 37 % 991) * 0.497)
    }
    val events = rows.toDF("event_id", "ts", "value")
    val out = graft.ops.EventOps.quantileSketchWindow(events).collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("within_bound")),
        s"bound violated on ${r.getString(0)}: $r")
      Seq("p50", "p95", "p99").foreach { p =>
        val est = r.getDouble(r.fieldIndex(s"${p}_est"))
        val ex = r.getDouble(r.fieldIndex(s"${p}_exact"))
        assert(est > ex && est <= ex * (1 + 1.0 / 128.0) + 1.0 / 1048576.0,
          s"$p est=$est exact=$ex")
      }
    }
  }
}
