package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order layout geometry: the property that makes the Morton key worth
  * sorting by is that every contiguous key range bounds EVERY interleaved
  * dimension, so parquet min/max stats prune multi-dimensional predicates.
  * These run the layout stats over the full 256x256 grid, where the
  * envelopes are exact, and compare skipping against a linear sort.
  */
class StorageLayoutSpec extends SparkSpec {

  // the complete grid: every (x, y) in [0,256)^2 exactly once
  private lazy val grid = spark.range(65536).select(
    (col("id") % 256).as("l_partkey"),
    (col("id") / lit(256)).cast("long").as("l_suppkey"))

  private lazy val stats = Relational.zOrderLayoutStats(grid).collect()

  test("every top-4-bit z-range is an exact 64x64 box over the full grid") {
    assert(stats.length == 16, s"expected 16 z-ranges, got ${stats.length}")
    stats.foreach { r =>
      assert(r.getAs[Long]("n") == 4096L, s"range ${r.get(0)}: n=${r.getAs[Long]("n")}")
      assert(r.getAs[Int]("x_span") == 63, s"range ${r.get(0)} x_span != 63")
      assert(r.getAs[Int]("y_span") == 63, s"range ${r.get(0)} y_span != 63")
    }
  }

  test("z-layout prunes 2-D and y-only predicates a linear x-sort cannot") {
    def overlaps(r: org.apache.spark.sql.Row,
                 xLo: Int, xHi: Int, yLo: Int, yHi: Int): Boolean =
      r.getAs[Int]("x_max") >= xLo && r.getAs[Int]("x_min") <= xHi &&
        r.getAs[Int]("y_max") >= yLo && r.getAs[Int]("y_min") <= yHi

    // a 32x32 predicate box: under z-order exactly one of 16 "files"
    // survives min/max pruning (the box sits inside one 64x64 cell)
    assert(stats.count(overlaps(_, 0, 31, 96, 127)) == 1)

    // y-only predicate: z-order still prunes to the 4 ranges whose y
    // envelope intersects [96,127]
    assert(stats.count(overlaps(_, 0, 255, 96, 127)) == 4)

    // the linear-x-sorted layout (16 equal files by x) has every file
    // spanning ALL of y - a y-only predicate prunes NOTHING (16/16 files
    // survive), which is the scan z-ordering exists to avoid
    val linear = grid
      .withColumn("file", (col("l_partkey") / 16).cast("int"))
      .groupBy("file")
      .agg(min("l_suppkey").as("y_min"), max("l_suppkey").as("y_max"))
      .collect()
    assert(linear.forall(r =>
      r.getAs[Long]("y_max") >= 96 && r.getAs[Long]("y_min") <= 127))
    assert(linear.length == 16)
  }

  test("hilbert index is a bijection and consecutive d are Manhattan-adjacent") {
    // curve-ness, not just cross-engine agreement: over the full 2^bits grid
    // the xy->d map must hit every d in [0, 4^bits) exactly once, and the
    // points at d and d+1 must be grid neighbors (|dx|+|dy| == 1) — the
    // defining Hilbert property that gives contiguous spatial boxes
    val pts = Relational.hilbertD(
      spark.range(4096).select(
        (col("id") % 64).cast("int").as("x"),
        (col("id") / lit(64)).cast("int").as("y")), bits = 6)
      .select(col("x"), col("y"), col("d"))
    assert(pts.select(countDistinct(col("d"))).head.getLong(0) == 4096L)
    assert(pts.agg(min(col("d")), max(col("d"))).head ==
      org.apache.spark.sql.Row(0, 4095))
    val nonAdjacent = pts.as("a")
      .join(pts.as("b"), col("a.d") + 1 === col("b.d"))
      .filter(abs(col("a.x") - col("b.x")) + abs(col("a.y") - col("b.y")) =!= 1)
      .count()
    assert(nonAdjacent == 0L)
  }

  test("hilbert ranges bound both dimensions like z-order, without seams") {
    val stats = Relational.hilbertLayoutStats(grid.select(
      col("l_partkey"), col("l_suppkey"))).collect()
    assert(stats.length == 16)
    stats.foreach { r =>
      assert(r.getAs[Long]("n") == 4096L)
      assert(r.getAs[Int]("x_span") == 63, s"range ${r.get(0)} x_span")
      assert(r.getAs[Int]("y_span") == 63, s"range ${r.get(0)} y_span")
    }
  }

  test("bloom skipping: no false negatives, exact truth counts, skip rate arithmetic") {
    import spark.implicits._
    // partkey 1 lives in buckets {1, 2}; partkey 2 in {3}; keys 3..20
    // appear nowhere — any candidate bucket for them is a false positive
    val li = Seq((1L, 1L), (65L, 1L), (2L, 1L), (3L, 2L), (3L, 2L), (7L, 999L))
      .toDF("l_orderkey", "l_partkey")
    val got = Relational.bloomSkipStats(li).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.size == 20)
    // exact truth: key 1 in buckets 1%64, 65%64=1, 2 → {1, 2}; key 2 in {3}
    assert(got(1L)._2 == 2L && got(2L)._2 == 1L)
    (3L to 20L).foreach(k => assert(got(k)._2 == 0L, s"key $k truth"))
    got.foreach { case (k, (cand, truth, fp, skip)) =>
      // the structural bloom guarantee: a true bucket is NEVER skipped
      assert(cand >= truth, s"false negative on key $k")
      assert(fp == cand - truth)
      val expSkip = math.floor((1.0 - cand.toDouble / 64) * 10000 + 0.5) / 10000
      assert(skip == expSkip, s"skip rate on key $k")
    }
    // 4 buckets x <=3 keys x 3 bits in 4096: collisions essentially
    // impossible, so the index is exact on this fixture
    assert(got.values.forall(v => v._3 == 0L), s"unexpected collisions: $got")
  }
}
