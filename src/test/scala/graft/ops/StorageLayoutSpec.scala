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
}
