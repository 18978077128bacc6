package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Statistical-profiling operators in Relational: correlation matrix and
  * quantile binning (oracle covers the full-scale numbers; these pin the
  * algebraic anchor cases).
  */
class RelationalStatsSpec extends SparkSpec {

  test("corr matrix: perfect linear pairs hit exactly +/-1; all 6 pairs emitted") {
    import spark.implicits._
    // extendedprice = 2*quantity (r=1), discount = -quantity (r=-1),
    // tax alternates so no pair degenerates to a zero-variance NaN
    val li = (1 to 40).map(i =>
      (i.toDouble, 2.0 * i, -i.toDouble, (i % 3).toDouble))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val rows = Relational.corrMatrix(li).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rows.size == 6, "C(4,2) pairs")
    assert(rows(("l_quantity", "l_extendedprice")) == 1.0)
    assert(rows(("l_quantity", "l_discount")) == -1.0)
    assert(rows(("l_extendedprice", "l_discount")) == -1.0)
    assert(math.abs(rows(("l_quantity", "l_tax"))) < 0.2,
      "near-independent pair stays near zero")
  }

  test("top supplier per part: deterministic tiebreak, exact best share") {
    import spark.implicits._
    // part 1: supp 1 leads 60/100; part 2: 50/50 tie -> lower suppkey (1)
    // wins the deterministic tiebreak; part 3: supp 2 leads 30/40
    val li = Seq(
      (1L, 1L, 60.0), (1L, 2L, 40.0),
      (2L, 1L, 50.0), (2L, 2L, 50.0),
      (3L, 2L, 30.0), (3L, 1L, 10.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity")
    val supp = Seq((1L, "s1"), (2L, "s2")).toDF("s_suppkey", "s_name")
    val rows = Relational.topSupplierShare(li, supp).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows(1L) == ((2L, 0.6)), s"got ${rows(1L)}")
    assert(rows(2L) == ((1L, 0.75)), s"got ${rows(2L)}")
  }

  test("quantile bins: uniform 1..100 splits into 10 equal deciles with exact bounds") {
    import spark.implicits._
    val orders = (1 to 100).map(_.toDouble).toDF("o_totalprice")
    val rows = Relational.quantileBins(orders).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == 10L,
        s"bin ${r.getAs[Int]("bin")} holds ${r.getAs[Long]("n")}")
    }
    val byBin = rows.map(r => r.getAs[Int]("bin") -> r).toMap
    assert(byBin(1).getAs[Double]("min_price") == 1.0)
    assert(byBin(1).getAs[Double]("max_price") == 10.0)
    assert(byBin(10).getAs[Double]("min_price") == 91.0)
    assert(byBin(10).getAs[Double]("max_price") == 100.0)
  }
}
