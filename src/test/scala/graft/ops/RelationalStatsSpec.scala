package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Statistical-profiling operators in Relational: correlation matrix and
  * quantile binning (oracle covers the full-scale numbers; these pin the
  * algebraic anchor cases).
  */
class RelationalStatsSpec extends SparkSpec {

  test("q21 waiting suppliers: sole-late-in-multi-supplier semantics, row-count faithful") {
    import spark.implicits._
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // order 10: suppliers 1,2 — only 1 late (twice!) → supplier 1 counts 2
    //   (TPC-H counts l1 ROWS, not distinct orders)
    // order 20: single-supplier late → excluded (no second supplier)
    // order 30: two DIFFERENT suppliers late → excluded (not the sole one)
    // order 40: late but status 'O' → excluded
    val li = Seq(
      (10L, 1L, d("1995-06-01")), (10L, 1L, d("1995-07-01")),
      (10L, 2L, d("1995-01-05")),
      (20L, 3L, d("1995-06-01")),
      (30L, 4L, d("1995-06-01")), (30L, 5L, d("1995-06-01")),
      (40L, 6L, d("1995-06-01")), (40L, 7L, d("1995-01-05")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val orders = Seq(
      (10L, "F", d("1995-01-01")), (20L, "F", d("1995-01-01")),
      (30L, "F", d("1995-01-01")), (40L, "O", d("1995-01-01")))
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val supp = (1L to 7L).map(i => (i, s"SUPP_$i"))
      .toDF("s_suppkey", "s_name")
    val got = Relational.waitingSuppliers(li, orders, supp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "SUPP_1", 2L)), got.mkString(" "))
  }

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

  test("regression: exact linear data recovers slope/intercept with R2 = 1") {
    import spark.implicits._
    // nation A: price = 2*qty + 1 exactly; nation B: price = -3*qty + 100
    val li = ((1 to 20).map(i => (1L, i.toDouble, 2.0 * i + 1)) ++
      (1 to 20).map(i => (2L, i.toDouble, -3.0 * i + 100)))
      .toDF("l_suppkey", "l_quantity", "l_extendedprice")
    val supp = Seq((1L, 10L), (2L, 20L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((10L, "A"), (20L, "B")).toDF("n_nationkey", "n_name")
    val rows = Relational.regressionByNation(li, supp, nat).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows("A") == ((20L, 2.0, 1.0, 1.0)), s"got ${rows("A")}")
    assert(rows("B") == ((20L, -3.0, 100.0, 1.0)), s"got ${rows("B")}")
  }

  test("skyline: dominated points drop, frontier is strictly increasing in volume") {
    import spark.implicits._
    // per-part (price, qty): p1 (1.00, 5), p2 (2.00, 9), p3 (3.00, 7 —
    // dominated by p2), p4 (2.00, 4 — dominated by same-price p2),
    // p5 (4.00, 12), p6 (2.00, 9 — exact tie with p2: lower id represents)
    val li = Seq((1L, 5.0), (2L, 9.0), (3L, 7.0), (4L, 4.0), (5L, 12.0), (6L, 9.0))
      .toDF("l_partkey", "l_quantity")
    val part = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 2.0), (5L, 4.0), (6L, 2.0))
      .toDF("p_partkey", "p_retailprice")
    val rows = Relational.skylineFrontier(li, part).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1.0, 5.0, 1L), (2.0, 9.0, 2L), (4.0, 12.0, 5L)),
      s"got ${rows.toSeq}")
  }

  test("compaction bins: streaming cumsum binning opens a new bin at the target") {
    import spark.implicits._
    // months: 1992-01 x3, 1992-02 x2, 1992-03 x4 rows; target 5 →
    // bin 0 = {Jan (before 0), Feb (before 3)}, bin 1 = {Mar (before 5)}
    val orders = (Seq.fill(3)("1992-01-15") ++ Seq.fill(2)("1992-02-15") ++
      Seq.fill(4)("1992-03-15")).toDF("d")
      .select(to_date(col("d")).as("o_orderdate"))
    val rows = Relational.compactionBins(orders, 5L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(rows.toSeq == Seq(
      (0L, 2L, 5L, "1992-01", "1992-02"),
      (1L, 1L, 4L, "1992-03", "1992-03")), s"got ${rows.toSeq}")
  }

  test("delta agg merge: partial re-aggregation equals the full recompute exactly") {
    import spark.implicits._
    val orders = Seq(
      ("A", "1995-03-01", 10.25), ("A", "1995-06-01", 20.50),
      ("A", "1996-02-01", 30.00), ("B", "1995-01-01", 5.75),
      ("B", "1996-07-01", 4.25), ("C", "1996-01-01", 1.00))
      .toDF("o_orderpriority", "d", "o_totalprice")
      .select(col("o_orderpriority"), to_date(col("d")).as("o_orderdate"),
        col("o_totalprice"))
    val merged = Relational.deltaAggMerge(orders, "1996-01-01").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(merged.toSeq == Seq(
      ("A", 3L, 60.75), ("B", 2L, 10.0), ("C", 1L, 1.0)), s"got ${merged.toSeq}")
    // C exists ONLY in the delta side; A spans both — both merge correctly
  }

  test("hierarchy rollup: every ancestor's subtree sums its descendants exactly") {
    import spark.implicits._
    // leaves 4..7 under the parent = k >> 1 tree:
    //   1 -> {2 -> {4, 5}, 3 -> {6, 7}}; customer 5 has two orders
    val orders = Seq((4L, 100L, 10.00), (5L, 101L, 20.00), (5L, 102L, 1.50),
      (6L, 103L, 40.00), (7L, 104L, 80.25))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val rows = Relational.hierarchyRollup(orders, topLevels = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(rows(1L) == ((0, 4L, 5L, 151.75)), s"root ${rows(1L)}")
    assert(rows(2L) == ((1, 2L, 3L, 31.50)), s"left ${rows(2L)}")
    assert(rows(3L) == ((1, 2L, 2L, 120.25)), s"right ${rows(3L)}")
    assert(rows(4L) == ((2, 1L, 1L, 10.00)) && rows(5L) == ((2, 1L, 2L, 21.50)))
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("partition skew report: heavy keys counted against the true mean") {
    import spark.implicits._
    // keys: a x6, b x2, c x1 -> mean 3, ratio 2, one heavy key (6 > 4.5)
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c"))
      .toDF("user_id")
    val r = Relational.partitionSkew(df, "user_id").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 9L, s"keys/rows: $r")
    assert(r.getLong(2) == 1L && r.getLong(3) == 6L, s"min/max: $r")
    assert(r.getDouble(4) == 3.0 && r.getDouble(5) == 2.0, s"avg/ratio: $r")
    assert(r.getLong(6) == 1L, s"heavy keys: $r")
  }

  test("ignore-nulls windows carry the nearest non-null both ways; edges stay null") {
    import spark.implicits._
    val li = Seq(
      // supplier 1, ship order by date: null, 5.0, null, 7.0, null
      (1L, 10L, 1, "1995-01-01", "N", 1.0),
      (1L, 11L, 1, "1995-02-01", "R", 5.0),
      (1L, 12L, 1, "1995-03-01", "A", 2.0),
      (1L, 13L, 1, "1995-04-01", "R", 7.0),
      (1L, 14L, 1, "1995-05-01", "N", 3.0))
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "d", "l_returnflag",
        "l_extendedprice")
      .select(col("*"), to_timestamp(col("d")).as("l_shipdate"))
    val rows = Relational.windowIgnoreNulls(li, 5).collect()
      .map(r => (Option(r.get(5)), Option(r.get(6))))
    assert(rows.toSeq == Seq(
      (None, Some(5.0)), (Some(5.0), Some(5.0)), (Some(5.0), Some(7.0)),
      (Some(7.0), Some(7.0)), (Some(7.0), None)), s"got ${rows.toSeq}")
  }

  test("Lorenz deciles: hand-computed shares on a 10-customer fixture, cumulative reaches 1") {
    import spark.implicits._
    // customer i spends (11-i)*100 — one customer per decile, total 5500
    val o = (1 to 10).map(i => (i.toLong, (11 - i) * 100.0))
      .toDF("o_custkey", "o_totalprice")
    val got = Relational.lorenzDeciles(o).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == 10)
    def q4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    (1 to 10).foreach { d =>
      val (dec, n, rev, share, cum) = got(d - 1)
      assert(dec == d && n == 1L)
      assert(rev == (11 - d) * 100.0, s"decile $d revenue $rev")
      assert(share == q4((11 - d) / 55.0), s"decile $d share $share")
      assert(cum == q4((11 - d to 10).sum / 55.0), s"decile $d cum $cum")
    }
    assert(got.last._5 == 1.0, "cumulative share must reach exactly 1")
    // Lorenz property: shares non-increasing, cumulative non-decreasing
    assert(got.map(_._4).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("rendezvousShards: matches a driver-side HRW replication; minimal movement certified") {
    import spark.implicits._
    val n = 8
    val ids = (0L until 200L)
    val docs = ids.toDF("doc_id")
    def hrw(id: Long, shards: Int): Int =
      (0 until shards).maxBy(s =>
        (graft.functions.Md5Hash61.hash61(s"$id:$s".getBytes("UTF-8")), s))
    val before = ids.map(hrw(_, n))
    val after = ids.map(hrw(_, n + 1))
    val got = Relational.rendezvousShards(docs, "doc_id", n).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.size == n + 1)
    (0 to n).foreach { s =>
      val cb = before.count(_ == s).toLong
      val ca = after.count(_ == s).toLong
      val st = ids.indices.count(i => before(i) == s && after(i) == s).toLong
      assert(got(s) == ((cb, ca, st, cb - st, 0L)), s"shard $s: ${got(s)}")
    }
    // HRW guarantee: every move lands on the NEW shard, and old shards'
    // moved_out sums to exactly its population
    assert(got.values.forall(_._5 == 0L), "cross_moves must be 0")
    assert((0 until n).map(got(_)._4).sum == got(n)._2)
    assert(got(n)._1 == 0L && got(n)._3 == 0L)
  }

  test("q17 small-quantity revenue: integer 20%-of-average cut, exact cents sum / 7") {
    import spark.implicits._
    // part 1 (qualifying): qtys 1,10,10,10,10 → sum 41, n 5.
    //   cut: 5*qty*5 < 41 ⟺ qty < 1.64 → only the qty=1 line (price 7.00).
    // part 2 (qualifying): qtys 5,5 → 5*5*2=50 < 10 never → no lines.
    // part 3: wrong brand — filtered before any statistics.
    val li = Seq(
      (1L, 1.0, 7.0), (1L, 10.0, 99.0), (1L, 10.0, 99.0),
      (1L, 10.0, 99.0), (1L, 10.0, 99.0),
      (2L, 5.0, 50.0), (2L, 5.0, 50.0),
      (3L, 1.0, 1000.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq(
      (1L, "Brand#3", 1), (2L, "Brand#3", 4), (3L, "Brand#1", 1))
      .toDF("p_partkey", "p_brand", "p_size")
    val r = Relational.smallQuantityRevenue(li, part).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 1L, s"one small line, got ${r(0)}")
    assert(r(0).getDouble(0) == 700L.toDouble / 100.0 / 7.0, // = 1.0
      s"7.00 cents-exact / 7 years, got ${r(0).getDouble(0)}")
  }
}
