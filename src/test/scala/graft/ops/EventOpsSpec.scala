package graft.ops

import org.apache.spark.sql.functions.{col, explode, expr}

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {

  private lazy val events = graft.Tables.events(spark, "/root/testdata/sf0.001")

  test("funnel stages are monotonically non-increasing") {
    val r = EventOps.funnel(events).collect()(0)
    val (s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s1 >= s2 && s2 >= s3, s"funnel not monotone: $s1 >= $s2 >= $s3")
    assert(s1 > 0, "no users entered the funnel — degenerate data")
  }

  test("funnel generalizes to N stages (4-stage run, monotone, prefix-consistent)") {
    import spark.implicits._
    // user 1 completes all 4 stages in order; user 2 stalls after stage 2;
    // user 3 does stage 2 BEFORE stage 1, so never advances past stage 1
    val ev = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), (1L, 40L, "d"),
      (2L, 10L, "a"), (2L, 20L, "b"),
      (3L, 20L, "a"), (3L, 10L, "b"))
      .toDF("user_id", "ts_ns", "event_type")
    val r = EventOps.funnel(ev, Seq("a", "b", "c", "d")).collect()(0)
    assert((0 until 4).map(r.getLong) == Seq(3L, 2L, 1L, 1L))
    // 3-stage prefix over the same data agrees with the 4-stage run's prefix
    val p = EventOps.funnel(ev, Seq("a", "b", "c")).collect()(0)
    assert((0 until 3).map(p.getLong) == Seq(3L, 2L, 1L))
  }

  test("zscore anomalies: an injected outlier is flagged, a tight cluster is not") {
    import spark.implicits._
    // type 'a': 40 values at ~10 plus one at 1000 (an extreme outlier);
    // type 'b': all identical except tiny jitter — nothing beyond 3 sigma
    val a = (1 to 40).map(i => ("a", 10.0 + (i % 3))) :+ (("a", 1000.0))
    val b = (1 to 20).map(i => ("b", 5.0 + (i % 2) * 0.01))
    val df = (a ++ b).toDF("event_type", "value")
    val rows = EventOps.zscoreAnomalies(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("a").getLong(2) == 1L, "exactly the injected outlier flags")
    assert(rows("a").getDouble(3) > 3.0)
    assert(rows("b").getLong(2) == 0L, "uniform-ish values must not flag")
  }

  test("inter-event gaps: per-user lag, exact interpolated percentiles in seconds") {
    import spark.implicits._
    // user 1, type 'a': 0s, 10s, 30s -> gaps [10s, 20s]; p50 = 15s,
    // p95 = 19.5s, max 20s. A second user contributes no cross-user gap.
    val ev = Seq(
      (1L, "a", 0L, 1L), (1L, "a", 10_000_000_000L, 2L),
      (1L, "a", 30_000_000_000L, 3L), (2L, "a", 5_000_000_000L, 4L))
      .toDF("user_id", "event_type", "ts_ns", "event_id")
    val r = EventOps.interEventGaps(ev).collect()(0)
    assert(r.getLong(1) == 2L, "two gaps, none across users")
    assert(r.getDouble(2) == 15.0)
    assert(r.getDouble(3) == 19.5)
    assert(r.getLong(4) == 20_000_000L, "max gap in truncated microseconds")
  }

  test("type trigrams: per-user order, no cross-user patterns, count-ranked") {
    import spark.implicits._
    // user 1: a b a b -> (a,b,a), (b,a,b); user 2: a b a -> (a,b,a)
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L), (1L, "b", 40L, 4L),
      (2L, "a", 10L, 5L), (2L, "b", 20L, 6L), (2L, "a", 30L, 7L))
      .toDF("user_id", "event_type", "ts_ns", "event_id")
    val rows = EventOps.typeTrigrams(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(rows == Map(("a", "b", "a") -> 2L, ("b", "a", "b") -> 1L))
  }

  test("MAD anomalies: robust to the outlier that corrupts mean/stddev") {
    import spark.implicits._
    // type 'a': [1,2,3,4,100] -> med 3, |dev| [2,1,0,1,97] -> MAD 1;
    // rz(100) = 0.6745*97 = 65.4265, everything else <= 1.349. The same
    // outlier inflates stddev to ~43, so a plain z-score would see
    // z(100) ~ 1.8 and MISS it — the case MAD exists for.
    val df = ((1 to 4).map(i => ("a", i.toDouble)) :+ (("a", 100.0))).toDF("event_type", "value")
    val r = EventOps.madAnomalies(df).collect()(0)
    assert(r.getLong(1) == 5L)
    assert(r.getLong(2) == 1L, "exactly the injected outlier flags")
    assert(math.abs(r.getDouble(3) - 65.4265) < 1e-9, s"max_rz ${r.getDouble(3)}")
    assert(r.getDouble(4) == 3.0 && r.getDouble(5) == 1.0, "median/MAD exact")
    // the classic z-score on the identical data misses it: proves the
    // robustness claim rather than asserting it
    val z = EventOps.zscoreAnomalies(df).collect()(0)
    assert(z.getLong(2) == 0L, "plain z-score is corrupted by its own outlier")
  }

  test("retention: day-0 row counts every user exactly once") {
    val rows = EventOps.retention(events).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nUsers = events.select("user_id").distinct().count()
    // every user is active on their own first day by construction
    assert(rows(0) == nUsers, s"day-0 users ${rows(0)} != distinct users $nUsers")
    assert(rows.keys.forall(_ >= 0), "negative day offset is impossible")
    assert(rows.values.forall(_ <= nUsers), "an offset cannot exceed the user population")
  }

  test("markov transitions: counts follow per-user order; rows normalize per source") {
    import spark.implicits._
    // user 1: a→b→a ; user 2: a→b — transitions a→b ×2, b→a ×1
    val df = Seq(
      (1L, 1L, "a", 100L), (1L, 2L, "b", 200L), (1L, 3L, "a", 300L),
      (2L, 4L, "a", 100L), (2L, 5L, "b", 200L))
      .toDF("user_id", "event_id", "event_type", "ts_ns")
    val rows = EventOps.markovTransitions(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set(("a", "b"), ("b", "a")),
      "u2's trailing b has no successor — no cross-user transition appears")
    assert(rows(("a", "b")) == ((2L, 1.0)), "a always transitions to b")
    assert(rows(("b", "a")) == ((1L, 1.0)), "the only b-sourced transition")
    // probabilities per source sum to 1 (within quantization)
    val bySrc = rows.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._2).sum)
    assert(bySrc.forall { case (_, p) => math.abs(p - 1.0) < 0.001 })
  }

  test("CMS: exact on a collision-free fixture, never undercounts on the real stream") {
    import spark.implicits._
    val ev = (Seq.fill(5)((1L, "a")) ++ Seq.fill(3)((2L, "b")) ++ Seq((3L, "c")))
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "event_type")
    val got = EventOps.cmsHeavyKeys(ev, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(x => x._1 -> x._2).toMap ==
      Map("1:a" -> 5L, "2:b" -> 3L, "3:c" -> 1L))
    // 3 keys in 1024 buckets: no row collides, so the min-estimate is exact
    assert(got.forall(x => x._3 == x._2), s"estimates drifted: ${got.toSeq}")
    // ordering contract: exact desc, key asc
    assert(got.map(_._1).toSeq == Seq("1:a", "2:b", "3:c"))
    // the real stream: the structural CMS guarantee (est >= exact, i.e.
    // overcount >= 0) must hold for every probed key
    val real = EventOps.cmsHeavyKeys(events).collect()
    assert(real.length == 20)
    real.foreach(r => assert(r.getLong(3) >= 0,
      s"undercount on ${r.getString(0)}"))
  }

  test("HLL: estimates land within theory bounds on every audited cardinality shape") {
    val got = EventOps.hllDistinct(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet ==
      Set("event_id", "event_type", "user_id", "user_type_pair"))
    // exact distincts are real counts (sf0.001 events: small but nonzero)
    got.values.foreach { case (exact, est, relErr) =>
      assert(exact > 0 && est > 0)
      // m=256 HLL standard error is ~6.5%; linear counting is tighter at
      // the low end — 25% is a >3-sigma envelope for every shape here
      assert(math.abs(relErr) < 0.25, s"rel_err $relErr for exact=$exact")
      // rel_err column is consistent with the two value columns
      val expected =
        math.floor((est / exact - 1) * 10000 + 0.5) / 10000
      assert(math.abs(relErr - expected) < 1e-9)
    }
    // the low-cardinality shape rides linear counting: near-exact
    val (typeExact, typeEst, _) = got("event_type")
    assert(math.abs(typeEst - typeExact) < 1.0,
      s"linear counting should be near-exact: $typeEst vs $typeExact")
  }

  test("Misra-Gries: completeness guarantee holds, summary bounded, output exact and merge-order-free") {
    import spark.implicits._
    graft.functions.MisraGries.register(spark)
    // zipf-ish stream: key i carries 200/i occurrences
    val stream = (1 to 40).flatMap(i => Seq.fill(200 / i)(i))
    val n = stream.length
    val counts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // raw summary across a real multi-partition merge tree
    val k = 8
    val summary = stream.map(i => s"$i:t").toDF("key").repartition(7)
      .agg(expr(s"misra_gries(key, $k)").as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.key")).as[String].collect().toSet
    assert(summary.size <= k, s"summary exceeded k: $summary")
    counts.filter(_._2 > n / (k + 1)).keys.foreach(i =>
      assert(summary.contains(s"$i:t"),
        s"guaranteed key $i missing (count ${counts(i)}, bound ${n / (k + 1)})"))
    // end-to-end operator: exact thresholded counts, identical under any
    // partitioning (the summary's lower bounds never reach the output)
    val ev = stream.zipWithIndex
      .map { case (u, i) => (i.toLong, u.toLong, "t") }
      .toDF("event_id", "user_id", "event_type")
    def run(p: Int) = EventOps.mgHeavyHitters(ev.repartition(p), k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val r1 = run(1)
    assert(r1 == run(32), "merge order reached the output")
    val expected = counts.toSeq.map { case (u, c) => (s"$u:t", c) }
      .filter { case (_, c) => c * 65 > n }
      .sortBy { case (kk, c) => (-c, kk) }
    assert(r1 == expected, s"got $r1\nwant $expected")
  }

  test("sketches are partition-invariant: CMS and HLL identical on 1 vs 32 partitions") {
    // both sketches are built from commutative-associative aggregates
    // (count per (row, bucket); max-ρ per register) — the distributed-
    // correctness property that lets them run on 1000 executors
    def cms(df: org.apache.spark.sql.DataFrame) =
      EventOps.cmsHeavyKeys(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    def hll(df: org.apache.spark.sql.DataFrame) =
      EventOps.hllDistinct(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(cms(events.repartition(1)) == cms(events.repartition(32)))
    assert(hll(events.repartition(1)) == hll(events.repartition(32)))
  }

  test("funnel time-to-convert: exact deltas, strictly-later rule, rank percentiles") {
    import spark.implicits._
    // u1 signs up at 10µs, purchases at 5µs (BEFORE — must not count)
    // and 30µs → dt 20µs; u2 signs up at 0, purchases at 100µs → dt 100;
    // u3 signs up, never purchases; u4 purchases, never signs up
    val ev = Seq(
      (1L, 10000L, "signup"), (1L, 5000L, "purchase"), (1L, 30000L, "purchase"),
      (2L, 0L, "signup"), (2L, 100000L, "purchase"),
      (3L, 50000L, "signup"),
      (4L, 60000L, "purchase"))
      .map { case (u, ns, t) => (u, ns, t, u * 10 + ns / 1000) }
      .toDF("user_id", "ts_ns", "event_type", "event_id")
    val r = EventOps.funnelTime(ev).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 3L && row.getLong(1) == 2L, row.toString)
    assert(row.getDouble(2) == 2.0 / 3.0, row.toString)
    // ranks over dts {20, 100}: p50 = rank ceil(1.0)=1 → 20, p90 = rank 2 → 100
    assert(row.getLong(3) == 20L && row.getLong(4) == 100L, row.toString)
    assert(row.getLong(5) == 20L && row.getLong(6) == 100L, row.toString)
  }

  test("forecast backtest: a perfectly period-7 series gives seasonal MAE 0 and skill 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, to_timestamp}
    // one event per day, value repeats with period 7 → seasonal-naive is
    // exact on every fold; naive errs whenever adjacent days differ
    val ev = (0 until 15).map { d =>
      (s"2024-01-${"%02d".format(d + 1)} 12:00:00", (d % 7 + 1).toDouble)
    }.toDF("s", "value")
      .withColumn("ts", to_timestamp(col("s")))
      .withColumn("event_type", expr("'a'"))
    val r = EventOps.forecastBacktest(ev).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 7L, s"folds: $row")
    assert(row.getDouble(2) == 0.0, s"seasonal MAE: $row")
    assert(row.getDouble(3) > 0.0 && row.getDouble(4) == 0.0, s"skill: $row")
  }

  test("cohort LTV triangle: exact cumulative value per user by first-seen week") {
    import spark.implicits._
    import org.apache.spark.sql.functions.to_timestamp
    val ev = Seq(
      (1L, "1970-01-01 00:00:00", 1.00), (1L, "1970-01-08 00:00:00", 2.00),
      (2L, "1970-01-02 00:00:00", 3.00),
      (3L, "1970-01-09 00:00:00", 5.00))
      .toDF("user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val got = EventOps.cohortLtv(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    // cohort week 0 = {u1, u2}: age 0 spends 4.00 → ltv 2.0; age 1 adds
    // 2.00 → cumulative 6.00 over 2 users = 3.0. cohort week 1 = {u3}.
    assert(got == Map(
      (0L, 0L) -> ((2L, 2L, 4.0, 2.0)),
      (0L, 1L) -> ((2L, 1L, 2.0, 3.0)),
      (1L, 0L) -> ((1L, 1L, 5.0, 5.0))), got.toString)
  }

  test("time-weighted average: long-held value dominates, plain mean does not") {
    import spark.implicits._
    // value 1.00 holds for 9µs, value 3.00 for 1µs, observation at 10µs
    // closes the span: twa = (100·9 + 300·1)/(100·10) = 1.2 exactly,
    // while the plain mean of observed STARTS is (1+3)/2 = 2.0
    val ev = Seq(
      (1L, 0L, "t", 1.00), (2L, 9000L, "t", 3.00), (3L, 10000L, "t", 9.99))
      .toDF("event_id", "ts_ns", "event_type", "value")
    val r = EventOps.timeWeightedAvg(ev).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 2L && row.getLong(2) == 10L, row.toString)
    assert(row.getDouble(3) == 1.2, s"twa: ${row.getDouble(3)}")
    assert(row.getDouble(4) == 2.0, s"mean: ${row.getDouble(4)}")
    assert(row.getDouble(5) == 1.2 - 2.0, s"bias: ${row.getDouble(5)}")
  }

  test("time-weighted average: simultaneous events get zero weight, singleton types drop") {
    import spark.implicits._
    val ev = Seq(
      // duplicate timestamp: event 1 spans 0µs into event 2, which holds 5µs
      (1L, 0L, "dup", 7.00), (2L, 0L, "dup", 2.00), (3L, 5000L, "dup", 9.99),
      // a type with one event has no interval — must not emit a row
      (4L, 0L, "solo", 5.00))
      .toDF("event_id", "ts_ns", "event_type", "value")
    val got = EventOps.timeWeightedAvg(ev).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got.keySet == Set("dup"), got.toString)
    assert(got("dup") == 2.0, s"dup twa: ${got("dup")}")
  }
}
