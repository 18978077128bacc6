package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming variants of the event operators (SURVEY.md §2.10):
  * same logical aggregations as `graft.ops.EventOps`, expressed as
  * `readStream → watermark → window/session/dedup → sink`. Batch and stream
  * share semantics; EventStreamSpec drives each stream over the static events
  * parquet (memory sink) and checks the result against the batch operator.
  *
  * State is bounded by watermarks: late data beyond 1 hour is dropped, so at
  * production scale the state store holds one open window per (key, window)
  * instead of unbounded history.
  */
object EventStream {

  /** Schema of the events parquet (ts is timestamp[us]; read as LTZ under the
    * UTC session timezone every entrypoint sets).
    */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of event parquet files. The glob keeps
    * it pointed at the events table when the directory holds other tables.
    * Mirrors `Tables.events`: exposes `ts` plus the exact ns-epoch `ts_ns`.
    */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(EventsSchema)
      .option("pathGlobFilter", "events*.parquet")
      .parquet(dir)
      .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))

  /** Tumbling 1-hour counts with a 1-hour watermark (append-able, bounded
    * state). Mirrors EventOps.hourlyTumbling.
    */
  def hourlyTumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"), col("sum_value"))

  /** Native session windows (30-min gap) per user. Mirrors EventOps.sessionize
    * session boundaries.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("session_events"))
      .select(col("user_id"), col("session_events"))

  /** Streaming exact dedup bounded by the watermark. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Streaming CONTENT dedup (the streaming member of the dedup family):
    * records whose payload fingerprint (md5 over type+value+props) repeats
    * within the watermark horizon are dropped, regardless of event_id — the
    * bounded-state analogue of batch exact dedup. State holds one
    * fingerprint per distinct payload per watermark window, so memory is
    * bounded by the dedup horizon, not the stream length.
    */
  def dedupByContent(events: DataFrame): DataFrame =
    events
      .withColumn("fp",
        md5(concat_ws("|", col("event_type"), col("value"), col("props"))))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Stream-static enrichment: every streaming event picks up its user's
    * dimension row via a broadcast hash join — the lookup-table pattern
    * (user tier, product catalog, geo table) of every production stream.
    * STATELESS by construction: the static side is re-resolvable per
    * micro-batch, no watermark, no state store rows at all (the spec
    * asserts `stateOperators` stays empty) — unlike a stream-stream join
    * this costs nothing to keep running forever. At scale the dim
    * broadcasts once per batch; the stream never shuffles.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Stream-stream interval join: each view joined to the SAME user's clicks
    * within `windowMinutes` after it (attribution). Both sides carry
    * watermarks and the join condition bounds the click time relative to the
    * view time, so the state store retains each side only for the interval +
    * watermark horizon — the canonical bounded-state stream-stream join. At
    * scale both sides hash-partition on user_id; state is per-key and
    * expires as the watermark advances.
    */
  def viewClickAttribution(views: DataFrame, clicks: DataFrame,
                           windowMinutes: Int = 30): DataFrame =
    attributionJoin(views, clicks, windowMinutes, "inner")

  /** Left-outer variant of [[viewClickAttribution]]: a view with NO click in
    * its window emits exactly once with a null click_id, as soon as the
    * watermark proves no match can still arrive — the "unconverted views"
    * stream. Same bounded state; the outer row's emission is what the
    * watermark contract buys.
    */
  def viewClickAttributionOuter(views: DataFrame, clicks: DataFrame,
                                windowMinutes: Int = 30): DataFrame =
    attributionJoin(views, clicks, windowMinutes, "left_outer")

  private def attributionJoin(views: DataFrame, clicks: DataFrame,
                              windowMinutes: Int, joinType: String): DataFrame = {
    val v = views.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    v.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") > col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
      .select(col("user_id"), col("view_id"), col("click_id"))
  }

  /** Batch twin of [[viewClickAttribution]] (same plan shape minus state):
    * what the spec compares the streaming result against.
    */
  def viewClickAttributionBatch(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    v.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") > col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"))
  }

  /** G5-style idempotent streaming sink: every micro-batch writes its hourly
    * partitions with dynamic partition overwrite via `foreachBatch`, so a
    * replayed batch REPLACES its partitions instead of appending duplicates —
    * the streaming analogue of the reference's delete-then-append warehouse
    * load (`load_hicp_to_sql.py:54–62,91`).
    */
  /** The hour partition column every micro-batch is laid out by. */
  def withHourColumn(events: DataFrame): DataFrame =
    events.withColumn("hour",
      date_format(date_trunc("hour", col("ts")), "yyyyMMddHH"))

  /** One micro-batch's write: dynamic partition overwrite, so re-executing
    * the SAME batch (after a crash between this write and the checkpoint
    * commit) REPLACES its partitions byte-for-byte instead of appending a
    * second copy — the write-side half of the exactly-once contract
    * (factored out so the failure-injection spec can crash between the two
    * halves). `mode("append")` here would break it: see the deliberately-
    * failing spec variant.
    */
  def writeHourlyPartitions(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                            path: String): Unit =
    batch.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("hour")
      .mode("overwrite")
      .parquet(path)

  def idempotentHourlySink(events: DataFrame, path: String,
                           checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    withHourColumn(events)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        writeHourlyPartitions(batch, path)
      }
      .start()

  /** Custom sessionization state machine via flatMapGroupsWithState — the
    * arbitrary-stateful-processing escape hatch for semantics the built-in
    * session_window can't express. Emits one row per closed session; the
    * open session flushes (and its state row is REMOVED) on event-time
    * timeout, so the state store holds at most one row per currently-active
    * user — bounded by the gap + watermark horizon, not the stream length.
    * A user seen once and never again costs one state row until
    * `last event + gap` passes the watermark, then nothing.
    */
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(userId: Long, nEvents: Int, durationSec: Double)

  def statefulSessionize(spark: SparkSession, events: DataFrame,
                         gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L
    events
      // the watermark both bounds lateness and drives the timeout clock
      .withWatermark("ts", "1 hour")
      .selectExpr("user_id", "ts", "ts_ns div 1000 as ts_us")
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: the open
            // session can never be extended — emit it and EVICT the row
            val out = state.getOption
              .map(s => SessionOut(userId, s.n, (s.last - s.start) / 1e6))
              .iterator
            state.remove()
            out
          } else {
            // micro-batch arrives unordered: sort within the batch, then fold
            val times = rows.map(_._3).toSeq.sorted
            var open = state.getOption
            var closed = List.empty[SessionOut]
            for (t <- times) open match {
              case Some(cur) if t - cur.last <= gapUs =>
                open = Some(cur.copy(last = t, n = cur.n + 1))
              case Some(cur) =>
                closed ::= SessionOut(userId, cur.n, (cur.last - cur.start) / 1e6)
                open = Some(SessionState(t, t, 1))
              case None =>
                open = Some(SessionState(t, t, 1))
            }
            open.foreach { s =>
              state.update(s)
              // flush when the watermark passes the session gap; the engine
              // rejects timestamps at/behind the current watermark, so clamp
              state.setTimeoutTimestamp(
                math.max(s.last / 1000L + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
      .toDF("user_id", "n_events", "duration_sec")
  }

  /** Per-user lifetime milestone emitter on the NEW `transformWithState`
    * API (Spark 4's successor to `flatMapGroupsWithState`): whenever a
    * user's cumulative event count crosses a power of two, emit one row at
    * the crossing event's timestamp. The state is a single typed
    * `ValueState[Long]` per user — schema'd, TTL-able, RocksDB-backed —
    * so a 100 TB event history costs 8 bytes of state per user, and the
    * operator survives arbitrarily long streams without growth.
    *
    * REQUIRES the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — transformWithState does not
    * run on the default HDFS-backed store.
    *
    * Determinism contract (same as [[statefulSessionize]]): rows are
    * sorted by timestamp within each micro-batch, so the batch twin is a
    * per-user `row_number` ordered by time, filtered to powers of two.
    */
  def milestones(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .selectExpr("user_id", "ts_ns div 1000 as ts_us")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new MilestoneProcessor, TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "milestone", "ts_us")
  }

  /** STREAMING HyperLogLog — the streaming twin of
    * `EventOps.hllDistinct` (same md5-prefix hash, same m=256 register
    * map), maintained incrementally under `transformWithState`. The state
    * operator is keyed BY REGISTER (the top 8 hash bits, computed
    * map-side before the shuffle), so the whole distinct-count state is
    * 256 keys × one max-ρ value — independent of stream length AND of key
    * cardinality, with no hot-key state bottleneck (a billion distinct
    * keys still spread over the same 256 state rows). Each micro-batch
    * emits only the registers whose max GREW; because register max is
    * associative and commutative, the latest emission per register equals
    * the batch-computed sketch exactly — asserted by the spec, which also
    * recovers the cardinality estimate from the streamed registers.
    *
    * Input contract: a streaming DataFrame with one string `key` column
    * (the identifier whose distinct count is tracked). Requires the
    * RocksDB state store provider, like [[milestones]].
    */
  def hllRegisters(spark: SparkSession, keyed: DataFrame): DataFrame = {
    import spark.implicits._
    keyed
      .selectExpr("CAST(conv(substring(md5(concat('hll:', key)), 1, 8), " +
        "16, 10) AS BIGINT) AS h")
      .selectExpr("h div 16777216 AS reg",
        "CAST(CASE WHEN h % 16777216 = 0 THEN 25 " +
          "ELSE 25 - length(bin(h % 16777216)) END AS INT) AS rho")
      .as[(Long, Int)]
      .groupByKey(_._1)
      .transformWithState(new HllRegisterProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF("reg", "max_rho")
  }

  /** STREAMING histogram-quantile sketch — the streaming twin of
    * `EventOps.histQuantileWindow`'s daily sketch: per-unit-bucket exact
    * counts maintained incrementally under `transformWithState`, keyed BY
    * BUCKET (computed map-side), so the whole quantile state is
    * |buckets| rows (~600 for this value domain) — independent of stream
    * length, no hot-key bottleneck (a billion events still land on the
    * same bucket rows). Counts are associative/commutative adds, so the
    * latest emission per bucket equals the batch histogram exactly, and
    * any percentile is recoverable downstream by the same cumulative
    * walk the batch query does. Input contract: a streaming DataFrame
    * with one double `value` column. Requires the RocksDB state store
    * provider, like [[milestones]].
    */
  def histBuckets(spark: SparkSession, valued: DataFrame): DataFrame = {
    import spark.implicits._
    valued
      .selectExpr("CAST(floor(value) AS BIGINT) AS bkt")
      .as[Long]
      .groupByKey(identity)
      .transformWithState(new HistBucketProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF("bkt", "cnt")
  }

  /** STREAMING HDR-sketch quantiles — the streaming twin of
    * `EventOps.quantileSketchWindow`'s daily `hdr_sketch` aggregate, for
    * ARBITRARY-DOMAIN doubles where [[histBuckets]]' unit buckets assume a
    * bucketable integer domain: the log-linear bucket edge is computed
    * MAP-SIDE with the same pure-integer formula the batch aggregate and
    * the DuckDB oracle use (fixed-point 2^20, top-8-significant-bit
    * truncation via conv/shifts), then counts maintain incrementally under
    * `transformWithState` keyed BY EDGE — the whole quantile state is
    * ≤ ~10³ rows regardless of stream length or value cardinality, and
    * counts are associative/commutative adds, so the latest emission per
    * edge equals the batch sketch EXACTLY (the spec asserts bucket-map
    * equality and recovers p50/p95/p99 by the same cumulative walk).
    * Negative values raise in-plan (the batch twin's domain contract).
    * The processor IS [[HistBucketProcessor]] — same count algebra,
    * different key derivation. Requires the RocksDB state store provider.
    */
  def hdrBuckets(spark: SparkSession, valued: DataFrame): DataFrame = {
    import spark.implicits._
    valued
      .selectExpr("CASE WHEN value < 0.0 THEN CAST(raise_error(" +
        "'hdrBuckets: negative input (domain is non-negative reals)') " +
        "AS BIGINT) ELSE CAST(floor(value * 1048576.0) AS BIGINT) END AS v")
      .selectExpr("CASE WHEN v < 256 THEN v ELSE shiftleft(shiftright(v, " +
        "length(conv(v, 10, 2)) - 8), length(conv(v, 10, 2)) - 8) END AS edge")
      .as[Long]
      .groupByKey(identity)
      .transformWithState(new HistBucketProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF("edge", "cnt")
  }

  /** STREAMING count-min sketch — the streaming twin of
    * `EventOps.cmsHeavyKeys`' depth×width counter grid: each key fans out
    * map-side to its `depth` (row, bucket) cells with the SAME portable
    * md5-prefix bucket derivation the batch op and its oracle use, the
    * cell packs into one long (row·width + bucket), and counts maintain
    * incrementally under `transformWithState` keyed BY CELL — state is
    * ≤ depth·width rows (4096 here) regardless of stream length OR key
    * cardinality, and a billion occurrences of one hot key still land on
    * `depth` counter rows, not one state row per key. Cell counts are
    * associative/commutative adds, so the latest emission per cell equals
    * the batch sketch EXACTLY (bitwise — the spec asserts grid equality
    * and recovers a point estimate by the same min-over-rows read), which
    * means any downstream frequency question answerable from the batch
    * sketch is answerable from the stream with zero drift. The processor
    * IS [[HistBucketProcessor]] — same count algebra, different key
    * derivation. Input contract: one string `key` column. Requires the
    * RocksDB state store provider, like [[milestones]].
    */
  def cmsCells(spark: SparkSession, keyed: DataFrame, depth: Int = 4,
               width: Int = 1024): DataFrame = {
    import spark.implicits._
    keyed
      .selectExpr("key", s"explode(sequence(0, ${depth - 1})) AS r")
      .selectExpr("r", "CAST(conv(substring(md5(concat('cms', " +
        s"CAST(r AS STRING), ':', key)), 1, 8), 16, 10) AS BIGINT) % $width" +
        " AS bucket")
      .selectExpr(s"r * $width + bucket AS cell")
      .as[Long]
      .groupByKey(identity)
      .transformWithState(new HistBucketProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF("cell", "cnt")
  }

  /** STREAMING 1-D Kalman filter — the streaming twin of
    * `TimeSeriesOps.kalmanStates` (same local-level model, Q=0.25, R=1):
    * per series key, a `ValueState[(Long, Double, Double)]` holding
    * (n, level, variance) — O(1) state per series regardless of stream
    * length, which is the whole point of recursive filters in a streaming
    * stack (the batch op re-folds the history; this carries 24 bytes).
    * Each input row advances the recursion with the IDENTICAL left-to-right
    * IEEE sequence the batch fold and the DuckDB oracle use, so the
    * streamed (level, gain) match the batch twin BITWISE — asserted by the
    * spec, not approximated. Input contract: a streaming DataFrame with
    * (g string, t long, x double) where `t` is the 1-BASED OBSERVATION
    * INDEX, contiguous per series ACROSS batches — stricter than the batch
    * twin (which sorts arbitrary t retroactively) because a stream cannot
    * re-sort history: each event must satisfy t == n+1 against the stored
    * count or the processor raises (fail-loud, matching the batch twin's
    * raise_error length guard), never silently corrupts the recursion.
    * Rows are sorted by t within each micro-batch (the [[milestones]]
    * determinism contract), and emission is one row per input observation.
    * Requires the RocksDB state store provider, like [[milestones]].
    */
  def kalmanLevels(spark: SparkSession, series: DataFrame): DataFrame = {
    import spark.implicits._
    series
      .selectExpr("g", "t", "x")
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new KalmanProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF("g", "t", "l", "k")
  }

  /** STREAMING per-user touch-set + conversion state — the streaming twin
    * of [[graft.ops.EventOps.shapleyAttribution]]'s user-collapse stage
    * (the only data-sized part of that query; the 16-cell lattice and the
    * 24-scaled Shapley combination are metadata-sized and recomputed from
    * the emitted states at read time): per user, a `ValueState[(Int,
    * Int)]` holding (touch bitmask, converted) — 8 bytes per user
    * regardless of stream length. A row (user, mask, conv) is emitted
    * whenever the state CHANGES (first sight included, idempotent on
    * repeated touches), so the latest emission per user IS the batch
    * collapse of everything seen so far and the downstream conv-by-mask
    * histogram can be maintained incrementally from emissions alone. The
    * spec folds the emissions into the exact-integer Shapley lattice and
    * asserts equality with the batch query on the same events — and that
    * state rows == distinct users. Requires the RocksDB provider, like
    * [[milestones]].
    */
  def touchStates(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.selectExpr("user_id", "event_type")
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TouchProcessor, TimeMode.None(),
        OutputMode.Append())
      .toDF("user_id", "mask", "conv")
  }

  /** BATCH twin of [[touchStates]] for the driver's oracle gate (r15
    * verdict item 5): the per-user (mask, conv) collapse — exactly the
    * latest emission per user after the stream drains, which
    * EventStreamSpec pins — rolled into the (mask, conv) → user-count
    * histogram the stream maintains incrementally from emissions. One
    * shuffle on user_id with map-side combine (bit_or and max are both
    * partial-aggregable), then a metadata-sized 32-cell rollup.
    */
  def touchCensus(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        expr("""CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                | WHEN 'signup' THEN 4 WHEN 'error' THEN 8 ELSE 0
                |END""".stripMargin).as("bit"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("p"))
      .groupBy(col("user_id"))
      .agg(bit_or(col("bit")).as("mask"), max(col("p")).as("conv"))
      .groupBy(col("mask"), col("conv"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("mask"), col("conv"))

  /** STREAMING Misra–Gries heavy-hitter summary — the streaming twin of
    * the batch `misra_gries(key, k)` aggregate
    * ([[graft.functions.MisraGries]]): a GLOBAL ≤ k-entry
    * (key, lower-bound) candidate summary maintained across micro-batches.
    * Two-level, like the batch plan's partial/final split: each input
    * partition runs the classic MG update stream-side in `mapPartitions`
    * (bounded k-entry scratch map, NO state store), so only ≤ k·partitions
    * summary rows — never raw events — cross the shuffle to the single
    * merge group, whose `transformWithState` MapState applies the Agarwal
    * et al. mergeable-summaries rule (add counts; if over k, subtract the
    * (k+1)-th largest and keep strict positives). Both levels preserve the
    * deficit invariant, so after ANY number of batches:
    *
    *     true_count(key) − n/(k+1)  ≤  reported(key)  ≤  true_count(key)
    *
    * with n = total events so far — every key with true frequency
    * > n/(k+1) is guaranteed PRESENT (the candidate-completeness property
    * the batch op's callers rely on; exact counts come from a follow-up
    * keyed join, same as batch). Counter VALUES are merge-order-dependent
    * lower bounds, so the spec asserts the invariant and the candidate
    * guarantee, not bitwise equality. State is one MapState of ≤ k
    * entries — independent of stream length AND key cardinality. Emits the
    * full summary each batch, (lb desc, key)-sorted. Input contract: one
    * string `key` column. Requires the RocksDB state store provider, like
    * [[milestones]].
    */
  def mgSummary(spark: SparkSession, keyed: DataFrame, k: Int = 8): DataFrame = {
    import spark.implicits._
    val kk = k
    keyed
      .selectExpr("key").as[String]
      .mapPartitions { it =>
        // classic MG over the partition's slice: hit → +1; room → insert;
        // full → decrement-all (each such step burns k+1 stream items)
        val buf = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { key =>
          buf.get(key) match {
            case Some(c) => buf.update(key, c + 1)
            case None if buf.size < kk => buf.update(key, 1L)
            case None =>
              val dead = scala.collection.mutable.ArrayBuffer.empty[String]
              buf.keysIterator.foreach { x =>
                val c = buf(x) - 1
                if (c == 0L) dead += x else buf.update(x, c)
              }
              dead.foreach(buf.remove)
          }
        }
        buf.iterator
      }
      .groupByKey(_ => 0)
      .transformWithState(new MgMergeProcessor(kk), TimeMode.None(),
        OutputMode.Append())
      .toDF("key", "lb")
  }
}

/** [[EventStream.kalmanLevels]]'s processor: (n, level, variance) per
  * series; replays `TimeSeriesOps.kalmanStates`' recursion per event. */
/** [[EventStream.touchStates]]'s processor: 8 bytes of (mask, conv) per
  * user; emits only on change, so replayed touches are absorbed silently
  * (idempotent) and the emission stream stays change-sized. */
class TouchProcessor
    extends StatefulProcessor[Long, (Long, String), (Long, Int, Int)] {
  @transient private var st: ValueState[(Int, Int)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Int, Int)]("touch",
      org.apache.spark.sql.Encoders.product[(Int, Int)], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, Int, Int)] = {
    val existed = st.exists()
    val (m0, c0) = if (existed) st.get() else (0, 0)
    var m = m0
    var c = c0
    rows.foreach { case (_, t) =>
      m |= (t match {
        case "view" => 1; case "click" => 2
        case "signup" => 4; case "error" => 8; case _ => 0
      })
      if (t == "purchase") c = 1
    }
    if (m != m0 || c != c0 || !existed) {
      st.update((m, c))
      Iterator.single((key, m, c))
    } else Iterator.empty
  }
}

class KalmanProcessor
    extends StatefulProcessor[String, (String, Long, Double),
      (String, Long, Double, Double)] {
  @transient private var st: ValueState[(Long, Double, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Double, Double)]("kalman",
      org.apache.spark.sql.Encoders.product[(Long, Double, Double)],
      TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Double)],
      timerValues: TimerValues): Iterator[(String, Long, Double, Double)] = {
    var (n, l, p) = if (st.exists()) st.get() else (0L, 0.0, 0.0)
    val out = scala.collection.mutable.ListBuffer
      .empty[(String, Long, Double, Double)]
    rows.toSeq.sortBy(_._2).foreach { case (_, t, x) =>
      // fail-loud ordering contract ACROSS batches, matching the batch
      // twin's raise_error length guard: sorting only fixes intra-batch
      // order; an already-consumed index arriving in a later batch would
      // silently corrupt the recursion instead
      if (t != n + 1)
        throw new IllegalStateException(
          s"kalmanLevels: out-of-order index for series '$key': got t=$t, " +
            s"expected ${n + 1} (indices must arrive 1,2,3,… across batches)")
      n += 1
      if (n == 1L) { l = x; p = 1.0; out += ((key, t, l, 0.0)) }
      else {
        // bitwise-identical operand order to the batch fold / oracle CTE
        val pp = p + 0.25
        val k = pp / (pp + 1.0)
        l = l + k * (x - l)
        p = (1.0 - k) * pp
        out += ((key, t, l, k))
      }
    }
    st.update((n, l, p))
    out.iterator
  }
}

/** [[EventStream.histBuckets]]'s processor: one ValueState[Long] running
  * count per bucket; emits the updated count each batch the bucket is hit. */
class HistBucketProcessor
    extends StatefulProcessor[Long, Long, (Long, Long)] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Long],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val cur = if (count.exists()) count.get() else 0L
    val c = cur + rows.size
    count.update(c)
    Iterator.single((key, c))
  }
}

/** [[EventStream.hllRegisters]]'s processor: one ValueState[Int] max-ρ per
  * register; emits a row only when the register grows. */
class HllRegisterProcessor
    extends StatefulProcessor[Long, (Long, Int), (Long, Int)] {
  @transient private var maxRho: ValueState[Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    maxRho = getHandle.getValueState[Int]("maxRho",
      org.apache.spark.sql.Encoders.scalaInt, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Int)],
      timerValues: TimerValues): Iterator[(Long, Int)] = {
    val cur = if (maxRho.exists()) maxRho.get() else 0
    val m = rows.foldLeft(cur)((a, r) => math.max(a, r._2))
    if (m > cur) { maxRho.update(m); Iterator.single((key, m)) }
    else Iterator.empty
  }
}

/** [[EventStream.mgSummary]]'s merge processor: a MapState holding the
  * global ≤ k-entry summary; each batch folds the partition summaries in
  * with the Agarwal et al. merge rule and emits the merged summary. */
class MgMergeProcessor(k: Int)
    extends StatefulProcessor[Int, (String, Long), (String, Long)] {
  @transient private var st: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getMapState[String, Long]("mg",
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    st.iterator().foreach { case (kk, v) => m.update(kk, v) }
    rows.foreach { case (kk, c) => m.update(kk, m.getOrElse(kk, 0L) + c) }
    if (m.size > k) {
      // subtract the (k+1)-th largest count, keep strict positives — the
      // deficit-preserving merge (same rule as MisraGries.merge)
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      m.keysIterator.foreach { kk =>
        val c = m(kk) - cut
        if (c <= 0L) dead += kk else m.update(kk, c)
      }
      dead.foreach(m.remove)
    }
    // rewrite the state map to exactly the merged summary
    st.keys().toArray.foreach { kk => if (!m.contains(kk)) st.removeKey(kk) }
    m.foreach { case (kk, c) => st.updateValue(kk, c) }
    m.toArray.sortBy { case (kk, c) => (-c, kk) }.iterator
  }
}

/** [[EventStream.milestones]]'s processor: one ValueState[Long] per user. */
class MilestoneProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var c = if (count.exists()) count.get() else 0L
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    rows.toSeq.sortBy(_._2).foreach { case (_, ts) =>
      c += 1
      if ((c & (c - 1)) == 0L) out += ((key, c, ts))
    }
    count.update(c)
    out.iterator
  }
}
