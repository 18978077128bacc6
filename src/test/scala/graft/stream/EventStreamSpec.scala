package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.EventOps

/** Streaming semantics are verified against the batch operators over the
  * same static events data (memory sink, processAllAvailable). Complete
  * output mode is used for windowed aggregations because a single static
  * micro-batch never advances the watermark enough to emit append-mode
  * results — the standard static-source testing pattern.
  */
class EventStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def runToTable(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  private lazy val batchEvents = graft.Tables.events(spark, sfDir)

  test("streaming tumbling window == batch tumbling aggregation") {
    val got = runToTable(
      EventStream.hourlyTumbling(EventStream.source(spark, sfDir)), "t_tumble", "complete")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = EventOps.hourlyTumbling(batchEvents)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("streaming session windows agree with batch sessionization totals") {
    val got = runToTable(
      EventStream.sessionWindows(EventStream.source(spark, sfDir)), "t_sess", "complete")
    val gotPerUser = got.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("session_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = EventOps.sessionize(batchEvents)
      .select("user_id", "n_sessions", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotPerUser == want)
  }

  test("streaming dedup-within-watermark preserves exact per-type counts") {
    val got = runToTable(
      EventStream.dedupEvents(EventStream.source(spark, sfDir)), "t_dedup", "complete")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = batchEvents.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("streaming content dedup drops payload-identical events like batch distinct") {
    val got = runToTable(
      EventStream.dedupByContent(EventStream.source(spark, sfDir)), "t_cdedup", "complete")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = batchEvents
      .withColumn("fp",
        md5(concat_ws("|", col("event_type"), col("value"), col("props"))))
      .dropDuplicates("fp")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("foreachBatch idempotent sink: replay overwrites partitions, no duplicates") {
    val out = java.nio.file.Files.createTempDirectory("gold_stream").toString
    def runOnce(cp: String): Unit = {
      val q = EventStream.idempotentHourlySink(EventStream.source(spark, sfDir), out, cp)
      q.processAllAvailable(); q.stop()
    }
    // two independent runs (fresh checkpoints) simulate a full replay of the
    // same source into the same sink path
    runOnce(java.nio.file.Files.createTempDirectory("cp1").toString)
    val afterFirst = spark.read.parquet(out).count()
    runOnce(java.nio.file.Files.createTempDirectory("cp2").toString)
    val afterReplay = spark.read.parquet(out).count()
    assert(afterFirst == batchEvents.count())
    assert(afterReplay == afterFirst, "replay must overwrite, not append")
  }

  test("flatMapGroupsWithState sessionizer closes all but the open session per user") {
    val closed = runToTable(
      EventStream.statefulSessionize(spark, EventStream.source(spark, sfDir)),
      "t_fmgws", "append")
    val batch = EventOps.sessionize(batchEvents)
    val totalSessions = batch.agg(sum("n_sessions")).collect()(0).getLong(0)
    val nUsers = batch.count()
    // one micro-batch: each user's final session stays open (NoTimeout)
    assert(closed.count() == totalSessions - nUsers)
  }
}
