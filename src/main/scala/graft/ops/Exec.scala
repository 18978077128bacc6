package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lit,
  row_number, spark_partition_id, sum}

/** Execution-shape helpers shared by the operator families. */
object Exec {

  /** Broadcast `df` only when its row count is at most `maxRows`; otherwise
    * return it unhinted and let AQE pick the join strategy from runtime
    * shuffle stats. An UNCONDITIONAL broadcast hint on a data-dependent
    * candidate set is a scale hazard: a boilerplate-heavy corpus (every doc
    * landing in one LSH band bucket) inflates the candidate-pair set past
    * the broadcast limit and kills the job. The count here is cheap — `df`
    * is persisted first and every call site passes a narrow
    * (few-long-columns) frame, so the gate costs one small job and the
    * frame is computed once either way.
    */
  def broadcastIfSmall(df: DataFrame, maxRows: Long): DataFrame = {
    val pinned = trackPersisted(df.persist())
    if (pinned.count() <= maxRows) broadcast(pinned) else pinned
  }

  /** Byte-gated variant of [[broadcastIfSmall]]: broadcast only when the
    * frame's MEASURED in-memory size is at most `maxBytes`. A row-count gate
    * silently assumes a row width — `editDistancePairs`' old 1M-row default
    * was ~600 MB once the 62-hash array per profile row is priced in, far
    * past what a broadcast should cost per executor. Sizing the gate in
    * bytes makes the memory contract explicit and width-proof.
    *
    * Mechanics: the frame is persisted, materialized by the same cheap
    * `count()` the row gate already paid (so the gate adds no job), and the
    * size read from the cached relation's accumulated batch stats
    * (`withCachedData.stats.sizeInBytes` — actual bytes, not an optimizer
    * estimate, because materialization precedes the read). The default cap,
    * 128 MiB, is ~1–2% of a typical executor heap; the deserialized
    * broadcast hash relation runs a small constant factor larger than the
    * columnar-compressed measurement, which the margin absorbs. Past the
    * gate the join degrades to a shuffle, same as the row variant.
    */
  def broadcastIfSmallBytes(df: DataFrame,
                            maxBytes: Long = DefaultBroadcastBytes): DataFrame = {
    val pinned = trackPersisted(df.persist())
    pinned.count()
    val bytes = pinned.queryExecution.withCachedData.stats.sizeInBytes
    if (bytes <= maxBytes) broadcast(pinned) else pinned
  }

  /** Default byte cap for [[broadcastIfSmallBytes]]: 128 MiB. */
  val DefaultBroadcastBytes: Long = 128L << 20

  /** Distributed EXACT global rank — the scalable replacement for an
    * unpartitioned `row_number().over(Window.orderBy(...))`, which funnels
    * the whole frame through ONE task (the r12 plan-audit finding).
    *
    * Mechanics: range-partition on the sort key (so partition i's keys all
    * precede partition i+1's in the sort order), `row_number` within each
    * partition, then add broadcast per-partition row-count offsets — local
    * rank + offset IS the global rank, to the row, with no single-partition
    * stage anywhere. The offsets frame is ≤ `spark.sql.shuffle.partitions`
    * rows (its own ordering window is bounded by that, whitelisted). The
    * range layout is pinned with a tracked `localCheckpoint` so the offset
    * job and the rank job read the SAME partitioning.
    *
    * `sortCols` must end in a unique tie-break column (every call site
    * does) — equal sort keys land in one range partition, but their
    * relative `row_number` order would otherwise be nondeterministic.
    */
  def globalRank(df: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    val parted = trackTransient(
      df.repartitionByRange(sortCols: _*)
        .withColumn("__gr_pid", spark_partition_id())
        .localCheckpoint())
    val offsets = parted.groupBy(col("__gr_pid"))
      .agg(count(lit(1)).as("__gr_cnt"))
      .withColumn("__gr_off",
        // bounded: ≤ spark.sql.shuffle.partitions rows (one per partition)
        coalesce(sum(col("__gr_cnt")).over(Window.orderBy(col("__gr_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gr_pid"), col("__gr_off"))
    val localW = Window.partitionBy(col("__gr_pid")).orderBy(sortCols: _*)
    parted
      .withColumn("__gr_lrank", row_number().over(localW))
      .join(broadcast(offsets), Seq("__gr_pid"))
      .withColumn(rankCol, col("__gr_off") + col("__gr_lrank"))
      .drop("__gr_pid", "__gr_lrank", "__gr_off")
  }

  /** Release every frame the operator family pinned with `persist()`.
    *
    * The dedup/text operators cache small intermediate frames (hashed
    * shingle sets, signatures, per-user stage times) that are read by two or
    * more downstream joins of the SAME query — the persist is load-bearing
    * there, and the returned DataFrame is lazy, so the operator itself has
    * no point at which it could safely unpersist. In a session that runs
    * MANY queries back to back (the bench, the verify dump, a notebook),
    * those pins accumulate; call this between queries to drop them. Single-
    * query applications never need it — executor storage is reclaimed when
    * the session ends.
    */
  def clearPinned(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    drainTransient()
  }

  /** Registry of per-call `localCheckpoint` frames that must outlive their
    * operator's return (the returned DataFrame reads them lazily) but are
    * NOT session-scoped memos: PCA heads, BFS layer frames, CC label
    * frames. They live outside the cacheManager, so without this registry
    * a bench-mode session (clearPinned between queries, never releaseAll)
    * pins their blocks for the application lifetime. Operators register
    * the surviving frames here; [[clearPinned]] drains the registry AFTER
    * the query has executed (the bench/verify loops clear between
    * queries), so the blocks live exactly one query. Memoized frames
    * (orientMemo, pairMemo, …) deliberately do NOT go through here — they
    * are meant to stay warm across clearPinned calls.
    */
  private val transientCheckpoints =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a `localCheckpoint`ed frame for release at the next
    * [[clearPinned]]/[[releaseAll]]; returns the frame for chaining. */
  def trackTransient(df: DataFrame): DataFrame = {
    transientCheckpoints.add(df)
    df
  }

  /** Registry of per-call `persist()` frames (r16 advisor): operators pin
    * small reused intermediates whose returned DataFrame is lazy, so the
    * operator itself has no safe unpersist point — in a long-lived session
    * that never calls [[clearPinned]] the pins accumulate. Tracked frames
    * are explicitly unpersisted at the next drain (cheap no-op when the
    * cacheManager clear already dropped them). */
  private val transientPersists =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a `persist()`ed frame for release at the next
    * [[clearPinned]]/[[releaseAll]]; returns the frame for chaining. */
  def trackPersisted(df: DataFrame): DataFrame = {
    transientPersists.add(df)
    df
  }

  private def drainTransient(): Unit = {
    var df = transientCheckpoints.poll()
    while (df != null) {
      try unpersistCheckpointed(df)
      catch { case _: Throwable => () } // a stopped session has no blocks
      df = transientCheckpoints.poll()
    }
    var p = transientPersists.poll()
    while (p != null) {
      try p.unpersist(false)
      catch { case _: Throwable => () }
      p = transientPersists.poll()
    }
  }

  /** Operator families with session-scoped memo maps (GraphOps, DedupOps)
    * register an evictor here at object init. The maps hold
    * `localCheckpoint`ed frames, which live OUTSIDE the cacheManager —
    * [[clearPinned]] deliberately leaves them warm (the bench reuses them
    * across passes), so without an eviction path they pin executor blocks
    * for the application lifetime.
    */
  private val memoEvictors =
    scala.collection.concurrent.TrieMap.empty[String, () => Unit]

  def registerMemoEvictor(name: String)(f: () => Unit): Unit =
    memoEvictors.put(name, () => f())

  /** Drop the RDD blocks behind a `localCheckpoint`ed frame. After this the
    * frame is dead (localCheckpoint truncates lineage, so the blocks ARE the
    * data) — callers must also drop every reference to it.
    */
  def unpersistCheckpointed(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** Full between-queries cleanup: memo maps, pinned plans, and every
    * persisted RDD block (the sweep catches localCheckpoint blocks that
    * [[clearPinned]]'s cacheManager clear cannot see). The long-lived-
    * session entry points that run MANY unrelated queries (Verify, a
    * notebook loop) call this; the bench intentionally calls only
    * [[clearPinned]] so its per-query memos stay warm across passes.
    */
  def releaseAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    memoEvictors.values.foreach(f => f())
    clearPinned(spark)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
