package graft.ops

import graft.SparkSpec

/** Lifecycle guard for the session-scoped memos: operator families memoize
  * `localCheckpoint`ed frames (GraphOps orient/pagerank/kcore, DedupOps LSH
  * pairs), which live OUTSIDE the cacheManager — so `clearPinned` alone would
  * retain their executor blocks for the application lifetime. `releaseAll`
  * must evict the memo maps AND drop every persisted block, or a long-lived
  * session (Verify's 160+ queries, a notebook) leaks storage round over round.
  */
class ExecReleaseSpec extends SparkSpec {

  test("releaseAll evicts memoized checkpoint frames: zero persistent RDDs survive") {
    import spark.implicits._
    val edges = (1 to 400)
      .map(i => (i.toLong, 1000L + (i % 60).toLong))
      .toDF("a", "b")

    // populate all three GraphOps memo maps, the DedupOps pair memo, and
    // per-query persist() pins
    GraphOps.kCore(edges, 2, rounds = 3, memoKey = Some("leak-spec")).collect()
    GraphOps.triangleCount(edges, memoKey = Some("leak-spec")).collect()
    GraphOps.pageRank(edges, iters = 1, memoKey = Some("leak-spec")).collect()
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    DedupOps.minhashLshPairs(docs, memoKey = Some("leak-spec")).collect()

    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "fixture should have left memoized checkpoint blocks pinned")

    Exec.releaseAll(spark)
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"leaked RDD blocks after releaseAll: ids=${leaked.keys.toSeq.sorted}")

    // memos were evicted, not just unpersisted: a re-run rebuilds and still answers
    val again = GraphOps.triangleCount(edges, memoKey = Some("leak-spec")).collect()
    assert(again.nonEmpty, "post-eviction re-run must rebuild the memo and succeed")
    Exec.releaseAll(spark)
  }

  test("late-round operators' checkpoints and pins are fully swept by releaseAll") {
    import spark.implicits._
    // pcaHead: 1 cell checkpoint + one per power-iteration round;
    // perplexityBuckets: token persist + per-doc checkpoint; bfsLayers:
    // per-round frontier pins + visited checkpoints
    val emb = (0 until 40)
      .map(i => (i.toLong, Seq.tabulate(4)(j => (i * (j + 1)).toFloat / 7f), i % 3))
      .toDF("vec_id", "embedding", "label")
    VectorOps.pcaPowerComponent(emb, dim = 4, iters = 5).collect()
    val docs = Seq((1L, "a b c a b"), (2L, "c d e f g"), (3L, "a a a b"))
      .toDF("doc_id", "text")
    TextOps.perplexityBuckets(docs).collect()
    val edges = (1L to 50L).map(i => (i, i + 1)).toDF("a", "b")
    GraphOps.bfsLayers(edges, seedMod = 10L, rounds = 2).collect()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "fixture should have pinned blocks before the sweep")
    Exec.releaseAll(spark)
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"leaked RDD blocks after releaseAll: ids=${leaked.keys.toSeq.sorted}")
  }

  test("bench-mode contract: clearPinned alone sweeps un-memoized transient checkpoints") {
    import spark.implicits._
    Exec.releaseAll(spark) // clean slate
    // every operator family whose per-call localCheckpoint frames outlive the
    // call (the returned query reads them lazily): PCA heads, BFS layers,
    // CC labels, BPE vocab rounds, perplexity per-doc, pageRank non-memo
    val emb = (0 until 40)
      .map(i => (i.toLong, Seq.tabulate(4)(j => (i * (j + 1)).toFloat / 7f), i % 3))
      .toDF("vec_id", "embedding", "label")
    VectorOps.pcaPowerComponent(emb, dim = 4, iters = 5).collect()
    VectorOps.pcaTop2Project(emb, dim = 4, iters = 4, maxId = 10).collect()
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    TextOps.perplexityBuckets(docs).collect()
    TextOps.bpeEncode(docs, rounds = 3).collect()
    DedupOps.nearDupClusters(docs).collect() // CC labels, no memoKey
    val edges = (1 to 200).map(i => (i.toLong, 1000L + (i % 40).toLong)).toDF("a", "b")
    GraphOps.bfsLayers(edges, seedMod = 10L, rounds = 2).collect()
    GraphOps.pageRank(edges, iters = 2).collect() // memoKey = None
    GraphOps.degreeAssortativity(edges).collect()
    // bench-mode between-query cleanup: cacheManager clear + transient drain,
    // NO releaseAll — memoized frames would survive (none were made here)
    Exec.clearPinned(spark)
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"clearPinned-only pass leaked RDD blocks: ids=${leaked.keys.toSeq.sorted}")
  }

  test("kCore peel releases per-round survivor and edge frames (non-converged path)") {
    import spark.implicits._
    // a peel that runs >1 round and does NOT converge within budget
    val chain = (1 to 300).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    GraphOps.kCore(chain, 2, rounds = 3).collect()
    val after = spark.sparkContext.getPersistentRDDs.filterNot {
      case (id, _) => before.contains(id)
    }
    // only the final round's edge checkpoint may remain pinned (it backs the
    // returned frame); every superseded round frame and survivor set is gone
    assert(after.size <= 1,
      s"kCore left ${after.size} pinned frames behind: ids=${after.keys.toSeq.sorted}")
    Exec.releaseAll(spark)
  }

  test("globalRank equals an unpartitioned row_number, including ties and desc order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // heavy ties (5 distinct values over 5000 rows) across many partitions:
    // the range layout puts equal keys in one partition; the unique id
    // tie-break pins their order
    val df = (1 to 5000).map(i => (i.toLong, (i % 5).toLong))
      .toDF("id", "v").repartition(17)
    val got = Exec.globalRank(df, "r", col("v").desc, col("id"))
      .select(col("id"), col("r")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("v").desc, col("id"))))
      .select(col("id"), col("r")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == want, s"first diffs: ${
      want.collect { case (k, v) if got(k) != v => (k, got(k), v) }.take(5)}")
    Exec.clearPinned(spark)
  }

  test("globalRank plan: per-partition windows + broadcast offsets, no single-task window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 1000).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val ranked = Exec.globalRank(df, "r", col("v"), col("id"))
    val plan = ranked.queryExecution.executedPlan
    val unpart = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    // the ONLY unpartitioned window permitted is the ≤#partitions offsets
    // frame (fed by the pid aggregate); the data window must be pid-keyed
    unpart.foreach { w =>
      val aggBelow = w.child.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
            if a.groupingExpressions.exists(_.name.contains("pid")) => a
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec
            if a.groupingExpressions.exists(_.name.contains("pid")) => a
      }
      assert(aggBelow.isDefined,
        s"unpartitioned window not bounded by the pid offsets aggregate:\n$plan")
    }
    Exec.clearPinned(spark)
  }
}
