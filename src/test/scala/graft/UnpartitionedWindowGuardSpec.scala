package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Standing structural gate on the bug class the r12 audit found four times:
  * an UNPARTITIONED window (`Window.orderBy` with no `partitionBy`) over an
  * unbounded-cardinality frame funnels the whole frame through ONE task —
  * correct at sf1, a straggler wall at 100×.
  *
  * Two layers:
  *   1. SOURCE LINT — every `Window.orderBy(` occurrence in src/main must
  *      carry a `bounded:` annotation (same line or the 3 lines above)
  *      naming WHY its frame cannot grow with the data (post-limit rank,
  *      calendar spine, decile frame, per-partition offset table, oracle-form
  *      contract). A new unannotated unpartitioned window fails the build.
  *   2. PLAN SHAPE — for the five queries the r12/r13 rewrites fixed, every
  *      unpartitioned WindowExec in the static physical plan must sit above
  *      a bounding operator: a TakeOrdered/limit (post-limit rank) or an
  *      aggregate grouped on a spark_partition_id-derived column (≤
  *      shuffle.partitions rows). Reverting any rewrite reintroduces a
  *      full-frame unpartitioned window and fails here.
  */
class UnpartitionedWindowGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // ---- layer 1: source lint -------------------------------------------

  test("every unpartitioned Window.orderBy in main is annotated bounded: with a reason") {
    val root = Paths.get("src/main/scala/graft")
    val files = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toList
    val offenders = files.flatMap { p: Path =>
      val lines = Files.readAllLines(p).asScala.toVector
      lines.zipWithIndex.collect {
        case (line, i)
            if line.contains("Window.orderBy")
              && !line.trim.startsWith("*")   // scaladoc mention
              && !line.trim.startsWith("//")  // comment mention
              && !(line.contains("bounded:")
                || (i >= 1 && lines.slice(math.max(0, i - 3), i)
                     .exists(_.contains("bounded:")))) =>
          s"$p:${i + 1}: ${line.trim}"
      }
    }
    assert(offenders.isEmpty,
      "unpartitioned windows without a bounded: annotation (add the reason " +
        "the frame cannot grow with the data, or partition the window):\n" +
        offenders.mkString("\n"))
  }

  // ---- layer 2: plan shape for the rewritten queries -------------------

  private def staticPlan(name: String): org.apache.spark.sql.execution.SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** True when every row-flow path from `plan`'s leaves to the window is
    * bounded: a limit/TakeOrdered, or an aggregate grouped on a
    * partition-id column (≤ shuffle.partitions rows by construction).
    *
    * PATH-AWARE, not collectFirst-anywhere: a limit on ONE branch of a
    * join must not whitelist a window whose other input is unbounded (the
    * r13 advisor's vacuous-pass case) — so a multi-child node (join,
    * union) is bounding only when EVERY child branch is itself bounded
    * (the output of a join/cross/union of bounded inputs is bounded),
    * a unary node defers to its child, and a leaf scan is unbounded.
    */
  private def hasBoundingOp(plan: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    // bounded-by-construction grouping keys: a partition-id column
    // (≤ shuffle.partitions rows) or a decile bucket (≤ 10 rows)
    def pidGrouped(as: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]) =
      as.nonEmpty && as.forall(a => a.name.toLowerCase.contains("pid")
        || a.name.toLowerCase.contains("decile"))
    // cached/checkpointed subplans: globalRank pins its range layout with
    // localCheckpoint, so a bounding agg may hide behind an
    // InMemoryTableScan/LogicalRDD boundary — but the AGGREGATE itself is
    // always in the visible tree (it runs on the checkpointed frame), so
    // an opaque leaf is treated as unbounded without losing the real cases.
    plan match {
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.LocalLimitExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
          if pidGrouped(a.groupingExpressions) => true
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec
          if pidGrouped(a.groupingExpressions) => true
      case p if p.children.isEmpty => false
      case p => p.children.forall(hasBoundingOp)
    }
  }

  test("coreness adjacency build: no unpartitioned window over an " +
    "unbounded frame (the r14 shuffle-fallback single-task funnel)") {
    // compose the SAME stage plans corenessValues executes (directed
    // union -> node-space adjacency; r17 removed the globalRank dense
    // index, so the build must stay window-free outright) without the
    // intermediate checkpoints, so the full plan is visible to the check
    import spark.implicits._
    val edges = graft.ops.GraphOps.lineitemEdges(
      spark.read.parquet(s"$sfDir/lineitem.parquet"), 2000)
    val dir = graft.ops.GraphOps.corenessDirected(edges)
    val adj = graft.ops.GraphOps.corenessAdjacency(dir)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try adj.queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val bad = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty && !hasBoundingOp(w.child) => w
    }
    assert(bad.isEmpty,
      s"coreness adjacency has ${bad.size} unpartitioned window(s) over " +
        s"an unbounded frame — the index assignment funnel is back:\n$plan")
    graft.ops.Exec.clearPinned(spark)
  }

  for (q <- Seq("txt_oov_rate", "txt_zipf", "rel_lorenz_deciles",
                "ev_funnel_time", "rel_skyline"))
    test(s"$q: every unpartitioned window sits above a bounding operator") {
      val plan = staticPlan(q)
      val bad = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty && !hasBoundingOp(w.child) => w
      }
      assert(bad.isEmpty,
        s"$q has ${bad.size} unpartitioned window(s) over an unbounded " +
          s"frame — the r12 single-task funnel is back:\n$plan")
      graft.ops.Exec.clearPinned(spark)
    }
}
