package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond connected components
  * ([[DedupOps.connectedComponents]]) — the relational formulations that
  * survive a 100 TB edge list. Everything here is joins + aggregations on
  * narrow (long, long) keys; no adjacency lists are ever collected.
  */
object GraphOps {

  /** Undirected, de-duplicated, loop-free edge list derived
    * deterministically from `lineitem`: node ids are `l_orderkey % n` and
    * `l_partkey % n + n` (disjoint ranges, so the bipartite order/part
    * incidence becomes a simple graph). The modulus densifies the graph so
    * triangles actually exist at small SF while keeping the construction
    * pure SQL for the oracle.
    */
  def lineitemEdges(li: DataFrame, n: Int): DataFrame =
    li.select(
        (col("l_orderkey") % n).as("u"),
        (col("l_partkey") % n + n).as("v"))
      .union(li.select(
        (col("l_orderkey") % n).as("u"),
        (col("l_suppkey") % n + 2L * n).as("v")))
      .union(li.select(
        (col("l_partkey") % n + n).as("u"),
        (col("l_suppkey") % n + 2L * n).as("v")))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct()

  /** Exact triangle count via degree-ordered edge orientation — the
    * standard distributed formulation (node iterator with the
    * lowest-degree-first orientation of Suri & Vassilvitskii's MR model).
    * Each undirected edge is directed from its lower-degree endpoint
    * (ties: lower id), which bounds every join fan-out by O(sqrt(|E|))
    * per node instead of the max raw degree — the difference between a
    * skew-killed and a scalable self-join on a power-law graph. Three hash
    * joins on narrow long keys; no state beyond the (src, dst) pairs.
    *
    * Output: one row — node count, edge count, triangle count.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val nodes = edges.select(col("a").as("x"))
      .union(edges.select(col("b").as("x")))
    val degrees = nodes.groupBy(col("x")).agg(count(lit(1)).as("deg"))
    // orient: src = endpoint with (smaller degree, then smaller id)
    val oriented = edges
      .join(degrees.select(col("x").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(degrees.select(col("x").as("b"), col("deg").as("deg_b")), Seq("b"))
      .select(
        when(col("deg_a") < col("deg_b")
          || (col("deg_a") === col("deg_b") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist()
    // wedges at the low-degree apex, closed by the third (oriented) edge.
    // Both closing orientations are checked because the wedge endpoints'
    // relative order is unconstrained.
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("apex"),
        col("e1.dst").as("w1"), col("e2.dst").as("w2"))
    val closed = wedges.join(
      oriented.select(
        least(col("src"), col("dst")).as("w1"),
        greatest(col("src"), col("dst")).as("w2")),
      Seq("w1", "w2"))
    // oriented stays pinned — it feeds three joins of this one query;
    // session runners release it via Exec.clearPinned
    closed.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(nodes.distinct().agg(count(lit(1)).as("n_nodes")))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  /** Per-node triangle participation for the `topK` most triangle-dense
    * nodes — the local clustering signal (a node in many triangles is a
    * hub of a tight community; in a near-dup graph it is template boilerplate).
    * Same oriented-wedge plan as [[triangleCount]], but each closed wedge
    * credits all three corners before the top-k cut.
    */
  def topTriangleNodes(edges: DataFrame, topK: Int): DataFrame = {
    val nodes = edges.select(col("a").as("x"))
      .union(edges.select(col("b").as("x")))
    val degrees = nodes.groupBy(col("x")).agg(count(lit(1)).as("deg"))
    val oriented = edges
      .join(degrees.select(col("x").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(degrees.select(col("x").as("b"), col("deg").as("deg_b")), Seq("b"))
      .select(
        when(col("deg_a") < col("deg_b")
          || (col("deg_a") === col("deg_b") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist() // three reads below; released via Exec.clearPinned
    val triangles = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("apex"),
        col("e1.dst").as("w1"), col("e2.dst").as("w2"))
      .join(oriented.select(
        least(col("src"), col("dst")).as("w1"),
        greatest(col("src"), col("dst")).as("w2")), Seq("w1", "w2"))
    val credits = triangles.select(col("apex").as("node"))
      .union(triangles.select(col("w1").as("node")))
      .union(triangles.select(col("w2").as("node")))
    credits.groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
      .join(degrees.select(col("x").as("node"), col("deg")), Seq("node"))
      .orderBy(col("n_triangles").desc, col("node"))
      .limit(topK)
      .select(col("node"), col("deg"), col("n_triangles"))
  }
}
