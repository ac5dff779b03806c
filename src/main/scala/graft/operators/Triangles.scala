package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered wedge closure (the
  * compact-forward algorithm, Latapy 2008 — the shape MapReduce triangle
  * counters standardized): orient every undirected edge from its lower
  * endpoint to its higher under the (degree, id) total order, build
  * wedges by self-joining oriented edges on their source, and close each
  * wedge against the oriented edge set. The orientation is the whole
  * trick at scale: every triangle is generated EXACTLY ONCE (from its
  * lowest-ordered vertex), and a vertex's out-degree in the oriented
  * graph is bounded by O(√|E|) regardless of its raw degree — a
  * celebrity node with 10⁸ neighbors contributes wedges only through
  * its few higher-ordered neighbors, so the wedge join cannot explode
  * quadratically in the skewed degree. Joins shuffle on vertex keys;
  * everything is exact integer arithmetic.
  */
object Triangles {

  /** Per-node triangle participation over an undirected edge list
    * (`u`, `v` long columns; self-loops and duplicate/reversed edges are
    * canonicalized away). Output: (node, n_triangles), nodes in ≥ 1
    * triangle only.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val canon = edges.where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
    val deg = canon.select(col("u").as("node"))
      .unionAll(canon.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    // the (degree, id) orientation key as a STRUCT — lexicographic
    // struct comparison is a total order with no packing, so arbitrary
    // 64-bit ids and degrees can't collide or overflow a packed long
    val key = deg.select(col("node"), struct(col("d"), col("node")).as("k"))
    val oriented = canon
      .join(key.select(col("node").as("u"), col("k").as("ku")), "u")
      .join(key.select(col("node").as("v"), col("k").as("kv")), "v")
      .select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("src"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("dst"),
        when(col("ku") < col("kv"), col("kv")).otherwise(col("ku")).as("kdst"))
    val e2 = oriented.select(col("src").as("src2"), col("dst").as("c"),
      col("kdst").as("kc"))
    val wedges = oriented.join(e2,
        col("src") === col("src2") && col("kdst") < col("kc"))
      .select(col("src").as("a"), col("dst").as("b"), col("c"))
    val closing = oriented.select(col("src").as("b"), col("dst").as("c"))
    val triangles = wedges.join(closing, Seq("b", "c"))
    triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** The nation-level trade graph as an undirected edge list: nations u
    * and v are adjacent when any customer of one bought from a supplier
    * of the other. The corpus-sized joins reduce to a ≤ |nations|² edge
    * digest BEFORE any graph algorithm runs — the same digest-first
    * discipline as the PageRank gate.
    */
  def tradeGraph(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(F.broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(F.broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("long").as("u"),
        col("s_nationkey").cast("long").as("v"))
}
