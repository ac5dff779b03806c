package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-core decomposition by iterative peeling (Batagelj &
  * Zaveršnik's peel expressed as Pregel rounds — the standard
  * MapReduce/Spark formulation): repeatedly delete every vertex whose
  * degree in the SURVIVING graph is below k, until a fixpoint. What
  * remains is exactly the k-core — the maximal subgraph with minimum
  * degree ≥ k — the cohesion primitive next to [[ConnectedComponents]]
  * (reachability), [[Triangles]] (local closure) and PageRank
  * (importance): components say "connected", the core says "densely
  * mutually engaged", which is what community/fraud/influence pipelines
  * actually threshold on.
  *
  * Scale shape: each round is ONE map-side-combinable degree count
  * (shuffle on the node key) plus two left-semi joins of the edge list
  * against the ≥k survivor set — no adjacency materialization, no
  * driver-side graph. Rounds are bounded by the peel depth (≤ |V| in
  * the worst case, tiny in practice: each non-final round deletes at
  * least one vertex); every round `localCheckpoint`s so the plan never
  * nests and the only driver action is the fixpoint edge count. Runs
  * unchanged when `edges` is corpus-scale.
  */
object KCore {

  /** k-core of an undirected graph given as a SYMMETRIC directed edge
    * list (both (u,v) and (v,u) present, no self-loops): returns
    * (node, core_degree) for every vertex of the k-core, with its
    * degree inside the core. Empty when no k-core exists.
    */
  def coreMembers(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    var cur = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var nEdges = cur.count()
    var stable = false
    while (!stable) {
      val survivors = cur.groupBy(col("src"))
        .agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select(col("src").as("node"))
        .localCheckpoint(true)
      val next = cur
        .join(survivors.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(survivors.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      val m = next.count()
      stable = m == nEdges
      nEdges = m
      cur = next
    }
    cur.groupBy(col("src"))
      .agg(count(lit(1)).as("core_degree"))
      .select(col("src").as("node"), col("core_degree"))
  }
}
