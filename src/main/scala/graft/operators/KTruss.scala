package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-truss decomposition by iterative edge peeling (Cohen
  * 2008): repeatedly delete every edge that sits in fewer than k−2
  * triangles of the SURVIVING graph, until a fixpoint. What remains is
  * the k-truss — the maximal subgraph where every edge has ≥ k−2
  * common-neighbor supports — the EDGE-level cohesion primitive next to
  * [[KCore]]'s vertex-level one: a k-core can be held together by a
  * hub, a k-truss cannot (every tie must be embedded in triangles), so
  * it is the tighter community backbone.
  *
  * Scale shape per round: ONE support aggregation — the canonical edge
  * list joined twice against the surviving symmetric adjacency on the
  * common-neighbor key (the same wedge-join budget as [[Triangles]],
  * out-degree-bounded) — then a left-join filter; no adjacency ever
  * materializes on the driver. Rounds are bounded by the peel depth
  * (≤ |E| worst case; each non-final round deletes at least one edge);
  * every round `localCheckpoint`s so the plan never nests and the only
  * driver action is the fixpoint edge count. Runs unchanged when
  * `edges` is corpus-scale.
  */
object KTruss {

  /** k-truss of an undirected graph given as a SYMMETRIC directed edge
    * list (both (u,v) and (v,u) present, no self-loops): returns
    * (u, v, support) for every canonical (u < v) edge of the k-truss,
    * with its triangle support inside the truss. Empty when no k-truss
    * exists.
    */
  def trussEdges(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 3, s"k must be at least 3, got $k")
    var cur = edges.select(col("src"), col("dst"))
      .where(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v")).distinct()
      .localCheckpoint(true)
    var nEdges = cur.count()
    var sup: DataFrame = null
    var stable = nEdges == 0
    while (!stable) {
      val adj = cur.select(col("u").as("x"), col("v").as("w"))
        .unionAll(cur.select(col("v").as("x"), col("u").as("w")))
      sup = cur
        .join(adj.select(col("x").as("u"), col("w")), Seq("u"))
        .join(adj.select(col("x").as("v"), col("w")), Seq("v", "w"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("support"))
        .localCheckpoint(true)
      val next = cur.join(sup, Seq("u", "v"), "left")
        .where(coalesce(col("support"), lit(0L)) >= k - 2)
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      val m = next.count()
      stable = m == nEdges
      nEdges = m
      cur = next
    }
    if (sup == null) cur.withColumn("support", lit(0L))
    else cur.join(sup, Seq("u", "v")).select(col("u"), col("v"), col("support"))
  }
}
