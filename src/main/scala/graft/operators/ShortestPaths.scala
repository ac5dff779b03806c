package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hop-bounded single-source shortest paths by distributed min-plus
  * relaxation (Bellman-Ford rounds) — the graph primitive next to
  * [[ConnectedComponents]]: routing cost over a weighted relation
  * (here: trade-volume-derived edge costs), where PageRank gives
  * importance and components give reachability.
  *
  * Semantics: minimum total `w` over all paths of at most `maxHops`
  * edges from `source`, with the minimum hop count among cost-ties —
  * i.e. the lexicographic (cost, hops) minimum. The hop bound makes
  * the result total and oracle-enumerable even on graphs with cycles;
  * relaxation over (cost, hops) pairs has exact optimal substructure
  * because adding a fixed (w, 1) preserves lexicographic order.
  *
  * Scale shape: Pregel-style — each round is one equi-join of the
  * frontier against the edge relation plus one map-side-combinable
  * struct-min aggregate, both shuffling on node keys; exactly
  * `maxHops` rounds, each `localCheckpoint`ed so the plan never nests.
  * Works unchanged when `edges` is corpus-scale; no driver-side state,
  * no walk enumeration (the ORACLE enumerates walks — the engine
  * relaxes).
  */
object ShortestPaths {

  /** `edges`: (src, dst, w) with non-negative integral `w`. Returns
    * (node, min_cost, min_hops) for every node reachable within
    * `maxHops` hops, including the source at (0, 0).
    */
  def boundedSingleSource(edges: DataFrame, source: Long,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be non-negative, got $maxHops")
    val e = edges.select(col("src"), col("dst"), col("w"))
      .localCheckpoint(true)
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("cost"),
        lit(0).as("hop"))
    for (_ <- 1 to maxHops) {
      val cand = dist.join(e, dist("node") === e("src"))
        .select(e("dst").as("node"),
          (col("cost") + col("w")).as("cost"),
          (col("hop") + 1).as("hop"))
      dist = dist.unionByName(cand)
        .groupBy(col("node"))
        .agg(min(struct(col("cost"), col("hop"))).as("m"))
        .select(col("node"), col("m.cost").as("cost"),
          col("m.hop").as("hop"))
        .localCheckpoint(true)
    }
    dist.select(col("node"), col("cost").as("min_cost"),
      col("hop").as("min_hops"))
  }
}
