package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by SYNCHRONOUS label propagation (Raghavan et al.
  * 2007, arXiv:0709.2938 — public method), made fully deterministic so a
  * SQL oracle can replay it: every node starts labeled with itself; each
  * round every node adopts the most frequent label among its neighbors
  * PLUS one self-vote for its current label (the standard damping that
  * stops two-coloring oscillation), ties broken by the SMALLEST label; a
  * FIXED round count replaces the usual "until stable" so the result is
  * a pure function of the edge list. This is the density-based sibling
  * of [[ConnectedComponents]] (reachability ignores density) and
  * [[KCore]] (a threshold, not a partition): LPA partitions every node.
  *
  * Scale shape per round: one equi-join of the edge list against the
  * |V|-row label relation, one map-side-combinable (node, label) count,
  * one max_by argmax — shuffles on node keys only, no adjacency
  * materialization, no driver traffic at all (the round count is fixed,
  * so there is not even a fixpoint count). Each round
  * `localCheckpoint`s like every iterative operator here, so plans
  * never nest. Runs unchanged at corpus-scale |E|.
  */
object Communities {

  /** Final (node, community) assignment after `iters` synchronous
    * rounds over a SYMMETRIC directed edge list (both (u,v) and (v,u)
    * present, no self-loops). The argmax key packs (count, −label) into
    * one max_by struct: highest neighbor-count first, then smallest
    * label — a total order, so the assignment is deterministic under
    * any partitioning.
    */
  def labelCommunities(edges: DataFrame, iters: Int = 4): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val votes = e
        .join(labels.select(col("node").as("src"), col("lbl")), "src")
        .select(col("dst").as("node"), col("lbl"))
        .unionByName(labels) // the self-vote
        .groupBy(col("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      labels = votes.groupBy(col("node"))
        .agg(max_by(col("lbl"), struct(col("c"), -col("lbl"))).as("lbl"))
        .localCheckpoint(true)
    }
    labels.select(col("node"), col("lbl").as("community"))
  }
}
