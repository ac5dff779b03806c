package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph topology summary — the two numbers a graph pipeline
  * reports before any algorithm choice: the GLOBAL CLUSTERING
  * COEFFICIENT (3·triangles / wedges — how much of the neighborhood
  * structure closes into triangles; Watts-Strogatz's small-world
  * diagnostic) and DEGREE ASSORTATIVITY (Newman 2002 — the Pearson
  * correlation of degrees across edge ends: positive means hubs attach
  * to hubs, negative means hub-and-spoke).
  *
  * Exactness: triangles come from the degree-ordered closure
  * ([[Triangles]] — algorithmic), wedges and the assortativity moments
  * from exact integer sums; the only doubles are one division (cc) and
  * the textbook corr tree on identical operands (the fx_change_corr
  * formula discipline). The oracle counts triangles DEFINITIONALLY
  * (ordered triple join), so the gate cross-checks the oriented-wedge
  * algorithm against the textbook semantics.
  *
  * Scale shape: one degree aggregation (map-side combinable), the
  * [[Triangles]] wedge join (out-degree O(√|E|)-bounded), and two
  * scalar aggregates — everything shuffles on node keys; the 1-row
  * digests compose via broadcast cross joins. Halvings are avoided in
  * integer space (cc = 2·Σnode-tri / Σd(d−1), since Σnode-tri = 3T and
  * Σd(d−1) = 2·wedges), so no fraction ever truncates.
  */
object GraphStats {

  /** Mutual top-N sparsification of a weighted directed digest: keep
    * each source's top-N counterparties by weight (dst tiebreak — a
    * total order on exact weights), then an edge survives only when
    * BOTH directions kept it. Output is symmetric by construction —
    * the edge-list shape [[summary]] and [[KCore]] expect. The window
    * runs on the digest, never a corpus.
    */
  def mutualTopK(weightedEdges: DataFrame, topN: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("w").desc, col("dst").asc)
    // materialized: ≤ |nodes|·topN rows, and BOTH sides of the mutuality
    // semi-join read it — without this the (possibly corpus-derived)
    // weight frame is computed twice
    val top = weightedEdges.where(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), row_number().over(w).as("rn"))
      .where(col("rn") <= topN)
      .select(col("src"), col("dst"))
      .localCheckpoint(true)
    // broadcast the reversed digest: a checkpointed relation loses its
    // size stats, so the planner would fall back to a sort-merge join
    // for a ≤|nodes|·topN-row build side
    top.join(broadcast(top.select(col("dst").as("src"), col("src").as("dst"))),
      Seq("src", "dst"), "left_semi")
  }

  /** `edges`: a SYMMETRIC directed edge list (both orientations, no
    * self-loops). Returns ONE row: n_nodes, n_edges, n_triangles,
    * n_wedges, clustering_coeff, assortativity.
    */
  def summary(edges: DataFrame): DataFrame = {
    // every downstream frame (deg, triangles, assortativity ends) reads
    // canon, so it is the single materialization of the possibly
    // corpus-derived edge digest
    val canon = edges.select(col("src"), col("dst"))
      .where(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v")).distinct()
      .localCheckpoint(true)
    val deg = canon.select(col("u").as("node"))
      .unionAll(canon.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val degAgg = deg.agg(count(lit(1)).as("n_nodes"),
      sum(col("d") * (col("d") - lit(1))).as("w2"))
    val eAgg = canon.agg(count(lit(1)).as("n_edges"))
    val triAgg = Triangles.triangleCounts(canon)
      .agg(coalesce(sum(col("n_triangles")), lit(0L)).as("tsum"))
    // edge-end frame from canon's symmetric closure, NOT the raw input:
    // a caller passing duplicate directed edges would otherwise skew the
    // assortativity moments while every other stat stays dedup-correct
    val symDedup = canon.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(canon.select(col("v").as("src"), col("u").as("dst")))
    val ends = symDedup
      .join(deg.select(col("node").as("src"), col("d").as("x")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("d").as("y")), Seq("dst"))
    val moAgg = ends.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val cov = n * sxy - sx * sy
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    degAgg.crossJoin(broadcast(eAgg)).crossJoin(broadcast(triAgg))
      .crossJoin(broadcast(moAgg))
      .select(col("n_nodes"), col("n_edges"),
        expr("tsum div 3").as("n_triangles"),
        expr("w2 div 2").as("n_wedges"),
        ((col("tsum") * lit(2)).cast("double")
          / nullif(col("w2").cast("double"), lit(0.0)))
          .as("clustering_coeff"),
        (cov / sqrt(nullif(greatest(vx * vy, lit(0.0)), lit(0.0))))
          .as("assortativity"))
  }
}
