package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over an edge relation — the graph-centrality
  * operator (supplier/customer trade networks, citation graphs, link
  * graphs for crawl prioritization). Spark ships no graph surface in the
  * DataFrame API; the operator composes from joins + aggregation so
  * Catalyst plans it like any other query.
  *
  * Semantics (classic damped PageRank, Brin & Page 1998):
  *   pr_{k+1}(t) = teleport/N + damping · Σ_{s→t} pr_k(s) · w(s,t)/wout(s)
  * over a FIXED iteration count. Dangling nodes (no out-edges) leak
  * their mass rather than redistributing it — the documented
  * simplification; with a teleport term the iteration stays well-behaved
  * and the oracle replays the exact same rule.
  *
  * Determinism: the Σ over in-neighbors is a DOUBLE sum, whose value
  * depends on accumulation order — so each target's contributions are
  * sorted by source id and folded SEQUENTIALLY in one codegen'd
  * `aggregate` HOF (init 0.0), the same left fold DuckDB's `list_reduce`
  * replays. Edge weights arrive as exact DECIMALs; the w/wout ratio is
  * one double division on identical operands. `teleport` and `damping`
  * are passed as independent literals (never computed as 1−d, which
  * would round differently than a parsed decimal literal).
  *
  * Scale shape: the expensive part of any real use is building the edge
  * relation (a full fact-table aggregation — shuffle on the node pair,
  * map-side combinable); the iteration then runs on the |nodes| +
  * |edges| digest. Per iteration: one join pr⋈edges (broadcast — pr is
  * |nodes| rows) + one shuffle on dst. In-neighbor lists are bounded by
  * in-degree; for web-scale graphs with mega-degree hubs, swap the
  * ordered fold for plain SUM and give up bitwise replay — the plan
  * shape is otherwise unchanged. A short iteration count runs as ONE
  * lazy plan; `checkpointEvery` bounds the DAG for long runs.
  */
object PageRank {

  /** @param edges relation with columns `src`, `dst`, `w` (w exact
    *   DECIMAL; (src, dst) unique — pre-aggregate multi-edges first)
    * @param checkpointEvery truncate lineage every N iterations; 0 keeps
    *   the whole iteration in ONE lazy plan. Each eager localCheckpoint
    *   is a full job (measured ~0.4 s of fixed scheduling at any data
    *   size), so for the handful-of-iterations regime one plan is ~5×
    *   cheaper; past ~10 iterations the growing DAG costs more than the
    *   checkpoints — then set 3-5 (the k-means trainer's cadence).
    */
  def weightedPageRank(edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85, teleport: Double = 0.15,
      checkpointEvery: Int = 0): DataFrame = {
    val wout = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    // w and wout cross the decimal→double boundary with their TRUE
    // decimal scale intact (both exact); keep unscaled values < 2^53 at
    // the caller (rescale the weight column) or the conversion
    // double-rounds — same contract as the TWAP aggregate
    val ratio = edges.join(wout, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("wout").cast("double")).as("ratio"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    val nn = nodes.agg(count(lit(1)).cast("double").as("n"))
    var pr = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n")).as("pr"))
    for (i <- 1 to iters) {
      val contrib = ratio
        .join(broadcast(pr.withColumnRenamed("node", "src")), "src")
        .select(col("dst"), col("src"), (col("pr") * col("ratio")).as("c"))
        .groupBy(col("dst"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("src"), col("c")))),
          lit(0.0), (acc, x) => acc + x("c")).as("m"))
      pr = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(nn))
        .select(col("node"),
          (lit(teleport) / col("n")
            + lit(damping) * coalesce(col("m"), lit(0.0))).as("pr"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        pr = pr.localCheckpoint()
    }
    pr
  }

  /** PERSONALIZED PageRank (Haveliwala 2002): identical damped
    * iteration, but the teleport mass lands on a SEED SET instead of
    * uniformly — rank becomes "importance AS SEEN FROM the seeds",
    * the primitive under related-entity recommendation, trust
    * propagation, and local community scoring. Initial mass and the
    * per-step teleport both split evenly across the seeds; every
    * determinism device of [[weightedPageRank]] carries over (ordered
    * in-neighbor folds, exact decimal edge ratios, literal teleport
    * fractions computed once).
    */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long],
      iters: Int = 5, damping: Double = 0.85, teleport: Double = 0.15,
      checkpointEvery: Int = 0): DataFrame = {
    require(seeds.nonEmpty, "personalized PageRank needs a seed set")
    val wout = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val ratio = edges.join(wout, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("wout").cast("double")).as("ratio"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    val isSeed = col("node").isInCollection(seeds)
    val tp = when(isSeed, lit(teleport / seeds.size)).otherwise(lit(0.0))
    var pr = nodes.select(col("node"),
      when(isSeed, lit(1.0 / seeds.size)).otherwise(lit(0.0)).as("pr"))
    for (i <- 1 to iters) {
      val contrib = ratio
        .join(broadcast(pr.withColumnRenamed("node", "src")), "src")
        .select(col("dst"), col("src"), (col("pr") * col("ratio")).as("c"))
        .groupBy(col("dst"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("src"), col("c")))),
          lit(0.0), (acc, x) => acc + x("c")).as("m"))
      pr = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (tp + lit(damping) * coalesce(col("m"), lit(0.0))).as("pr"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        pr = pr.localCheckpoint()
    }
    pr
  }
}
