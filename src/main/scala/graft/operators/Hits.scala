package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) over a DIRECTED edge
  * relation — the second classic link-analysis fixpoint next to
  * [[PageRank]], and the one that distinguishes the two roles PageRank
  * folds together: a hub points at good authorities, an authority is
  * pointed at by good hubs. On a customer→supplier trade graph the
  * split is literal: hub = buying breadth, authority = supplying pull.
  *
  * Semantics (fixed iteration count, synchronous updates):
  *   auth_k(v) = Σ_{u→v} hub_{k−1}(u),  then auth ← auth / max(auth)
  *   hub_k(u)  = Σ_{u→v} auth_k(v),     then hub ← hub / max(hub)
  * MAX-normalization is pinned instead of the textbook L2 norm: max of
  * doubles is accumulation-order-free and keeps the operator sqrt-free,
  * while preserving the fixpoint's direction (scores are scale-
  * invariant per iteration; the classic result holds under any norm).
  *
  * Determinism: each Σ over in/out-neighbors is the [[PageRank]]
  * ordered-fold discipline — contributions sorted by neighbor id,
  * folded sequentially in one codegen'd `aggregate` HOF, the same left
  * fold DuckDB's `list_reduce` replays; the per-node normalization is
  * one division by a broadcast 1-row max on identical operands.
  *
  * Scale shape: the edge relation (often a corpus-wide fact join at
  * the caller) is checkpointed ONCE; per iteration two broadcast joins
  * of a |nodes|-row score digest against that leaf, two shuffles on
  * the receiving node key, and a single-partition max window over the
  * |nodes|-row digest (for web-scale node sets swap it for an agg +
  * broadcast and checkpoint per iteration — the PageRank cadence).
  * Like PageRank, mega-degree hubs would trade the ordered fold for
  * plain SUM (giving up bitwise replay, not the plan shape).
  */
object Hits {

  /** @param edges relation with DISTINCT directed `src`, `dst` rows
    *   (no weights — classic HITS; self-loops allowed but conventional
    *   inputs remove them)
    */
  def hits(edges: DataFrame, iters: Int = 5): DataFrame = {
    // one corpus pass: the edge digest (often a full fact-table join at
    // the caller) is materialized once, and every iteration's joins run
    // on the checkpointed |edges|-row leaf — without this the lazy
    // 2·iters references would re-execute the corpus join each time.
    // distinct ON THE (src,dst) PROJECTION enforces the documented
    // precondition — a duplicate (src,dst) row would otherwise double
    // its contribution in every ordered fold silently; projecting
    // first keeps the semantics stable if a caller's edge schema ever
    // grows extra columns (a whole-row distinct would silently stop
    // deduplicating). One shuffle of the |edges|-row digest,
    // negligible next to the iteration joins
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().localCheckpoint(true)
    def orderedSum(contrib: DataFrame, key: String, by: String) = contrib
      .groupBy(col(key).as("node"))
      .agg(aggregate(
        sort_array(collect_list(struct(col(by), col("c")))),
        lit(0.0), (acc, x) => acc + x("c")).as("m"))
    // normalization via a global window on the |nodes|-row digest: the
    // scored relation is referenced ONCE, so the lazy plan stays linear
    // in `iters` (an agg + cross-join would double it per iteration);
    // max(m) ≥ 0 here, so including the coalesced zeros is value-free
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    def normalized(scored: DataFrame) = nodes
      .join(scored, Seq("node"), "left")
      .select(col("node"), coalesce(col("m"), lit(0.0)).as("m"))
      .select(col("node"), (col("m") / max(col("m")).over(wAll)).as("s"))
    var hub = nodes.select(col("node"), lit(1.0).as("s"))
    var auth = hub
    for (_ <- 1 to iters) {
      auth = normalized(orderedSum(
        e.join(broadcast(hub.withColumnRenamed("node", "src")), "src")
          .select(col("dst"), col("src"), col("s").as("c")),
        key = "dst", by = "src"))
      hub = normalized(orderedSum(
        e.join(broadcast(auth.withColumnRenamed("node", "dst")), "dst")
          .select(col("src"), col("dst"), col("s").as("c")),
        key = "src", by = "dst"))
    }
    nodes
      .join(auth.select(col("node"), col("s").as("authority")), "node")
      .join(hub.select(col("node"), col("s").as("hub")), "node")
  }
}
