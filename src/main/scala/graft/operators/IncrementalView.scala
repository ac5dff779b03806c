package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Incremental maintenance of a materialized JOIN view — the delta-merge
  * pattern: when fact batches arrive, the view is refreshed by joining
  * ONLY the batch against the dimension and merging mergeable aggregates
  * (SUM/COUNT) into the stored view, never by recomputing over the full
  * fact history. Complements the LSM-partials pattern in
  * `Curation.appendTokenCountBatch` (append + compact): here each batch
  * produces the NEW consolidated view generation directly, because the
  * view is small (|groups| rows — segments, not facts).
  *
  * Scale shape per batch: one broadcast join (dimension side), one
  * map-side-combined partial aggregation of the batch, one |groups|-row
  * merge. Work is O(batch), state is O(|groups|); the fact table's full
  * volume is never rescanned. Generations are written to distinct paths
  * (write-then-advance), so a failed refresh leaves the previous
  * generation intact — the same staging discipline as
  * `Compaction`/`MergeOps`.
  *
  * Determinism: revenue accumulates as DECIMAL(18,2) (exact for 2-dp
  * prices) and converts to double only in the final projection, so
  * neither batch arrival order nor partition order can perturb the
  * result — which is what lets the oracle be the ONE-SHOT join+agg SQL.
  */
object IncrementalView {

  /** Revenue-by-segment view maintained over `nBatches` deterministic
    * arrival slices of the orders table; returns the final view, which
    * must equal the one-shot join+aggregate over all orders.
    */
  def revenueBySegmentIncremental(s: SparkSession, dir: String,
      nBatches: Int = 4): DataFrame = {
    val dim = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val root = graft.util.Scratch.dir("graft_mv_rev")
    var current: Option[String] = None
    (0 until nBatches).foreach { b =>
      val batch = Tables.orders(s, dir)
        .where(pmod(col("o_orderkey"), lit(nBatches)) === b)
      val delta = batch
        .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"),
          count(lit(1)).as("n_orders"))
      val merged = current match {
        case None => delta
        case Some(prev) =>
          s.read.parquet(prev).unionByName(delta)
            .groupBy(col("c_mktsegment"))
            .agg(sum(col("revenue")).as("revenue"),
              sum(col("n_orders")).as("n_orders"))
      }
      val gen = root.resolve(s"gen_$b").toString
      // the |groups|-row view compacts to one file; write-then-advance
      merged.coalesce(1).write.mode("overwrite").parquet(gen)
      current = Some(gen)
    }
    s.read.parquet(current.get)
      .select(col("c_mktsegment"),
        col("revenue").cast("double").as("revenue"), col("n_orders"))
  }

  /** PageRank maintained incrementally — the graph sibling of the MV
    * pattern. The corpus-scale state is the weighted EDGE relation: per
    * fact batch, only the batch joins the (broadcast) dimensions and its
    * exact decimal edge weights merge into the stored |edges|-row view
    * (O(batch) work, O(|edges|) state, write-then-advance generations).
    * The damped iteration then RERUNS over the maintained digest at
    * report time: iterations are digest-sized — re-running them is the
    * cheap half; rescanning the fact history is the expensive half this
    * pattern avoids. Exact decimal merge ≡ one-shot aggregation, so the
    * ranks equal the batch ranks bit for bit and the oracle is
    * q_pagerank_trade's own replay.
    */
  def pagerankTradeIncremental(s: SparkSession, dir: String,
      nBatches: Int = 4): DataFrame =
    PageRank.weightedPageRank(
        tradeEdgeDigestIncremental(s, dir, nBatches, "graft_pr_edges"),
        iters = 5)
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("node"), col("n_name"))), "node")
      .select(col("n_name").as("nation"), col("pr"))

  /** The maintained weighted trade-edge digest shared by the
    * incremental PageRank and incremental graph-stats gates: per fact
    * batch, only the batch joins the (broadcast) dimensions and its
    * exact decimal edge weights merge into the stored |edges|-row view
    * (O(batch) work, O(|edges|) state, write-then-advance generations).
    * Exact decimal merge ≡ one-shot aggregation, so anything derived
    * from the digest equals its one-shot twin bit for bit.
    */
  /** Path memo keyed by (dir, nBatches): the SAME maintained digest
    * serves the incremental PageRank, graph-stats, and HITS gates (the
    * pair-graph shared-digest discipline) — the generation loop runs
    * once per JVM, not once per consumer; `scratchTag` names the first
    * builder's tree but is deliberately NOT part of the key.
    */
  private val digestPaths =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]()

  def tradeEdgeDigestIncremental(s: SparkSession, dir: String,
      nBatches: Int, scratchTag: String): DataFrame =
    s.read.parquet(digestPaths.computeIfAbsent((dir, nBatches), _ =>
      buildTradeEdgeDigest(s, dir, nBatches, scratchTag)))

  private def buildTradeEdgeDigest(s: SparkSession, dir: String,
      nBatches: Int, scratchTag: String): String = {
    val cust = broadcast(Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey")))
    val supp = broadcast(Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey")))
    val root = graft.util.Scratch.dir(scratchTag)
    var current: Option[String] = None
    (0 until nBatches).foreach { b =>
      // the same arrival predicate scopes BOTH fact relations: the join
      // key is l_orderkey = o_orderkey, so filtering orders by the
      // batch's pmod slice is exactly equivalent and keeps per-batch
      // join input O(batch) — joining the full orders table each batch
      // would cost O(batch + |orders|) and defeat the pattern
      val ord = Tables.orders(s, dir)
        .where(pmod(col("o_orderkey"), lit(nBatches)) === b)
        .select(col("o_orderkey"), col("o_custkey"))
      val batch = Tables.lineitem(s, dir)
        .where(pmod(col("l_orderkey"), lit(nBatches)) === b)
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice").cast("decimal(18,2)")
            * (lit(1.0).cast("decimal(4,2)")
              - col("l_discount").cast("decimal(4,2)"))).as("rev"))
      val delta = batch
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(sum(col("rev")).as("w"))
      val merged = current match {
        case None => delta
        case Some(prev) =>
          s.read.parquet(prev).unionByName(delta)
            .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      }
      val gen = root.resolve(s"gen_$b").toString
      merged.coalesce(1).write.mode("overwrite").parquet(gen)
      current = Some(gen)
    }
    current.get
  }
}
