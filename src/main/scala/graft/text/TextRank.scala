package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** TextRank extractive summarization (Mihalcea & Tarau 2004 — public
  * method): rank each document's passages by damped PageRank over the
  * passage-similarity graph and keep the top-k as the extract. The
  * corpus-scale twist vs [[graft.operators.PageRank]]: that operator
  * runs ONE graph whose node digest broadcasts; here there are
  * MILLIONS of independent tiny graphs (one per doc), so the iteration
  * is keyed by (doc_id, node) end to end — evenly-partitioned shuffle
  * joins, nothing broadcast, all documents' graphs advancing in the
  * same five jobs. That per-group-graph shape is the one a 100 TB
  * corpus actually needs.
  *
  * Units and edges: passages are fixed 8-word chunks of the normalized
  * text (the fixture has no sentence punctuation; chunking is the
  * repo's passage convention, cur_chunk_docs); edges connect chunks
  * within ±`window` positions weighted by DISTINCT-word overlap —
  * banding keeps per-doc edges linear in chunks (all-pairs would go
  * quadratic on long docs). Overlap counts are exact integers on word
  * STRINGS (no hashing — the oracle intersects the same lists);
  * teleport and init are per-doc (0.15/n_d, 1/n_d), and each node's
  * in-contributions fold in sorted source order — the
  * [[graft.operators.PageRank]] determinism devices, replayed verbatim
  * by the oracle's list_reduce.
  */
object TextRank {

  def topPassages(s: SparkSession, dir: String, chunkWords: Int = 8,
      window: Int = 3, iters: Int = 5, topK: Int = 2): DataFrame =
    topPassagesFrom(Tables.documents(s, dir), chunkWords, window, iters,
      topK)

  def topPassagesFrom(docsRaw: DataFrame, chunkWords: Int = 8,
      window: Int = 3, iters: Int = 5, topK: Int = 2): DataFrame = {
    require(chunkWords > 0 && window > 0 && iters >= 1 && topK >= 1,
      "chunkWords, window, iters, topK must be positive")
    // normText collapses whitespace, so the split is single-space exact
    val words = docsRaw
      .select(col("doc_id"),
        posexplode(split(TextFunctions.normText(col("text")), " ")))
      .select(col("doc_id"), (col("pos") / chunkWords).cast("int").as("idx"),
        col("col").as("w"))
    val chunks = words.groupBy(col("doc_id"), col("idx"))
      .agg(array_sort(array_distinct(collect_list(col("w")))).as("ws"))
      .localCheckpoint()

    val a = chunks.select(col("doc_id"), col("idx").as("src"),
      col("ws").as("wa"))
    val b = chunks.select(col("doc_id"), col("idx").as("dst"),
      col("ws").as("wb"))
    val edges = a.join(b, Seq("doc_id"))
      .where(col("src") =!= col("dst")
        && abs(col("src") - col("dst")) <= window)
      .select(col("doc_id"), col("src"), col("dst"),
        size(array_intersect(col("wa"), col("wb"))).cast("long").as("w"))
      .where(col("w") > 0)
      .localCheckpoint()

    val nd = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("double").as("n"))
    val nodes = chunks.select(col("doc_id"), col("idx").as("node"))
      .join(nd, "doc_id")
    val wout = edges.groupBy(col("doc_id"), col("src"))
      .agg(sum(col("w")).as("wout"))
    val ratio = edges.join(wout, Seq("doc_id", "src"))
      .select(col("doc_id"), col("src"), col("dst"),
        (col("w").cast("double") / col("wout").cast("double")).as("ratio"))
      .localCheckpoint()

    var pr = nodes.select(col("doc_id"), col("node"),
      (lit(1.0) / col("n")).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = ratio
        .join(pr.withColumnRenamed("node", "src"), Seq("doc_id", "src"))
        .select(col("doc_id"), col("dst"), col("src"),
          (col("pr") * col("ratio")).as("c"))
        .groupBy(col("doc_id"), col("dst"))
        .agg(aggregate(
          sort_array(collect_list(struct(col("src"), col("c")))),
          lit(0.0), (acc, x) => acc + x("c")).as("m"))
      pr = nodes
        .join(contrib.withColumnRenamed("dst", "node"),
          Seq("doc_id", "node"), "left")
        .select(col("doc_id"), col("node"),
          (lit(0.15) / col("n")
            + lit(0.85) * coalesce(col("m"), lit(0.0))).as("pr"))
    }
    val rk = Window.partitionBy(col("doc_id"))
      .orderBy(round(col("pr"), 6).desc, col("node").asc)
    pr.withColumn("rank", row_number().over(rk))
      .where(col("rank") <= topK)
      .select(col("doc_id"), col("node").cast("long").as("chunk_idx"),
        col("rank").cast("long").as("rank"), col("pr"))
  }
}
