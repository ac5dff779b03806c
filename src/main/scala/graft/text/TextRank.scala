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

    // each doc's graph is tiny, so edge construction + the damped
    // iterations run IN-ROW on the per-doc chunk digest
    // ([[TextRankLocal]] — bit-identical arithmetic to the keyed-join
    // formulation it replaced): exactly two corpus shuffles end-to-end
    // (the chunk groupBy, the per-doc collect) instead of ~3·iters
    val pr = chunks
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("idx"), col("ws")))).as("cs"))
      .select(col("doc_id"),
        explode(TextRankLocal(col("cs"), window, iters)).as("e"))
      .select(col("doc_id"), col("e.node").as("node"), col("e.pr").as("pr"))
    val rk = Window.partitionBy(col("doc_id"))
      .orderBy(round(col("pr"), 6).desc, col("node").asc)
    pr.withColumn("rank", row_number().over(rk))
      .where(col("rank") <= topK)
      .select(col("doc_id"), col("node").cast("long").as("chunk_idx"),
        col("rank").cast("long").as("rank"), col("pr"))
  }
}
