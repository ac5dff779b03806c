package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID retrieval by Reciprocal Rank Fusion (Cormack et al. 2009) —
  * the fusion every modern RAG/retrieval stack runs: a lexical BM25
  * ranking and a dense embedding-cosine ranking each nominate their
  * top candidates, and a document's fused score is
  * Σ 1/(60 + rank_in_leg) over the legs that ranked it. RRF needs no
  * score calibration between legs (only ranks enter), which is exactly
  * why it is the default fusion in hybrid search engines.
  *
  * Determinism: each leg's rank is a row_number over
  * (round(score, 6) DESC, doc_id ASC) — the established
  * round-before-rank recipe — so rank assignment is a total order both
  * engines compute identically; the fused score is 1/(60+r) + 1/(60+r'),
  * two exact IEEE divisions added in fixed leg order, never a
  * data-ordered accumulation; final ties break on doc_id.
  *
  * Shape at 100 TB: each leg cuts to its top-`legK` FIRST —
  * TakeOrderedAndProject for the lexical leg (bounded heap per
  * partition over the query-term postings), the brute/ANN ranking for
  * the dense leg — so the fusion join and the global window touch only
  * 2·legK rows. The dense leg here is the brute-cosine baseline; at
  * corpus scale the IVF/PQ serving paths (sim_ivf_topk and friends)
  * produce the same (doc, rank) contract and slot in unchanged.
  */
object HybridRetrieval {

  def rrfTopK(s: SparkSession, dir: String,
      terms: Seq[String] = Seq("hash", "join", "stream"),
      legK: Int = 50, k: Int = 20, rrfC: Int = 60): DataFrame = {
    // lexical leg: rank BM25 scores under the deterministic
    // (rounded score, doc_id) order; cut via TakeOrdered on the SAME
    // order, so the window only ever sees legK rows
    val lexOrder = Seq(round(col("score"), 6).desc, col("doc_id").asc)
    val lex = TfIdf.bm25Scored(s, dir, terms)
      .orderBy(lexOrder: _*).limit(legK)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(lexOrder: _*))
          .cast("long").as("lex_rank"))
    // dense leg: the exact-cosine brute ranking for query vector 0 —
    // already (rounded cosine, vec_id)-ordered with rank attached
    val dense = graft.similarity.Similarity
      .bruteForceTopK(s, dir, nQueries = 1, k = legK)
      .select(col("vec_id").as("doc_id"),
        col("rank").cast("long").as("dense_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        (coalesce(lit(1.0) / (lit(rrfC) + col("lex_rank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(rrfC) + col("dense_rank")), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }

  /** The COMPOSED retrieval-to-context chain a RAG serving path runs:
    * hybrid RRF fusion ([[rrfTopK]]) → greedy MMR diversification over
    * the fused candidates (relevance = the fusion score —
    * [[graft.similarity.Similarity.mmrSelect]] is relevance-agnostic) →
    * greedy CONTEXT PACKING: picks enter the context window in MMR
    * order while the running token total fits `budget`. Every stage is
    * also gated in isolation; this gate pins the composition.
    *
    * Output, one row per MMR pick: doc_id, step, mmr, n_tokens,
    * cum_tokens, included — the audit record of what made the context
    * and why ("dropped: over budget at step 6" is a row, not a log
    * line). The running sum is a window over ≤k rows in step order;
    * everything upstream keeps its own gate's scale shape.
    */
  def ragContext(s: SparkSession, dir: String, k: Int = 8,
      budget: Long = 512L): DataFrame = {
    import graft.similarity.Similarity
    val cands = rrfTopK(s, dir)
      .select(col("doc_id").as("vec_id"), col("rrf").as("rel"))
      .localCheckpoint(true)
    val picks = Similarity.mmrSelect(cands,
      Similarity.candidatePairSims(s, dir, cands), k)
    val tokc = graft.model.Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    picks.select(col("step"), col("vec_id").as("doc_id"), col("mmr"))
      .join(tokc, Seq("doc_id"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(Window.orderBy(col("step"))))
      .withColumn("included", col("cum_tokens") <= budget)
  }
}
