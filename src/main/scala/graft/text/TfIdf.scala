package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** tf-idf keyword extraction over the documents table: each document's
  * top-k most distinctive terms. The idf factor is the LINEAR inverse
  * document frequency `N / df` rather than `ln(N / df)`: the ranking it
  * induces per document is identical (ln is monotone), and the score
  * stays inside exact IEEE arithmetic — one multiply and one divide of
  * integer-valued doubles — so the external oracle can hash-match it
  * without cross-engine libm (ln) last-ulp hazards.
  *
  * Shape at scale (the part that matters at 100 TB):
  *   1. explode to tokens, hash-agg to per-(doc, token) term counts —
  *      one shuffle on (doc_id, token), map-side combined;
  *   2. document frequencies REUSE that relation (tf already has one row
  *      per (doc, token), so `count(*) by token` IS df) — a second
  *      map-side-combined agg, |vocab| rows out;
  *   3. score join is a shuffle join on token (the vocabulary of a web
  *      corpus does not broadcast); the 1-row corpus count does;
  *   4. per-doc top-k rides WindowGroupLimit — bounded heap per
  *      partition, never a full sort of the scored relation.
  */
object TfIdf {

  /** Scratch-parquet memo of the per-(doc, token) counts: tf feeds BOTH
    * the scored left side and the df aggregation; without
    * materialization column pruning makes the two subtrees differ,
    * Catalyst cannot reuse the exchange, and the corpus is tokenized
    * and aggregated twice (measured 2 full scans in the plan).
    * Parquet-backed, NOT `.persist` — same rationale as
    * NearDup.ngramJaccardPairsCached: a persisted relation held past
    * the query leaks executor memory and turns toxic after
    * clearCache(); the tf relation is deterministic, ~1000× smaller
    * than the corpus (3 scalars vs the text), and re-reads at scan
    * speed.
    */
  private val tfPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def tfCached(s: SparkSession, dir: String): DataFrame = {
    val path = tfPaths.computeIfAbsent(dir, _ => {
      val p = graft.util.Scratch.dir("graft_tfidf_tf").resolve("tf").toString
      Tables.documents(s, dir).select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .where(length(col("token")) > 0)
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** BM25 top-k document retrieval for a fixed query-term set — the
    * ranking function behind every lexical search stage of a data
    * pipeline (candidate retrieval for decontamination, near-dup triage,
    * eval-set mining). Standard Robertson parameters k1=1.2, b=0.75.
    *
    * Numerics: the idf factor uses BM25's rational core
    * `(N − df + 0.5) / (df + 0.5)` WITHOUT the ln wrapper — ln is
    * monotone so every ranking it induces is identical, and dropping it
    * keeps the whole score inside plain IEEE +,×,÷ of integer-valued
    * doubles (the same libm dodge as the linear idf above). Per-document
    * totals add the per-term contributions in FIXED query order (one
    * conditional-agg column per term), never a data-ordered double sum.
    *
    * Shape at scale: tf/df/dl all derive from the memoized tf relation
    * (one corpus tokenization); the query-term filter cuts tf to
    * |terms|·|docs| rows BEFORE any join; the global top-k is
    * TakeOrderedAndProject (bounded heap per partition), never a full
    * sort.
    */
  def bm25TopK(s: SparkSession, dir: String,
      terms: Seq[String] = Seq("hash", "join", "stream"), k: Int = 50,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scored(s, dir, terms, k1, b)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** The un-cut BM25 score relation (doc_id, score, c0..cN-1) —
    * everything [[bm25TopK]] ranks, before its TakeOrdered cut; also
    * the lexical leg of [[HybridRetrieval.rrfTopK]], which needs its
    * own (rounded-score, doc_id) rank order rather than the raw cut.
    */
  def bm25Scored(s: SparkSession, dir: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = tfCached(s, dir)
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .where(col("token").isin(terms: _*))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val totals = tf.agg(sum(col("tf")).as("total_tokens"),
      count_distinct(col("doc_id")).as("n_docs"))
    val contrib =
      ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
          / (col("df").cast("double") + lit(0.5))) *
        (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") + lit(k1) * (lit(1.0 - b)
          + lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = tf.where(col("token").isin(terms: _*))
      .join(broadcast(df), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .select(col("doc_id"), col("token"), contrib.as("contrib"))
    // fixed-order total: one conditional-agg column per query term (each
    // aggregates exactly one row), added left-to-right — no data-ordered
    // double accumulation anywhere
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("token") === t, col("contrib"))).as(s"c$i")
    }
    val total = terms.indices
      .map(i => coalesce(col(s"c$i"), lit(0.0)))
      .reduceLeft(_ + _)
    scored.groupBy(col("doc_id"))
      .agg(perTerm.head, perTerm.tail: _*)
      .select(Seq(col("doc_id"), total.as("score")) ++
        terms.indices.map(i => col(s"c$i")): _*)
  }

  def topTerms(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tf = tfCached(s, dir)
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("tf").cast("double") * col("n").cast("double")
          / col("df").cast("double")).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
