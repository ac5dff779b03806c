package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional inverted-index machinery: the phrase-query primitive of a
  * search engine — postings carry token POSITIONS, and an n-word phrase
  * is an equi-join of the member tokens' postings on (doc, offset). This
  * is the third leg of the retrieval family next to TF-IDF and BM25
  * (which rank bags of words and cannot see adjacency).
  *
  * Scale shape: postings are one narrow explode of the corpus; the
  * adjacency join keys on (doc_id, pos) — co-partitioned, one shuffle
  * per side, and in a production layout the postings table is bucketed
  * by token so a phrase probe touches only its terms' buckets. Counts
  * and positions are integers; the only ordering (top bigram) carries a
  * full (count desc, w1, w2) tiebreak — deterministic everywhere.
  */
object PhraseSearch {

  /** (doc_id, pos, token): 0-based positions over the RAW split array —
    * empty slots keep their index so adjacency is string-true, then
    * drop out of the postings.
    */
  def postings(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")))
      .toDF("doc_id", "pos", "token")
      .where(length(col("token")) > 0)

  /** All adjacent-bigram instances: (doc_id, w1, w2) per occurrence. */
  def bigramInstances(docs: DataFrame): DataFrame = {
    val p = postings(docs)
    val right = p.select(col("doc_id"), (col("pos") - 1).as("pos"),
      col("token").as("w2"))
    p.join(right, Seq("doc_id", "pos"))
      .select(col("doc_id"), col("token").as("w1"), col("w2"))
  }

  /** Phrase search demo that carries its own query: find the corpus's
    * most frequent adjacent bigram (ties broken lexicographically) and
    * return each document's occurrence count of exactly that phrase.
    */
  def topBigramMatches(docs: DataFrame): DataFrame = {
    val bg = bigramInstances(docs)
    val top1 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1").asc, col("w2").asc).limit(1)
      .select(col("w1"), col("w2"))
    bg.join(broadcast(top1), Seq("w1", "w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_matches"))
  }
}
