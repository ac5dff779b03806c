package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece TOKENIZER TRAINING (Schuster & Nakajima 2012; the scoring
  * rule as described in Wu et al. 2016, arXiv:1609.08144 — public
  * methods): structurally BPE ([[Bpe]]) with a different merge-selection
  * rule — instead of the most FREQUENT adjacent pair, merge the pair
  * that most increases corpus likelihood under a unigram model,
  * score(l,r) = count(lr) / (count(l) · count(r)). The third trained
  * tokenizer family next to BPE (frequency) and the unigram LM
  * ([[UnigramLm]], global EM prune): WordPiece is greedy-constructive like
  * BPE but likelihood-driven like unigram.
  *
  * EXACT argmax without floats: score(x) > score(y) is decided by the
  * integer cross-multiplication x.cnt·y.ul·y.ur > y.cnt·x.ul·x.ur, with
  * (l, r) lexicographic tie-break — a total order, so the winner is
  * unique and the selection replays exactly in SQL (a NOT EXISTS
  * tournament over the candidate digest). No division is ever computed,
  * so there is nothing for engines to round. Products are bounded by
  * (Σ word freq·len)³ < 2^63 at gate scale and the spec pins the bound;
  * a larger corpus would move the comparison to DECIMAL(38,0) — the
  * counts themselves stay BIGINT at any scale.
  *
  * Scale shape per merge step (same as BPE): pair counts and symbol
  * counts are map-side-combinable integer sums over the vocabulary-
  * bounded word-type relation; the tournament runs on the ≤|symbol
  * pairs|² candidate DIGEST (vocab-bounded, never the corpus); the only
  * driver traffic is the 1-row winner. Corpus size costs exactly one
  * scan — the word-type aggregation.
  *
  * Reference scope: rentedninja/FX-Data-Pipeline has no tokenizer; this
  * extends the engine along the mandated training-data-pipeline axis.
  */
object WordPiece {

  /** Train `iters` likelihood-scored merges; returns (step, merge_left,
    * merge_right, pair_count, left_count, right_count) — the pair and
    * symbol counts that decided each step, so the gate pins the full
    * selection evidence, not just the winners.
    */
  def trainMerges(s: SparkSession, dir: String, iters: Int = 8,
      maxWords: Int = 2000): DataFrame =
    trainMergesFrom(s, Bpe.wordTypes(s, dir, maxWords), iters)

  def trainMergesFrom(s: SparkSession, types: DataFrame,
      iters: Int): DataFrame = {
    import s.implicits._
    // every count is bounded by the total symbol mass M = Σ freq·|word|,
    // so the tournament's products are < M³; M < 2^21 keeps M³ ≤ 2^63
    // exactly at the BIGINT boundary — fail LOUD, never wrap (the same
    // contract as the oracle, where DuckDB errors on BIGINT overflow)
    val mass = types
      .agg(coalesce(sum(col("freq") * length(col("word"))), lit(0L)))
      .head.getLong(0)
    require(mass < (1L << 21),
      s"symbol mass $mass risks 64-bit overflow in the score " +
        "tournament; move the comparison to DECIMAL(38,0) first")
    var st = types
      .select(col("word"), col("freq"), Bpe.chars(col("word")).as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, Long, Long, Long)]
    for (step <- 1 to iters) {
      val pairCnt = st
        .select(col("freq"), explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
      val symCnt = st
        .select(col("freq"), explode(col("syms")).as("s"))
        .groupBy(col("s")).agg(sum(col("freq")).as("ucnt"))
      val cand = pairCnt
        .join(symCnt.select(col("s").as("l"), col("ucnt").as("ul")), "l")
        .join(symCnt.select(col("s").as("r"), col("ucnt").as("ur")), "r")
        .select(col("l"), col("r"), col("cnt"), col("ul"), col("ur"))
        .localCheckpoint(true)
      // the tournament: keep the candidate no other candidate beats
      // under (cross-multiplied score DESC, l ASC, r ASC)
      val rival = cand.select(col("l").as("yl"), col("r").as("yr"),
        col("cnt").as("ycnt"), col("ul").as("yul"), col("ur").as("yur"))
      val best = cand.join(rival,
          col("ycnt") * col("ul") * col("ur")
            > col("cnt") * col("yul") * col("yur")
          || (col("ycnt") * col("ul") * col("ur")
              === col("cnt") * col("yul") * col("yur")
            && (col("yl") < col("l")
              || (col("yl") === col("l") && col("yr") < col("r")))),
          "left_anti")
        .collect()
      if (best.isEmpty) {
        return merges.result().toDF("step", "merge_left", "merge_right",
          "pair_count", "left_count", "right_count")
      }
      val w = best.head
      val (l, r) = (w.getString(0), w.getString(1))
      merges += ((step.toLong, l, r, w.getLong(2), w.getLong(3),
        w.getLong(4)))
      st = st.select(col("word"), col("freq"),
        Bpe.applyMerge(col("syms"), l, r).as("syms")).localCheckpoint()
    }
    merges.result().toDF("step", "merge_left", "merge_right",
      "pair_count", "left_count", "right_count")
  }

  /** Per-JVM memo of the trained table — one training run shared by the
    * merge gate and the tokenizer gate (the [[Bpe.trainedMerges]]
    * pattern).
    */
  private val memo = scala.collection.mutable.Map
    .empty[(String, Int, Int), Seq[(Long, String, String, Long, Long, Long)]]

  def trainedMerges(s: SparkSession, dir: String, iters: Int = 8,
      maxWords: Int = 2000): Seq[(Long, String, String, Long, Long, Long)] =
    memo.synchronized {
      memo.getOrElseUpdate((dir, iters, maxWords),
        trainMerges(s, dir, iters, maxWords).orderBy(col("step")).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getLong(3), r.getLong(4), r.getLong(5))).toSeq)
    }

  /** The WordPiece vocabulary: base letters + merge concatenations —
    * consumed by greedy longest-match inference ([[Bpe.maxMatchTokenize]]),
    * which IS WordPiece's inference algorithm.
    */
  def vocab(merges: Seq[(Long, String, String, Long, Long, Long)]): Seq[String] =
    (('a' to 'z').map(_.toString) ++ merges.map(m => m._2 + m._3)).distinct
}
