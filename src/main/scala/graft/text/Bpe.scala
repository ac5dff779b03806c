package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Byte-pair-encoding TOKENIZER TRAINING as a distributed job — the
  * missing first stage of an LLM data pipeline (Sennrich et al. 2016,
  * arXiv:1508.07909; public method). Classic BPE trains on the WORD-TYPE
  * frequency table, not the token stream: one corpus pass aggregates
  * `(word, freq)` (map-side combined, vocabulary-bounded), then each
  * merge step works on that bounded relation — so corpus size only ever
  * costs the single initial scan.
  *
  * Per merge step:
  *   1. adjacent-pair counts: explode each word's symbol sequence into
  *      its adjacent pairs weighted by word frequency, shuffle-sum —
  *      exact integer arithmetic, map-side combinable;
  *   2. argmax pair under the TOTAL order (count desc, left asc,
  *      right asc) — a 1-row driver collect (the only driver traffic);
  *   3. apply the merge: a left-to-right non-overlapping fold over each
  *      symbol sequence (a pure narrow map with the pair as a literal).
  *
  * Determinism: integer sums, a total argmax order, and a
  * deterministic fold — the DuckDB oracle replays every step unrolled
  * (SparkEntry.BpeCtes) and the learned merge table hash-matches.
  *
  * Scale: state = the top `maxWords` word types (deterministic cut:
  * freq desc, word asc). At 100 TB the word-type table is tens of
  * millions of rows — still vocabulary-bounded, partitioned by word;
  * every per-step relation is O(types × avg word length). Lineage is
  * truncated per step (`localCheckpoint`) exactly like the k-means
  * trainer — iterative jobs otherwise replay the whole chain each step.
  */
object Bpe {

  /** The word-type frequency table: ASCII-alphabetic word types only
    * (a real byte-level BPE has no such filter; here it pins
    * codepoint-exact parity between the engine and the oracle across
    * scripts) with a deterministic top-`maxWords` cut.
    */
  def wordTypes(s: SparkSession, dir: String, maxWords: Int = 2000): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc).limit(maxWords)

  /** Character sequence of a word, 1-based substr — explicit and
    * engine-portable (regex split("") limit semantics differ across
    * engines; this form cannot emit empties).
    */
  private[text] def chars(c: Column): Column =
    transform(sequence(lit(1), length(c)), i => c.substr(i, lit(1)))

  /** One BPE merge applied as a left-to-right non-overlapping fold:
    * append each symbol, or fuse it with the accumulator's tail when
    * the tail/next pair equals the learned merge. ("aaa" under merge
    * (a,a) becomes [aa, a] — the standard greedy semantics.)
    */
  private[text] def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Train `iters` merges; returns the learned merge table
    * (step, merge_left, merge_right, pair_count) — the artifact a
    * tokenizer ships.
    */
  def trainMerges(s: SparkSession, dir: String, iters: Int = 8,
      maxWords: Int = 2000): DataFrame =
    trainMergesFrom(s, wordTypes(s, dir, maxWords), iters)

  /** Training core over ANY (word, freq) relation — the batch path
    * passes the one-shot word-type table, the incremental path the fold
    * of maintained partial counts; both must learn the identical table.
    */
  def trainMergesFrom(s: SparkSession, types: DataFrame,
      iters: Int): DataFrame = {
    import s.implicits._
    var st = types
      .select(col("word"), col("freq"), chars(col("word")).as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (step <- 1 to iters) {
      val best = st
        .select(col("freq"), explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      // a corpus can run out of pairs before iters merges; stop cleanly
      if (best.isEmpty) {
        return merges.result().toDF("step", "merge_left", "merge_right", "pair_count")
      }
      val (l, r, cnt) = (best.head.getString(0), best.head.getString(1),
        best.head.getLong(2))
      merges += ((step.toLong, l, r, cnt))
      st = st.select(col("word"), col("freq"),
        applyMerge(col("syms"), l, r).as("syms")).localCheckpoint()
    }
    merges.result().toDF("step", "merge_left", "merge_right", "pair_count")
  }

  /** INCREMENTAL word-type maintenance, batch-apply half: one
    * micro-batch's word counts (same tokenizer + alphabetic filter as
    * [[wordTypes]]) land as an append-only PARTIAL-aggregate file set —
    * O(batch) per batch, LSM shape, batchId markers for at-least-once
    * idempotence (same contract as Curation.appendTokenCountBatch).
    * Counts are mergeable, so retraining from the folded state must
    * reproduce the batch-trained merges exactly — which is what the
    * stream_bpe_incremental gate checks against the cur_bpe_merges
    * oracle.
    */
  def appendWordTypeBatch(s: SparkSession, countsDir: String,
      batch: DataFrame, batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$countsDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    graft.util.BatchAppend.append(
      batch.select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
        .where(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq")),
      s"$countsDir/partials", batchId)
    marker.foreach { case (fs, p) =>
      fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  /** Fold the maintained partials and apply the SAME deterministic
    * top-`maxWords` cut as the one-shot [[wordTypes]].
    */
  def wordTypesFromPartials(s: SparkSession, countsDir: String,
      maxWords: Int = 2000): DataFrame =
    s.read.parquet(s"$countsDir/partials")
      .groupBy(col("word")).agg(sum(col("freq")).as("freq"))
      .orderBy(col("freq").desc, col("word").asc).limit(maxWords)

  /** Per-JVM memo of the trained merge table (collected rows): the
    * training loop runs once per (dir, iters, maxWords) and is shared
    * by the merge-table gate and the tokenizer-inference gate — the
    * same one-training-many-consumers shape as StreamReplay's ordered
    * feed memo. Values, not a DataFrame, so it survives clearCache().
    */
  private val mergeMemo = scala.collection.mutable.Map
    .empty[(String, Int, Int), Seq[(Long, String, String, Long)]]

  def trainedMerges(s: SparkSession, dir: String, iters: Int = 8,
      maxWords: Int = 2000): Seq[(Long, String, String, Long)] =
    mergeMemo.synchronized {
      mergeMemo.getOrElseUpdate((dir, iters, maxWords),
        trainMerges(s, dir, iters, maxWords).orderBy(col("step")).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getLong(3))).toSeq)
    }

  /** Tokenize words with a learned merge list (the inference side of the
    * artifact): replay the merges in training order over each word's
    * character sequence — a pure narrow map, embarrassingly parallel.
    */
  def tokenizeWith(words: DataFrame, merges: Seq[(String, String)],
      wordCol: String = "word"): DataFrame =
    words.withColumn("tokens",
      merges.foldLeft(chars(col(wordCol))) { case (syms, (l, r)) =>
        applyMerge(syms, l, r)
      })

  /** GREEDY LONGEST-MATCH (MaxMatch) tokenizer inference — the
    * WordPiece-family alternative to merge replay: at each position
    * take the longest vocabulary string prefixing the remainder (the
    * single character as the unk-fallback), repeat. The vocabulary is
    * the 26 base letters plus the trained merge concatenations — the
    * same persisted artifact [[tokenizeWith]] replays, consumed the way
    * WordPiece consumes it. Both inference algorithms over one trained
    * state is exactly the production question "does my corpus tokenize
    * differently under MaxMatch?".
    *
    * Mechanics: one fold per word over ≤|word| steps, each step finding
    * the longest match as the MAX of the matching candidate lengths
    * (list-filter + max — order-free, no inner loop); the consumed
    * position is derived from the concatenation of the tokens picked so
    * far, so the state is just the token list. A pure narrow map with a
    * literal vocabulary — embarrassingly parallel, no shuffle, no
    * state; the oracle replays the identical fold with DuckDB list
    * lambdas. All string/integer ops, nothing for engines to round.
    */
  def maxMatchTokenize(words: DataFrame, vocab: Seq[String],
      wordCol: String = "word"): DataFrame = {
    val maxLen = math.max(1, vocab.map(_.length).max)
    val vocabArr = array(vocab.map(lit): _*)
    val toks = aggregate(
      sequence(lit(1), length(col(wordCol))),
      array().cast("array<string>"),
      (acc, _) => {
        val pos = length(array_join(acc, ""))
        val rem = length(col(wordCol)) - pos
        val bestLen = array_max(filter(sequence(lit(1), lit(maxLen)),
          L => L <= rem
            && array_contains(vocabArr,
              col(wordCol).substr(pos + lit(1), L))))
        val tok = when(bestLen.isNull,
          col(wordCol).substr(pos + lit(1), lit(1)))
          .otherwise(col(wordCol).substr(pos + lit(1), bestLen))
        when(pos >= length(col(wordCol)), acc)
          .otherwise(concat(acc, array(tok)))
      })
    words.withColumn("tokens", toks)
  }

  /** The MaxMatch vocabulary from the trained merge artifact: base
    * letters plus every merge's concatenation.
    */
  def maxMatchVocab(merges: Seq[(Long, String, String, Long)]): Seq[String] =
    (('a' to 'z').map(_.toString) ++ merges.map(m => m._2 + m._3)).distinct
}
