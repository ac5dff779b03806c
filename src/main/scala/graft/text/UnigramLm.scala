package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UNIGRAM-LM TOKENIZER TRAINING (SentencePiece-style, Kudo 2018,
  * arXiv:1804.10959; public method) — the other trained-tokenizer
  * family next to [[Bpe]]: instead of greedily merging pairs, seed a
  * large candidate vocabulary from substring counts, then alternate
  * (E) Viterbi-segment every word type under the current piece scores
  * and (M) re-estimate piece scores from the segmentation usage,
  * pruning the vocabulary between rounds. This is the HARD-EM variant
  * (Viterbi counts, not lattice expectations) — the standard
  * deterministic simplification.
  *
  * Exactness discipline (what lets a DuckDB oracle replay TRAINING
  * ITSELF): piece scores are integer BIT-LENGTH surprisals,
  * cost(p) = bitlen(Σcnt) − bitlen(cnt_p) + 1 ≈ ⌈−log₂ P(p)⌉ + 1 — the
  * dyadic no-libm recipe (both engines read bit length off `bin()`),
  * so the Viterbi DP is ALL-INTEGER with the total tie order
  * (cost, n_pieces, longest-piece-first) and the learned vocabulary is
  * hash-comparable. Pruning keeps the highest-USAGE pieces: under hard
  * EM a piece's loss contribution is usage·cost, so dropping the
  * lowest-usage pieces is the minimal-loss-increase prune of the
  * original algorithm restricted to the integer score.
  *
  * Per-iteration state is a ≤(26 + KeepMultis)-entry (piece, count)
  * digest collected to the driver (the BPE best-pair / k-means
  * centroid pattern); every distributed pass is one narrow map over
  * the word-TYPE table (vocabulary-bounded — corpus size only costs
  * the single [[Bpe.wordTypes]] scan). The DP itself is a linear fold
  * of depth [[MaxWordLen]] whose state carries the best
  * (cost, n_pieces, segmentation) at the last [[MaxPieceLen]]
  * positions — exactly the shape the oracle unrolls as chained CTEs.
  */
object UnigramLm {

  val MaxWordLen = 16
  val MaxPieceLen = 4
  val SeedMultis = 150
  val KeepMultis = 100
  val Iters = 3
  private val Inf = 1000000000000000L

  /** Word types capped to the DP depth — a FIXED depth is what makes
    * the engine fold and the oracle's unrolled chain the same program.
    */
  def trainTypes(s: SparkSession, dir: String,
      maxWords: Int = 2000): DataFrame =
    Bpe.wordTypes(s, dir, maxWords)
      .where(length(col("word")) <= MaxWordLen)

  /** Seed candidate counts: every substring of length 1..MaxPieceLen of
    * every word type, weighted by type frequency (positions counted
    * multiply — the standard suffix-count seeding).
    */
  def seedCounts(types: DataFrame): DataFrame =
    types.select(col("freq"), explode(flatten(
      transform(sequence(lit(1), length(col("word"))), i =>
        transform(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("word")) - i + 1)),
          l => col("word").substr(i, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  private def bitlen(x: Long): Long =
    64L - java.lang.Long.numberOfLeadingZeros(math.max(x, 1L))

  /** Integer surprisal costs over a (piece, cnt) digest. */
  private def withCosts(counts: Seq[(String, Long)])
      : Seq[(String, Long, Long)] = {
    val total = counts.map(_._2).sum
    counts.map { case (p, c) => (p, c, bitlen(total) - bitlen(c) + 1L) }
  }

  // a typedlit Map is ONE Literal node; a map(...) of ~600 lit children
  // would be re-walked by every optimizer pass at each of the 4
  // per-step references — seconds of driver time per query
  private def costMap(vocab: Seq[(String, Long)]): Column =
    typedlit(vocab.toMap)

  private def sSt(c: Column, np: Column, seg: Column) =
    struct(c.as("c"), np.as("np"), seg.as("seg"))
  private def invalid = sSt(lit(Inf), lit(0L), lit(""))

  /** The Viterbi DP as a linear fold: state (s0..s3) = best
    * (cost, n_pieces, seg) at positions i, i−1, i−2, i−3. Candidates
    * are evaluated LONGEST PIECE FIRST with strict-better replacement,
    * so ties on (cost, n_pieces) deterministically keep the longest
    * piece — the total order the oracle mirrors CASE for CASE. Steps
    * past the word's length carry the state unchanged, so s0 after
    * MaxWordLen steps is the best at the word's end. Single characters
    * are always in the vocabulary, so the DP is always feasible.
    */
  def viterbi(word: Column, costs: Column): Column = {
    val init = struct(sSt(lit(0L), lit(0L), lit("")).as("s0"),
      invalid.as("s1"), invalid.as("s2"), invalid.as("s3"))
    aggregate(sequence(lit(1), lit(MaxWordLen)), init, (acc, i) => {
      def cand(k: Int): Column = {
        val prev = acc.getField(s"s$k")
        val piece = word.substr(i - lit(k), lit(k + 1))
        val pc = element_at(costs, piece)
        when(i >= k + 1 && prev.getField("c") < Inf && pc.isNotNull,
          sSt(prev.getField("c") + pc, prev.getField("np") + lit(1L),
            when(prev.getField("seg") === "", piece)
              .otherwise(concat(prev.getField("seg"), lit("|"), piece))))
          .otherwise(invalid)
      }
      def better(a: Column, b: Column) =
        when(b.getField("c") < a.getField("c") ||
          (b.getField("c") === a.getField("c") &&
            b.getField("np") < a.getField("np")), b).otherwise(a)
      val best = better(better(better(cand(3), cand(2)), cand(1)), cand(0))
      when(i <= length(word),
        struct(best.as("s0"), acc.getField("s0").as("s1"),
          acc.getField("s1").as("s2"), acc.getField("s2").as("s3")))
        .otherwise(acc)
    }).getField("s0")
  }

  /** E-step output: each word type's Viterbi segmentation under the
    * given (piece, cost) vocabulary — one narrow map, no shuffle.
    */
  def segmented(types: DataFrame,
      vocab: Seq[(String, Long)]): DataFrame = {
    val v = viterbi(col("word"), costMap(vocab))
    types.select(col("word"), col("freq"), v.getField("seg").as("seg"),
      v.getField("np").as("n_tokens"), v.getField("c").as("total_cost"))
  }

  /** M-step counts: piece usage over the Viterbi segmentations,
    * weighted by type frequency.
    */
  def usageCounts(segs: DataFrame): DataFrame =
    segs.select(col("freq"), explode(split(col("seg"), "\\|")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** Per-JVM memo of the trained artifact: (piece, final usage, final
    * cost) rows — shared by the vocab gate and the tokenizer gate (the
    * Bpe.trainedMerges shape).
    */
  private val vocabMemo = scala.collection.mutable.Map
    .empty[String, Seq[(String, Long, Long)]]

  def trainedVocab(s: SparkSession, dir: String)
      : Seq[(String, Long, Long)] = vocabMemo.synchronized {
    vocabMemo.getOrElseUpdate(dir,
      trainLoop(trainTypes(s, dir).localCheckpoint()))
  }

  /** The EM loop over ANY (word, freq) type relation — the batch path
    * passes the one-shot table, the incremental path the fold of
    * maintained partial counts; both must learn the identical
    * vocabulary (the Bpe.trainMergesFrom contract).
    *
    * Runs DRIVER-SIDE on the collected type digest: the relation is
    * vocabulary-bounded (≤ maxWords rows — the corpus was already
    * reduced by the one [[Bpe.wordTypes]] scan), and the previous
    * distributed formulation paid Iters× the Viterbi mega-CASE's
    * analysis/codegen cost per EM round for jobs whose data fits in a
    * driver array — the sim_pca_power / k-means collected-digest
    * pattern applies verbatim. Every step replays the distributed
    * arithmetic exactly: integer substring seed counts, the UTF8-byte
    * (cnt DESC, piece ASC) seed order, the all-integer Viterbi with
    * the (cost, n_pieces, longest-first) tie order, and the Scala
    * tuple-sort prune orders the old loop already used driver-side.
    * Lengths and slices are CODE-POINT based throughout ([[cpOffsets]])
    * because Spark's `length`/`substr` count code points, not UTF-16
    * units — so the parity holds for supplementary (non-BMP)
    * characters too, not just the BMP.
    */
  /** Hard cap on the collected type digest: the driver-side seed map
    * is ≤ MaxWordLen·MaxPieceLen ≈ 64 entries per type, so 2^17 types
    * (~8M map entries) is the loud upper bound of the collected-digest
    * discipline — a caller that skipped the upstream [[trainTypes]]
    * cap fails with a message, not an OOM (the trainPca guard).
    */
  val MaxTrainTypes: Long = 1L << 17

  def trainLoop(types: DataFrame): Seq[(String, Long, Long)] = {
    val n = types.count()
    require(n <= MaxTrainTypes,
      s"trainLoop collects the type digest to the driver and is bounded " +
        s"to $MaxTrainTypes types (got $n); cap the relation upstream " +
        s"(trainTypes maxWords) before training")
    val tw = types.select(col("word"), col("freq")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    trainLoopLocal(tw)
  }

  /** UTF8-byte ascending order — what Spark's `orderBy(piece.asc)`
    * compares (UTF8String binary order), vs Scala's UTF-16 String
    * order; they differ outside the BMP-ASCII overlap.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** UTF-16 offsets of the word's code-point boundaries — the driver
    * fold must slice by CODE POINT like the expression path (Spark's
    * `length`/`substr` count code points, not UTF-16 units), or the
    * two paths diverge on supplementary (non-BMP) characters.
    */
  private def cpOffsets(w: String): Array[Int] = {
    val n = w.codePointCount(0, w.length)
    val offs = new Array[Int](n + 1)
    var i = 0; var j = 0
    while (j < n) { offs(j) = i; i = w.offsetByCodePoints(i, 1); j += 1 }
    offs(n) = w.length
    offs
  }

  def trainLoopLocal(tw: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
    // seed: every substring of length 1..MaxPieceLen, freq-weighted —
    // the seedCounts aggregation as a driver fold (same longs);
    // lengths/slices are code-point based to match the expression path
    val seed = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, f) <- tw) {
      val o = cpOffsets(w)
      val n = o.length - 1
      for (i <- 1 to n; l <- 1 to math.min(MaxPieceLen, n - i + 1)) {
        val p = w.substring(o(i - 1), o(i - 1 + l))
        seed(p) = seed.getOrElse(p, 0L) + f
      }
    }
    def cpLen(p: String): Int = p.codePointCount(0, p.length)
    val chars0 = seed.toSeq.filter(t => cpLen(t._1) == 1)
    val mult0 = seed.toSeq.filter(t => cpLen(t._1) > 1)
      .sortWith { case ((pa, ca), (pb, cb)) =>
        ca > cb || (ca == cb && utf8Lt(pa, pb)) } // orderBy(cnt desc, piece asc)
      .take(SeedMultis)
    var counts: Seq[(String, Long)] = (chars0 ++ mult0)
      .sortBy { case (p, c) => (-c, p) }
    var result: Seq[(String, Long, Long)] = Seq.empty
    for (it <- 1 to Iters) {
      val vc = withCosts(counts)
      val costs = vc.map(t => (t._1, t._3)).toMap
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, f) <- tw; p <- viterbiLocal(w, costs).seg.split("\\|"))
        usage(p) = usage.getOrElse(p, 0L) + f
      if (it < Iters) {
        val chars = counts.collect { case (p, _) if cpLen(p) == 1 =>
          (p, usage.getOrElse(p, 0L)) }
        val multis = usage.toSeq
          .filter { case (p, c) => cpLen(p) > 1 && c > 0 }
          .sortBy { case (p, c) => (-c, p) }.take(KeepMultis)
        counts = chars ++ multis
      } else {
        result = vc.map { case (p, _, cost) =>
          (p, usage.getOrElse(p, 0L), cost) }
      }
    }
    result
  }

  private case class VSt(c: Long, np: Long, seg: String)

  /** The [[viterbi]] fold as driver code — candidate order, guards,
    * and the strict-better (cost, n_pieces) tie rule mirrored branch
    * for branch, so the learned artifact is bit-identical to the
    * expression path (pinned by UnigramLmSpec's parity property).
    */
  private def viterbiLocal(word: String, costs: Map[String, Long]): VSt = {
    val inf = VSt(Inf, 0L, "")
    val offs = cpOffsets(word)
    val nCp = offs.length - 1
    var s0 = VSt(0L, 0L, ""); var s1 = inf; var s2 = inf; var s3 = inf
    var i = 1
    while (i <= math.min(nCp, MaxWordLen)) {
      def prev(k: Int) = k match {
        case 0 => s0; case 1 => s1; case 2 => s2; case _ => s3
      }
      def cand(k: Int): VSt = {
        val pr = prev(k)
        if (i >= k + 1 && pr.c < Inf) {
          val piece = word.substring(offs(i - k - 1), offs(i))
          costs.get(piece) match {
            case Some(pc) => VSt(pr.c + pc, pr.np + 1L,
              if (pr.seg == "") piece else pr.seg + "|" + piece)
            case None => inf
          }
        } else inf
      }
      def better(a: VSt, b: VSt): VSt =
        if (b.c < a.c || (b.c == a.c && b.np < a.np)) b else a
      val best = better(better(better(cand(3), cand(2)), cand(1)), cand(0))
      s3 = s2; s2 = s1; s1 = s0; s0 = best
      i += 1
    }
    s0
  }

  /** The learned vocabulary as the gate relation
    * (piece, n_used, cost).
    */
  def vocabTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trainedVocab(s, dir).toDF("piece", "n_used", "cost")
  }

  /** Tokenizer inference under the trained artifact: Viterbi-segment
    * the (capped) word-type table with the final costs.
    */
  def tokenizeTable(s: SparkSession, dir: String): DataFrame = {
    val vc = trainedVocab(s, dir).map(t => (t._1, t._3))
    segmented(trainTypes(s, dir), vc).drop("freq")
  }

  /** Tokenizer EVAL — the frequency-weighted COMPRESSION RATIO
    * (chars per token) of both trained families over the shared capped
    * word-type table: the one number a tokenizer ships with, and the
    * comparison a pipeline reads before picking a family. Exact integer
    * weighted sums (freq·chars, freq·tokens), one double division at
    * the boundary; both inference passes are narrow maps over the
    * vocabulary-bounded type table.
    */
  def tokenizerStats(s: SparkSession, dir: String): DataFrame = {
    val types = trainTypes(s, dir).localCheckpoint()
    val merges = Bpe.trainedMerges(s, dir).map { case (_, l, r, _) => (l, r) }
    val bpeTok = Bpe.tokenizeWith(types, merges)
      .select(col("freq"), col("word"),
        size(col("tokens")).cast("long").as("n_tokens"))
    val uniTok = segmented(types, trainedVocab(s, dir).map(t => (t._1, t._3)))
      .select(col("freq"), col("word"), col("n_tokens"))
    def stats(df: DataFrame, family: String) = df
      .agg(count(lit(1)).as("n_types"),
        sum(col("freq") * length(col("word"))).cast("long").as("n_chars_w"),
        sum(col("freq") * col("n_tokens")).cast("long").as("n_tokens_w"))
      .select(lit(family).as("family"), col("n_types"), col("n_chars_w"),
        col("n_tokens_w"))
    stats(bpeTok, "bpe").unionAll(stats(uniTok, "unigram"))
      .select(col("family"), col("n_types"), col("n_chars_w"),
        col("n_tokens_w"),
        (col("n_chars_w").cast("double") / col("n_tokens_w").cast("double"))
          .as("chars_per_token"))
  }
}
