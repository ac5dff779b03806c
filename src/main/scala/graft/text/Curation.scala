package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Dataset-curation operators for a training-data pipeline: sampling,
  * splitting, source balancing, PII scrubbing, vocabulary extraction.
  *
  * Sampling discipline: NO RNG. Every sampling decision is a pure
  * function of a stable key's md5 — so samples are reproducible across
  * runs, engines, partitionings, and re-shards (the property that makes
  * a 100 TB curation run auditable and incrementally recomputable: a
  * document's split/sample membership never changes when the corpus
  * around it does). All decisions are narrow column maps — no shuffle
  * except where the operator is inherently grouped.
  */
object Curation {

  /** Scratch-parquet memo of the per-doc token counts: the two-pass
    * prefix sum in packSequences consumes this relation in BOTH passes
    * (chunk partials, then the offset-apply join); materializing the
    * ~1000×-smaller (doc_id, lang, n_tokens) projection once means the
    * corpus TEXT is read and tokenized once, not per pass. Parquet, not
    * `.persist`, for the usual clearCache-toxicity reasons
    * (NearDup.ngramJaccardPairsCached).
    */
  private val tokPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def tokenCountsCached(s: SparkSession, dir: String): DataFrame = {
    val path = tokPaths.computeIfAbsent(dir, _ => {
      val p = graft.util.Scratch.dir("graft_pack_toks").resolve("toks").toString
      Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Hex-string hash key: md5 of the key's decimal string. Lexicographic
    * comparison on the hex prefix gives fraction control at 1/256
    * granularity, identically in any engine with md5 (DuckDB oracle
    * compares the same literal prefix).
    */
  private def hashKey(c: Column): Column = md5(c.cast("string"))

  /** Deterministic ~10% sample: md5 2-hex-char prefix < "1a" (26/256).
    * Pure filter — pushes to the scan, no shuffle, stable under
    * recomputation.
    */
  def hashSample(s: SparkSession, dir: String,
      hexCeil: String = "1a"): DataFrame =
    Tables.documents(s, dir)
      .where(substring(hashKey(col("doc_id")), 1, 2) < lit(hexCeil))
      .select(col("doc_id"), col("lang"), col("source"))

  /** Deterministic train/val/test split on the first hash nibble:
    * 0-b → train (75%), c-d → val (12.5%), e-f → test (12.5%).
    */
  def trainValTest(s: SparkSession, dir: String): DataFrame = {
    val nibble = substring(hashKey(col("doc_id")), 1, 1)
    Tables.documents(s, dir).select(col("doc_id"),
      when(nibble <= "b", "train")
        .when(nibble <= "d", "val")
        .otherwise("test").as("split"))
  }

  /** GROUP-leakage-safe split: assign whole SOURCES to train/val/test by
    * hashing the group key, so correlated documents (same crawl domain,
    * same provider) can never straddle a split boundary — the leakage
    * the per-doc split of [[trainValTest]] permits by construction.
    * Output is the per-(lang, source) contrast report: how many splits
    * the group's docs land in under the doc-level rule (usually > 1 —
    * the leak) vs the group-level rule (always exactly 1 — the
    * guarantee the gate pins), plus the assigned group split.
    *
    * Scale shape: one narrow map (two hash nibbles) + one hash
    * aggregation on the group key — no joins, no windows.
    */
  def groupSplit(s: SparkSession, dir: String): DataFrame = {
    def splitOf(nib: Column) = when(nib <= "b", "train")
      .when(nib <= "d", "val").otherwise("test")
    Tables.documents(s, dir)
      .select(col("lang"), col("source"),
        splitOf(substring(hashKey(col("doc_id")), 1, 1)).as("doc_split"),
        splitOf(substring(hashKey(col("source")), 1, 1)).as("group_split"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("doc_split")).as("n_splits_doc_level"),
        countDistinct(col("group_split")).as("n_splits_group_level"),
        min(col("group_split")).as("group_split"))
  }

  /** Source balancing: keep at most `quota` docs per (lang, source),
    * chosen by deterministic hash order (an order-free "random" quota —
    * no bias toward low doc_ids, yet fully reproducible). One shuffle on
    * the group key; WindowGroupLimit keeps it top-k without a full sort.
    */
  def sourceQuota(s: SparkSession, dir: String, quota: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(hashKey(col("doc_id")), col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= quota)
      .select(col("doc_id"), col("lang"), col("source"),
        col("rn").cast("long").as("rn"))
  }

  // PII patterns restricted to syntax with identical semantics in Java
  // regex (Spark codegen) and RE2 (DuckDB oracle): no backrefs, no
  // lookaround.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\d{3}[- ]\\d{3,4}[- ]\\d{4}"

  /** PII scrub: redact email/phone shapes, emit per-doc redaction counts
    * plus a fingerprint of the scrubbed text (the fingerprint lets the
    * oracle verify the full rewritten string without hauling it around).
    * Narrow column map — runs at scan speed.
    */
  def redactPii(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
      md5(regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>")).as("redacted_fp"))

  /** Greedy contiguous sequence packing (the sample-packing step of a
    * training-data pipeline): per language, documents are laid out in
    * doc_id order and assigned to the pack where their cumulative token
    * offset starts — `pack_id = start_offset / budget`. This is the
    * standard streaming-fill approximation (a doc overflows into the
    * pack it started in rather than splitting). Token counts use the
    * same whitespace tokenizer as text_stats (oracle-proven).
    *
    * The cumulative offset is a DISTRIBUTED two-pass prefix sum, not a
    * per-language window: a `Window.partitionBy(lang)` cumsum puts the
    * dominant language's entire token stream on ONE task — the classic
    * scale-killer for a corpus that is 99% one language. Instead doc_ids
    * are grouped into fixed ranges ("chunks", doc_id / chunkDocs — chunk
    * order IS doc_id order, so the greedy fill is unchanged):
    *   pass 1: per-(lang, chunk) token totals — a map-side-combined
    *           aggregation to a relation of ~langs × chunks rows — then
    *           an exclusive running sum over that TINY relation gives
    *           each chunk's starting offset;
    *   pass 2: broadcast the offsets back and cumsum locally within each
    *           bounded (lang, chunk) window partition — parallel across
    *           chunks, no partition ever exceeds chunkDocs rows.
    * `chunkDocs` dials offset-relation size against local-partition
    * size: 64k docs/chunk keeps a 10^10-doc corpus's offset relation
    * ~150k rows/lang (broadcastable) and every sorted partition ≤64k
    * rows. Identical output to the single-window form (PackingScaleSpec
    * pins both the equivalence and the plan shape).
    */
  def packSequences(s: SparkSession, dir: String,
      budgetTokens: Int = 512, chunkDocs: Long = 65536L): DataFrame = {
    val toks = tokenCountsCached(s, dir)
      .withColumn("chunk", floor(col("doc_id") / lit(chunkDocs)))
    // pass 1: chunk totals + exclusive running offset (langs × chunks
    // rows — the window here sorts the aggregated relation, not the data)
    val wc = Window.partitionBy("lang").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy(col("lang"), col("chunk"))
      .agg(sum(col("n_tokens")).as("chunk_toks"))
      .withColumn("chunk_off", coalesce(sum(col("chunk_toks")).over(wc), lit(0L)))
      .select(col("lang"), col("chunk"), col("chunk_off"))
    // pass 2: bounded local cumsum per (lang, chunk), offsets broadcast
    val wl = Window.partitionBy("lang", "chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(broadcast(offsets), Seq("lang", "chunk"))
      .withColumn("start_tok",
        col("chunk_off") + coalesce(sum(col("n_tokens")).over(wl), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("start_tok") / lit(budgetTokens)).cast("long").as("pack_id"))
  }

  /** Quality-WEIGHTED deterministic sampling: keep a document iff its
    * hash-uniform draw falls under its quality score — high-quality docs
    * are kept ~proportionally to quality, junk is mostly dropped, and
    * (same discipline as hashSample) there is NO RNG: the draw is the
    * first 8 md5 hex digits of the doc_id scaled to [0,1), so membership
    * is reproducible across runs, engines, and re-shards. This is the
    * quality-prior curation step of a training-data pipeline as a pure
    * pushed filter — no shuffle, runs at scan speed at any corpus size.
    * `u` (the draw) and `weight` are emitted for auditability.
    */
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    val u = conv(substring(hashKey(col("doc_id")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), u.as("u"),
        TextFunctions.qualityScore(col("text")).as("weight"))
      .where(col("u") < col("weight"))
  }

  /** Temperature-scaled LANGUAGE-MIXTURE sampling — the multinomial
    * alpha-sampling of multilingual LM training (XLM-R / mT5 style,
    * alpha = 0.5; public method): per-language keep rate
    * `rate_l = least(1, c / sqrt(n_l))`, so the kept mass per language
    * is ~ c·sqrt(n_l) ∝ n_l^0.5 — head languages are downweighted
    * toward the temperature-flattened mixture, tail languages ride
    * (capped) whole. The rate needs NO cross-domain normalization (`c`
    * is the size dial — at production scale it is set from the token
    * budget), so there is no cross-row float sum anywhere: the only
    * aggregate is the exact integer per-language count, and the draw
    * compares the md5 hash-uniform `u` (same no-RNG discipline as
    * [[weightedSample]]) against one double division over an IEEE-exact
    * sqrt of an integer — engine-portable bit-for-bit.
    *
    * Shape at 100 TB: one map-side-combined count per language (a
    * |languages|-row relation), broadcast back, then a pure filter at
    * scan speed. No corpus shuffle, reproducible across re-shards.
    */
  def temperatureMix(s: SparkSession, dir: String, c: Double = 8.0): DataFrame = {
    val docs = Tables.documents(s, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val u = conv(substring(hashKey(col("doc_id")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    docs.join(broadcast(counts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_lang"),
        least(lit(1.0), lit(c) / sqrt(col("n_lang").cast("double"))).as("rate"),
        u.as("u"))
      .where(col("u") < col("rate"))
  }

  /** Corpus vocabulary: global top-k tokens by frequency (count desc,
    * token asc — a total order, so the cut is deterministic). The
    * aggregation is map-side partial (token counts combine before the
    * shuffle) and the cut is TakeOrderedAndProject — a bounded heap per
    * partition, never a global sort of the vocabulary.
    */
  def topTokens(s: SparkSession, dir: String, k: Int = 100): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(k)

  /** N-gram LANGUAGE-MODEL quality score — the LM-filter stage of a
    * curation pipeline (CCNet/Gopher filter corpora by LM score; public
    * method), kept engine-exact: a corpus-trained word-bigram model
    * scores each document by its mean transition probability
    * P(w2|w1) = c(w1 w2) / c(w1 ·), averaged over the document's bigram
    * sequence IN POSITION ORDER with a sequential double fold — staying
    * in probability space (count ratios) rather than log space keeps the
    * arithmetic free of transcendentals, so DuckDB replays it bitwise
    * (ln() is correctly-rounded on neither engine). Fluent text scores
    * high; out-of-distribution token soup scores near the unigram floor.
    *
    * Shape at 100 TB: bigram/prefix counts are two map-side-combined
    * aggregations bounded by vocabulary (not corpus) size; scoring is
    * two hash joins on the n-gram key + one per-doc sort-fold. No
    * all-pairs anything; the model "training" IS the count aggregation.
    */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .where(size(col("t")) >= 2)
    val bi = toks
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("t")) - 2)).as("pos"), col("t"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        element_at(col("t"), col("pos") + 1).as("w1"),
        element_at(col("t"), col("pos") + 2).as("w2"))
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n2"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
    val p = bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("doc_id"), col("pos"),
        (col("n2").cast("double") / col("n1")).as("p"))
    // position-ordered sequential fold: struct sort is by (pos, p), pos
    // unique — both engines fold the identical sequence
    p.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("p")))).as("ps"))
      .select(col("doc_id"), size(col("ps")).cast("long").as("n_bigrams"),
        round(aggregate(col("ps"), lit(0.0),
          (acc, x) => acc + x.getField("p")) / size(col("ps")), 6)
          .as("lm_score"))
  }

  /** STUPID BACKOFF scoring of a HELD-OUT half (Brants et al. 2007):
    * the model trains on even doc_ids, the odd half is scored — which
    * is what makes backoff REAL ([[lmScore]] scores in-corpus, so its
    * bigrams are never unseen). A seen bigram scores count(w1 w2) /
    * count-as-context(w1); an unseen one backs off to 0.4 ·
    * count(w2)/N over the training unigrams; an unseen unigram scores
    * 0. No logs (libm-free): the per-doc score is the position-ordered
    * mean of the per-bigram scores, the [[lmScore]] fold discipline.
    *
    * Scale shape: counts are map-side-combinable aggregates; scoring
    * is two equi-joins against count relations (broadcast when the
    * vocabulary digest is small, shuffled otherwise) + the 1-row N
    * broadcast. Same plan at 100 TB.
    */
  def backoffLmScore(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    def bigrams(docs: DataFrame) = docs.where(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("t")) - 2)).as("pos"), col("t"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        element_at(col("t"), col("pos") + 1).as("w1"),
        element_at(col("t"), col("pos") + 2).as("w2"))
    val train = toks.where(col("doc_id") % 2 === 0)
    val biT = bigrams(train)
    val c2 = biT.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n2"))
    val c1 = biT.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
    val u1 = train.select(explode(col("t")).as("w2"))
      .groupBy(col("w2")).agg(count(lit(1)).as("nu"))
    val nTot = train.select(explode(col("t")).as("w"))
      .agg(count(lit(1)).as("ntok"))
    val scored = bigrams(toks.where(col("doc_id") % 2 === 1))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(u1, Seq("w2"), "left")
      .crossJoin(broadcast(nTot))
      .select(col("doc_id"), col("pos"),
        when(col("n2").isNotNull,
          col("n2").cast("double") / col("n1"))
          .otherwise(lit(0.4) * coalesce(col("nu"), lit(0L)).cast("double")
            / col("ntok")).as("p"))
    scored.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("p")))).as("ps"))
      .select(col("doc_id"), size(col("ps")).cast("long").as("n_bigrams"),
        round(aggregate(col("ps"), lit(0.0),
          (acc, x) => acc + x.getField("p")) / size(col("ps")), 6)
          .as("backoff_score"))
  }

  /** INTERPOLATED KNESER-NEY bigram scoring of the held-out half
    * (Chen & Goodman 1999; the smoothing family KenLM ships and CCNet
    * filters with — the principled sibling of [[backoffLmScore]]'s
    * Stupid Backoff): a seen bigram scores the DISCOUNTED maximum-
    * likelihood mass plus the interpolation weight times the
    * CONTINUATION probability; the continuation distribution asks "in
    * how many distinct contexts does w2 appear" (N1+(·,w2)/N1+(·,·)) —
    * the device that stops "Francisco" outscoring "glasses" after
    * frequent "San Francisco". Discount D = 0.75 — a DYADIC constant,
    * so (n2 − D) is exact in doubles and nothing transcendental exists
    * anywhere (the lmScore fold discipline).
    *
    * Unseen-event rules (documented, oracle-mirrored): unseen bigram
    * under a seen context → the interpolation term alone; unseen
    * context w1 → the continuation probability alone; w2 never seen as
    * a continuation → 0. Per-doc score = position-ordered mean.
    *
    * Scale shape: four map-side-combinable count digests (two with
    * exact distinct counts) + one 1-row broadcast; scoring is three
    * equi-joins against vocabulary-bounded relations. Same plan at
    * 100 TB.
    */
  def knLmScore(s: SparkSession, dir: String): DataFrame =
    knLmScoreOf(Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t")))

  def knLmScoreOf(toks: DataFrame): DataFrame = {
    def bigrams(docs: DataFrame) = docs.where(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("t")) - 2)).as("pos"), col("t"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        element_at(col("t"), col("pos") + 1).as("w1"),
        element_at(col("t"), col("pos") + 2).as("w2"))
    val biT = bigrams(toks.where(col("doc_id") % 2 === 0))
    val c2 = biT.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n2"))
    val c1 = biT.groupBy(col("w1")).agg(count(lit(1)).as("n1"),
      count_distinct(col("w2")).as("t1"))
    val cont = biT.groupBy(col("w2"))
      .agg(count_distinct(col("w1")).as("nc"))
    val bTypes = biT.select(col("w1"), col("w2")).distinct()
      .agg(count(lit(1)).as("nb"))
    val pcont = coalesce(col("nc"), lit(0L)).cast("double") /
      col("nb").cast("double")
    val scored = bigrams(toks.where(col("doc_id") % 2 === 1))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(bTypes))
      .select(col("doc_id"), col("pos"),
        when(col("n1").isNotNull,
          when(col("n2").isNotNull,
            (col("n2").cast("double") - lit(0.75)) /
              col("n1").cast("double")).otherwise(lit(0.0)) +
            (lit(0.75) * col("t1").cast("double") /
              col("n1").cast("double")) * pcont)
        .otherwise(pcont).as("p"))
    scored.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("p")))).as("ps"))
      .select(col("doc_id"), size(col("ps")).cast("long").as("n_bigrams"),
        round(aggregate(col("ps"), lit(0.0),
          (acc, x) => acc + x.getField("p")) / size(col("ps")), 6)
          .as("kn_score"))
  }

  /** FILL-IN-THE-MIDDLE transform (Bavarian et al. 2022,
    * arXiv:2207.14255; public method) — the code-LLM data-pipeline
    * stage that teaches infilling: half the corpus (a hash-derived
    * coin, no RNG — the weightedSample discipline) is re-serialized
    * PSM-style as <PRE>prefix<SUF>suffix<MID>middle, with the two cut
    * points drawn uniformly from disjoint 15-hex md5 slices of the
    * doc id (< 2^60, the Bloom slice trick) mod (len+1). Deterministic
    * end to end: membership, cut points, and the re-serialized bytes
    * are pure functions of (doc_id, text), so the gate hashes the
    * transformed corpus across engines. A narrow map — no shuffle, scan
    * speed at any corpus size; the gate emits the PSM fingerprint
    * rather than the transformed text to keep the result digest-sized.
    */
  def fimSplit(s: SparkSession, dir: String): DataFrame =
    fimSplitOf(Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text")))

  def fimSplitOf(docs: DataFrame): DataFrame = {
    val h = hashKey(col("doc_id"))
    val l = length(col("text"))
    val applied = conv(substring(h, 1, 1), 16, 10).cast("int") < 8
    val p1 = conv(substring(h, 2, 15), 16, 10).cast("long") %
      (l + 1).cast("long")
    val p2 = conv(substring(h, 17, 15), 16, 10).cast("long") %
      (l + 1).cast("long")
    val lo = least(p1, p2).cast("int")
    val hi = greatest(p1, p2).cast("int")
    val psm = concat(lit("<PRE>"), col("text").substr(lit(1), lo),
      lit("<SUF>"), col("text").substr(hi + 1, l - hi),
      lit("<MID>"), col("text").substr(lo + 1, hi - lo))
    docs.select(col("doc_id"), applied.as("fim_applied"),
      when(applied, lo.cast("long")).otherwise(l.cast("long")).as("n_prefix"),
      when(applied, (hi - lo).cast("long")).otherwise(0L).as("n_middle"),
      when(applied, (l - hi).cast("long")).otherwise(0L).as("n_suffix"),
      md5(when(applied, psm).otherwise(col("text"))).as("psm_fp"))
  }

  /** T5-STYLE SPAN CORRUPTION (Raffel et al. 2020; the UL2 denoiser
    * family, Tay et al. 2022 — public methods): mask short spans of the
    * token stream, emit the corrupted input with sentinel tokens and
    * the target sequence that restores them. RNG-free like [[fimSplit]]:
    * a position starts a 3-token masked span iff its per-position md5
    * coin (`md5(doc_id || ':' || pos)` first hex digit = '0', 1/16)
    * fires AND no open span covers it — the greedy occupancy makes the
    * fold ORDER-DEPENDENT, so the oracle replays it iteration-shaped
    * (one recursive-CTE state row per position, the maxmatch/zigzag
    * discipline, never a list_reduce). Effective mask rate ≈ 3/16 minus
    * span shadowing ≈ 15% — the T5 default's neighborhood.
    *
    * A pure narrow map (one fold per doc over its word positions); the
    * gate emits per-doc span/mask counts plus md5 fingerprints of the
    * rebuilt <Xk>-sentinel input/target strings, keeping the result
    * digest-sized while pinning both reconstructions byte-exactly.
    */
  def spanCorruption(s: SparkSession, dir: String): DataFrame =
    spanCorruptionOf(Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text")))

  def spanCorruptionOf(docs: DataFrame): DataFrame = {
    val withWords = docs
      .select(col("doc_id"), TextFunctions.normText(col("text")).as("nt"))
      .where(length(col("nt")) > 0)
      .select(col("doc_id"), split(col("nt"), " ").as("words"))
    val w = col("words")
    val init = struct(lit(1).as("nf"), lit(0).as("k"), lit(0).as("m"),
      lit("").as("inp"), lit("").as("tgt"))
    val fold = aggregate(sequence(lit(1), size(w)), init, (st, i) => {
      val tok = element_at(w, i)
      val coin = substring(md5(concat(col("doc_id").cast("string"),
        lit(":"), i.cast("string"))), 1, 1) === "0"
      val sent = concat(lit(" <X"), st.getField("k").cast("string"),
        lit(">"))
      when(i < st.getField("nf"), // inside an open span
        struct(st.getField("nf").as("nf"), st.getField("k").as("k"),
          (st.getField("m") + 1).as("m"), st.getField("inp").as("inp"),
          concat(st.getField("tgt"), lit(" "), tok).as("tgt")))
        .otherwise(when(coin, // start a new span at i
          struct((i + 3).as("nf"), (st.getField("k") + 1).as("k"),
            (st.getField("m") + 1).as("m"),
            concat(st.getField("inp"), sent).as("inp"),
            concat(st.getField("tgt"), sent, lit(" "), tok).as("tgt")))
          .otherwise( // plain visible token
            struct(st.getField("nf").as("nf"), st.getField("k").as("k"),
              st.getField("m").as("m"),
              concat(st.getField("inp"), lit(" "), tok).as("inp"),
              st.getField("tgt").as("tgt"))))
    })
    withWords.select(col("doc_id"), size(w).cast("long").as("n_tokens"),
        fold.as("z"))
      .select(col("doc_id"), col("n_tokens"),
        col("z.k").cast("long").as("n_spans"),
        col("z.m").cast("long").as("n_masked"),
        md5(ltrim(col("z.inp"))).as("input_fp"),
        md5(ltrim(col("z.tgt"))).as("target_fp"))
  }

  /** INCREMENTAL VOCABULARY maintenance, batch-apply half: one
    * micro-batch's token counts land as an append-only PARTIAL-aggregate
    * file set (log-structured merge shape) — O(batch) work per batch,
    * never a vocabulary-sized read-modify-write. The report half
    * ([[topTokensFromPartials]]) folds the partials; at warehouse scale a
    * periodic compaction (the Compaction operator's job) bounds the
    * partial count, exactly like any LSM level-0.
    *
    * `batchId` markers make foreachBatch's at-least-once re-delivery
    * idempotent (same contract and caveat as
    * NearDup.applyMinhashIndexBatch: the marker commits after the append;
    * a crash between the two re-appends on retry — closing that window
    * needs an atomically-committing table format).
    */
  def appendTokenCountBatch(s: SparkSession, countsDir: String,
      batch: DataFrame, batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$countsDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    graft.util.BatchAppend.append(
      batch.select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .where(length(col("token")) > 0)
        .groupBy(col("token")).agg(count(lit(1)).as("n")),
      s"$countsDir/partials", batchId)
    marker.foreach { case (fs, p) =>
      fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  /** Report half of the incremental vocabulary: fold the partial counts
    * and cut the same total-order top-k as [[topTokens]] — to which the
    * maintained result must be EQUAL (the gate checks exactly that).
    */
  def topTokensFromPartials(s: SparkSession, countsDir: String,
      k: Int = 100): DataFrame =
    s.read.parquet(s"$countsDir/partials")
      .groupBy(col("token")).agg(sum(col("n")).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(k)

  /** TOKENIZER-FERTILITY report per language: whitespace words,
    * BPE-ish subwords, and characters, with subwords-per-word
    * (fertility) and chars-per-subword — the efficiency diagnostic a
    * tokenizer retrain is judged on (high-fertility languages pay more
    * sequence length per sentence). Pure integer sums folded map-side;
    * one |languages|-row output, a single aggregation shuffle.
    */
  def tokenFertility(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_words"),
        sum(TextFunctions.subwordCount(col("text")).cast("long"))
          .as("n_subwords"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_subwords"),
        col("n_chars"),
        (col("n_subwords").cast("double") / col("n_words")).as("fertility"),
        (col("n_chars").cast("double") / col("n_subwords"))
          .as("chars_per_subword"))

  /** Per-language WINSORIZATION of a document statistic: clip to the
    * exact [lo, hi] within-language quantiles and flag the clipped rows —
    * the robust-outlier step that keeps a handful of pathological
    * documents (megabyte pastes, empty shells) from dominating
    * length-normalized scores downstream. Exact (sort-based) percentiles,
    * not a sketch, so the bounds are reproducible across engines and
    * re-shards.
    *
    * Shape at 100 TB: the bounds relation is one row per language —
    * broadcast back, so the corpus itself never shuffles: one exact
    * percentile aggregation (per-group sort of the STATISTIC column
    * only) + one broadcast-join map pass. If even the per-group value
    * sort is too hot, swap `percentile` for `approx_percentile` and keep
    * the identical plan shape — exactness of the BOUNDS is the only
    * thing traded.
    */
  def winsorize(s: SparkSession, dir: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val bounds = d.groupBy(col("lang")).agg(
      percentile(col("n_chars"), lit(lo)).as("lo_b"),
      percentile(col("n_chars"), lit(hi)).as("hi_b"))
    d.join(broadcast(bounds), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        greatest(least(col("n_chars").cast("double"), col("hi_b")),
          col("lo_b")).as("clipped"),
        (col("n_chars") < col("lo_b") || col("n_chars") > col("hi_b"))
          .as("is_outlier"))
  }

  /** Context-window chunking: split each document's token stream into
    * `window`-token chunks that start every `stride` tokens (overlap =
    * window − stride), the standard pre-tokenization step that turns
    * variable-length documents into training-context-sized rows. Chunk
    * starts are `sequence(0, n−1, stride)` — every start strictly below
    * the token count, so the final (possibly short) tail chunk is kept
    * and a document always yields at least one chunk.
    *
    * Pure narrow map + explode: no shuffle at any corpus size; output
    * row count is ~n_tokens/stride per document, the operator's job.
    */
  def chunkDocs(s: SparkSession, dir: String,
      window: Int = 64, stride: Int = 48): DataFrame = {
    val tk = split(trim(col("text")), "\\s+")
    Tables.documents(s, dir)
      .select(col("doc_id"), tk.as("tk"))
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(0), size(col("tk")) - 1, lit(stride))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("tk"), col("col") + 1, lit(window)))
          .as("chunk_text"),
        size(slice(col("tk"), col("col") + 1, lit(window)))
          .cast("long").as("n_chunk_tokens"))
  }

  /** LINE-level corpus dedup (the RefinedWeb/CCNet cleaning pass): a
    * "line" that recurs across `minDocs`+ DISTINCT documents is
    * boilerplate (headers, nav bars, license blurbs) and is REMOVED
    * from every document it appears in — the document survives with
    * the duplicated lines cut out and the remainder re-joined in
    * original order. This is the rewrite complement of
    * [[TextFunctions.textBoilerplate]] (which only scores the
    * fraction): the output here is the cleaned corpus itself.
    *
    * The corpus has no newlines, so the line splitter is a fixed
    * `lineWords`-token framing (the one-function swap point for a real
    * newline/sentence splitter) — the dedup semantics are independent
    * of how lines are drawn.
    *
    * Scale shape: one shuffle to count each line's document frequency
    * (map-side-combinable count over line hashes), an equi-join of the
    * line stream against the flagged-line dictionary (NOT forced
    * broadcast — at 100 TB the duplicate-line dictionary is itself
    * corpus-scale; AQE broadcasts it when it is small), then one
    * shuffle back to the document to reassemble. Reassembly sorts the
    * per-doc collected (line_idx, line) pairs, so it is
    * shuffle-order-proof; no step is quadratic and no driver state.
    */
  /** The fixed-width line framing of a (doc_id, text) relation —
    * shared by the one-shot dedup and the incremental line-df
    * maintenance, which must frame identically or their dictionaries
    * diverge.
    */
  private def linesOf(docs: DataFrame, lineWords: Int): DataFrame = {
    val tk = split(trim(col("text")), "\\s+")
    docs
      .select(col("doc_id"), tk.as("tk"))
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(0), size(col("tk")) - 1, lit(lineWords))))
      .select(col("doc_id"), col("pos").cast("long").as("line_idx"),
        concat_ws(" ", slice(col("tk"), col("col") + 1, lit(lineWords)))
          .as("line"))
  }

  /** Cut every line in `dup` (columns: line, __dup) from every doc and
    * reassemble the survivors in original order — shuffle-order-proof
    * via the sorted (line_idx, line) collect.
    */
  private def lineDedupAgainst(lines: DataFrame, dup: DataFrame): DataFrame =
    lines.join(dup, Seq("line"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        count(col("__dup")).as("n_dropped"),
        array_join(transform(
          array_sort(collect_list(when(col("__dup").isNull,
            struct(col("line_idx"), col("line"))))),
          x => x.getField("line")), " ").as("clean_text"))

  def lineDedup(s: SparkSession, dir: String,
      lineWords: Int = 8, minDocs: Int = 3): DataFrame = {
    val lines = linesOf(Tables.documents(s, dir), lineWords)
    val dup = lines.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= minDocs)
      .select(col("line"), lit(1).as("__dup"))
    lineDedupAgainst(lines, dup)
  }

  /** Batch half of INCREMENTAL line-df maintenance: append this batch's
    * per-line distinct-document partial counts (LSM shape, O(batch) per
    * batch). Every document lives in exactly one batch, so the partials
    * sum to the corpus-wide distinct-doc frequency; batchId markers
    * make a re-delivered micro-batch a no-op.
    */
  def appendLineDfBatch(s: SparkSession, countsDir: String,
      batch: DataFrame, lineWords: Int = 8,
      batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$countsDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    graft.util.BatchAppend.append(
      linesOf(batch, lineWords)
        .select(col("doc_id"), col("line")).distinct()
        .groupBy(col("line")).agg(count(lit(1)).as("df")),
      s"$countsDir/partials", batchId)
    marker.foreach { case (fs, p) =>
      fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  /** Report half: fold the maintained line-df dictionary and run the
    * same cut-and-reassemble pass as [[lineDedup]] — to which the
    * result must be EQUAL (the gate reuses the one-shot oracle
    * verbatim).
    */
  def lineDedupFromPartials(s: SparkSession, countsDir: String,
      dir: String, lineWords: Int = 8, minDocs: Int = 3): DataFrame = {
    val dup = s.read.parquet(s"$countsDir/partials")
      .groupBy(col("line")).agg(sum(col("df")).as("df"))
      .where(col("df") >= minDocs)
      .select(col("line"), lit(1).as("__dup"))
    lineDedupAgainst(linesOf(Tables.documents(s, dir), lineWords), dup)
  }

  /** Benchmark decontamination: flag every training document that shares
    * at least one word `n`-gram with the held-out eval split (the
    * hash-nibble test split of [[trainValTest]] stands in for the
    * benchmark suite). Contaminated documents must be dropped before
    * training or the benchmark is measuring memorization.
    *
    * Shape at 100 TB: the eval side is small BY DEFINITION (benchmarks
    * are thousands of documents, not billions), so its distinct n-gram
    * set broadcasts and the training corpus is flagged in one narrow
    * pass — explode + broadcast-hash semi-match, then a groupBy on the
    * (tiny) hit relation only; the final flag join broadcasts the hits
    * back. The full corpus is never shuffled.
    */
  /** Word n-grams of the tokenized column. Guarded: sequence(0, size−n)
    * would COUNT DOWN for short docs (Spark infers step −1 when
    * start > stop) — emit no n-grams instead.
    */
  private def wordGrams(tkCol: Column, n: Int): Column =
    when(size(tkCol) >= n,
      transform(sequence(lit(0), size(tkCol) - n),
        i => concat_ws(" ", slice(tkCol, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  def decontaminate(s: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val tk = split(trim(col("text")), "\\s+")
    val grams = wordGrams(col("tk"), n)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), tk.as("tk"),
        substring(hashKey(col("doc_id")), 1, 1).as("nib"))
      .select(col("doc_id"), col("nib"), grams.as("grams"))
    val evalGrams = docs.where(col("nib") >= "e")
      .select(explode(col("grams")).as("g")).distinct()
    val train = docs.where(col("nib") <= "d")
    val hits = train
      .select(col("doc_id"), explode(array_distinct(col("grams"))).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    train.select(col("doc_id"))
      .join(broadcast(hits), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }

  /** Decontamination by SPAN EXCISION — the surgical variant of
    * [[decontaminate]]: instead of dropping a contaminated training
    * document whole, every token covered by a matching eval `n`-gram
    * is cut and the survivors re-join in order. This is the published
    * "remove the overlapped spans, keep the document" recipe — at
    * corpus scale, dropping whole documents for one leaked sentence
    * wastes real data.
    *
    * Shape: the gram positions explode inline in the generator select
    * (the non-negotiable HOF shape — see contaminationPairs), match
    * against the broadcast eval gram set, expand to covered token
    * positions, and one anti-flag join + sorted reassembly per doc —
    * the lineDedup rebuild machinery keyed by token position. The
    * corpus text is scanned twice (grams, tokens), shuffled once (the
    * per-doc rebuild).
    */
  def decontaminateSpans(s: SparkSession, dir: String,
      n: Int = 5): DataFrame = {
    val tk = split(trim(col("text")), "\\s+")
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), tk.as("tk"),
        substring(hashKey(col("doc_id")), 1, 1).as("nib"))
    val evalG = base.where(col("nib") >= "e")
      .select(explode(array_distinct(wordGrams(col("tk"), n))).as("g"))
      .distinct()
    val starts = base.where(col("nib") <= "d")
      .select(col("doc_id"),
        posexplode(wordGrams(col("tk"), n)).as(Seq("p", "g")))
      .join(broadcast(evalG), Seq("g"))
    val covered = starts
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (n - 1))).as("pos"))
      .distinct()
      .select(col("doc_id"), col("pos"), lit(1).as("__cut"))
    base.where(col("nib") <= "d")
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("pos", "w")))
      .join(covered, Seq("doc_id", "pos"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(col("__cut")).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(when(col("__cut").isNull,
            struct(col("pos"), col("w"))))),
          x => x.getField("w")), " ").as("clean_text"))
  }

  /** CORPUS SELF-REPETITION excision — the exact-substring
    * deduplication of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better"), re-expressed over fixed-width
    * token windows: any `w`-token window whose text occurs MORE THAN
    * ONCE anywhere in the corpus is a duplicated span; every occurrence
    * except the globally first (ordered by (doc_id, position) — a total
    * order) is cut, and each document's survivors re-join in order.
    * Where [[decontaminateSpans]] excises overlap with a HELD-OUT set,
    * this excises the corpus's overlap WITH ITSELF — boilerplate,
    * mirrored articles, license blocks — while keeping one canonical
    * copy of every phrase, so no text is lost from the corpus entirely.
    *
    * Scale shape: one inline gram posexplode (the non-negotiable HOF
    * shape — see contaminationPairs), one gram-keyed aggregation whose
    * per-gram state is a COUNT and a MIN-STRUCT — map-side combinable,
    * so a boilerplate gram with 10⁸ occurrences still folds to one row
    * without a per-gram sort (the oracle's row_number window is the
    * definitional twin; the engine never ranks within a gram) — then
    * one equi-join back to occurrences and the positional rebuild. The
    * corpus text is scanned twice (grams, tokens), shuffled on the gram
    * key once and the doc key once.
    */
  def selfRepeatSpans(s: SparkSession, dir: String, w: Int = 8): DataFrame = {
    val occ = gramOccurrences(Tables.documents(s, dir), w)
    val dupGrams = occ.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("p"))).as("keep"))
      .where(col("cnt") > 1)
      .select(col("g"), col("keep"))
    selfRepeatAgainst(Tables.documents(s, dir), dupGrams, w)
  }

  /** The per-gram position scan shared by the one-shot pass and the
    * incremental batch half.
    */
  private def gramOccurrences(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .select(col("doc_id"),
        posexplode(wordGrams(col("tk"), w)).as(Seq("p", "g")))

  /** Excision half: cut every occurrence of a `dupGrams` gram except
    * its keeper, rebuild survivors in order (the decontaminateSpans
    * machinery with a keeper exemption).
    */
  private def selfRepeatAgainst(docs: DataFrame, dupGrams: DataFrame,
      w: Int): DataFrame = {
    val covered = gramOccurrences(docs, w).join(dupGrams, Seq("g"))
      .where(!(col("doc_id") === col("keep.doc_id")
        && col("p") === col("keep.p")))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (w - 1))).as("pos"))
      .distinct()
      .select(col("doc_id"), col("pos"), lit(1).as("__cut"))
    docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("pos", "word")))
      .join(covered, Seq("doc_id", "pos"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(col("__cut")).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(when(col("__cut").isNull,
            struct(col("pos"), col("word"))))),
          x => x.getField("word")), " ").as("clean_text"))
  }

  /** Batch half of INCREMENTAL gram-dictionary maintenance for
    * [[selfRepeatSpans]]: one micro-batch's per-gram PARTIAL state —
    * occurrence count plus the batch-local first occurrence — appends
    * as an LSM partial, O(batch) per batch. Both components merge
    * exactly (counts sum; keepers min-fold over (doc_id, p) structs),
    * so the folded dictionary equals the one-shot corpus scan no matter
    * how documents were batched. batchId markers make re-delivery a
    * no-op (same commit-window caveat as appendTokenCountBatch).
    */
  def appendGramStatsBatch(s: SparkSession, countsDir: String,
      batch: DataFrame, w: Int = 8, batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$countsDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    graft.util.BatchAppend.append(
      gramOccurrences(batch, w)
        .groupBy(col("g"))
        .agg(count(lit(1)).as("cnt"),
          min(struct(col("doc_id"), col("p"))).as("keep"))
        .select(col("g"), col("cnt"),
          col("keep.doc_id").as("keep_doc"), col("keep.p").as("keep_pos")),
      s"$countsDir/partials", batchId)
    marker.foreach { case (fs, p) =>
      fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  /** Report half: fold the gram partials (sum counts, min-fold keepers)
    * and run the same excision — must EQUAL the one-shot
    * [[selfRepeatSpans]] (the gate reuses its oracle verbatim).
    */
  def selfRepeatFromPartials(s: SparkSession, countsDir: String,
      dir: String, w: Int = 8): DataFrame = {
    val dup = s.read.parquet(s"$countsDir/partials")
      .groupBy(col("g"))
      .agg(sum(col("cnt")).as("cnt"),
        min(struct(col("keep_doc").as("doc_id"), col("keep_pos").as("p")))
          .as("keep"))
      .where(col("cnt") > 1)
      .select(col("g"), col("keep"))
    selfRepeatAgainst(Tables.documents(s, dir), dup, w)
  }

  /** Pairwise contamination ATTRIBUTION: which held-out document leaks
    * into which train document, scored by CONTAINMENT — the fraction of
    * the train doc's distinct word n-grams found in that specific eval
    * doc. [[decontaminate]] answers "is it contaminated"; this is the
    * audit view a pipeline ships next to the drop list (the n-gram
    * containment check LLM training runs publish for benchmark
    * leakage). Output bounded by the n_shared ≥ minShared cut.
    *
    * Scale shape: an inverted-index equi-join on the gram — the eval
    * side is the (small) benchmark suite and BROADCASTS; the train
    * postings stream through one explode + one map-side-combinable
    * count. No pairwise doc×doc step ever forms outside gram matches.
    */
  def contaminationPairs(s: SparkSession, dir: String, n: Int = 5,
      minShared: Int = 2): DataFrame = {
    val tk = split(trim(col("text")), "\\s+")
    val grams = array_distinct(wordGrams(col("tk"), n))
    // The gram expression stays INLINE in each generator select: an
    // aliased grams Project makes InferFiltersFromGenerate push a
    // size()>0 guard that re-inlines the whole non-codegen HOF build
    // into an interpreted Filter — measured 9× slower at sf0.1. The
    // same inline shape decontaminate uses.
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), tk.as("tk"),
        substring(hashKey(col("doc_id")), 1, 1).as("nib"))
    val evalG = base.where(col("nib") >= "e")
      .select(col("doc_id").as("eval_doc_id"), explode(grams).as("g"))
    val trainG = base.where(col("nib") <= "d")
      .select(col("doc_id"), explode(grams).as("g"))
    // one pass over the train grams; the containment denominator is
    // recomputed only for the (few) matched train docs afterwards —
    // the eager checkpoint keeps the pair digest from re-running the
    // corpus explode once per downstream reference
    val pairs = trainG.join(broadcast(evalG), Seq("g"))
      .groupBy(col("doc_id"), col("eval_doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .localCheckpoint(true)
    val tn = base
      .join(broadcast(pairs.select(col("doc_id")).distinct()), Seq("doc_id"))
      .select(col("doc_id"), size(grams).as("n_train_grams"))
    pairs.join(broadcast(tn), Seq("doc_id"))
      .select(col("doc_id"), col("eval_doc_id"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_train_grams"))
          .as("containment"))
  }

  /** The COMPOSED curation pipeline, end-to-end in one lazy plan — the
    * chain a real training-data run executes, proving the stages compose
    * (each is also oracle-checked in isolation):
    *
    *   1. train split      — hash-nibble ≤ 'd' (the [[trainValTest]] rule)
    *   2. quality filter   — [[TextFunctions.qualityScore]] ≥ `minQuality`
    *   3. exact dedup      — keeper = min doc_id per canonical-text
    *                         fingerprint AMONG the quality-passing docs
    *   4. decontamination  — drop docs sharing any word `n`-gram with the
    *                         held-out split (nibble ≥ 'e'), eval grams
    *                         broadcast as in [[decontaminate]]
    *   5. chunking         — `window`-token windows every `stride`
    *
    * Everything stays narrow until the dedup groupBy (one shuffle on the
    * fingerprint) — filters are pure scans, contamination is a broadcast
    * semi-match, chunking is explode arithmetic. The scored base
    * projection (tokens, split nibble, fingerprint, quality) feeds FOUR
    * plan branches (eval grams, the train filter, and the keeper
    * relation twice); without materialization Spark re-reads and
    * re-scores the corpus once per branch, so the base is staged to
    * scratch parquet first (the tfCached idiom) — at 100 TB that is the
    * difference between one corpus read plus cheap derived scans and six
    * full corpus reads.
    */
  def curationPipeline(s: SparkSession, dir: String,
      minQuality: Double = 0.65, n: Int = 5,
      window: Int = 64, stride: Int = 48): DataFrame = {
    val docs = scoredBaseCached(s, dir)
    val evalGrams = docs.where(col("nib") >= "e")
      .select(explode(wordGrams(col("tk"), n)).as("g")).distinct()
    val trainQ = docs.where(col("nib") <= "d" && col("q") >= minQuality)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val keepers = trainQ
      .withColumn("__keeper", min(col("doc_id")).over(w))
      .where(col("doc_id") === col("__keeper"))
    val contaminated = keepers
      .select(col("doc_id"), explode(array_distinct(wordGrams(col("tk"), n))).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .select(col("doc_id")).distinct()
    keepers.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(0), size(col("tk")) - 1, lit(stride))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("tk"), col("col") + 1, lit(window)))
          .as("chunk_text"),
        size(slice(col("tk"), col("col") + 1, lit(window)))
          .cast("long").as("n_chunk_tokens"))
  }

  /** DSIR-SHAPED DATA SELECTION (Xie et al. 2023, Data Selection via
    * Importance Resampling, reduced to exact integers): score each
    * document by how much its hashed-unigram profile looks like the
    * TARGET slice (here `lang = targetLang`, standing in for the
    * high-quality domain) versus the raw corpus. Features are token
    * buckets `rolling_hash64(token) & (buckets-1)`; the margin is
    *
    *   Σ_tokens ( cnt_target(b)·N_raw − cnt_raw(b)·N_target )
    *
    * = N_t·N_r · Σ (p̂_t(b) − p̂_r(b)) — the linear discriminant
    * between the two bucket distributions, the same log-free
    * exact-integer-margin discipline as the trained quality classifier
    * (DSIR's log-ratio weights order documents the same way when the
    * ratios are replaced by differences; the ranking, not the weight
    * scale, drives selection). `selected = margin > 0`.
    *
    * Scale shape: the token relation folds to TWO ≤`buckets`-row count
    * digests (map-side combinable) + two 1-row totals, all broadcast
    * back; the corpus then shuffles ONCE on doc_id for the margin sum.
    * Products and the per-doc sum run in DECIMAL(38,0) (associative-
    * exact, overflow-proof at corpus scale) and the report emits the
    * BIGINT cast.
    */
  /** CURRICULUM-learning stage assignment (Bengio et al. 2009 — a
    * public method): documents ranked by DIFFICULTY — the all-integer
    * Flesch-Kincaid milli-grade ([[TextFunctions.readability]]) under
    * the (grade, doc_id) total order — and split into 4 equal-frequency
    * stages, simplest quarter first. The stage column is what a
    * training loader orders shards by; equal-frequency (not
    * equal-width) so every stage carries the same sample budget.
    *
    * Exactness: the global rank is exact and total (integer grade,
    * doc_id tiebreak), and stage = ((rank−1)·4) div n is one integer
    * floor division — nothing to round, the oracle replays it with a
    * plain row_number.
    *
    * Scale shape: the rank is a DISTRIBUTED two-pass prefix count (the
    * [[packSequences]] discipline — a global row_number window would
    * put the corpus on one task): pass 1 counts per 1000-milli grade
    * band (trunc-div banding is monotonic, so band order is grade
    * order) and prefix-sums the ≤\|bands\|-row relation; pass 2 ranks
    * within each band's bounded partition and adds the band offset.
    * The corpus is touched by two narrow passes, no global sort.
    */
  def curriculumStages(s: SparkSession, dir: String): DataFrame = {
    val g = TextFunctions.readability(s, dir)
      .select(col("doc_id"), col("fk_grade_milli"))
      .withColumn("band", expr("fk_grade_milli div 1000"))
    // pass 1: band counts + exclusive prefix (window over the tiny
    // aggregated relation, not the corpus)
    val wb = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = g.groupBy(col("band")).agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(wb), lit(0L)))
      .select(col("band"), col("off"))
    val total = g.agg(count(lit(1)).as("n"))
    // pass 2: bounded within-band rank + band offset
    val wl = Window.partitionBy(col("band"))
      .orderBy(col("fk_grade_milli"), col("doc_id"))
    g.join(broadcast(offs), "band")
      .withColumn("rank", col("off") + row_number().over(wl))
      .crossJoin(broadcast(total))
      .withColumn("stage_idx", expr("((rank - 1) * 4) div n"))
      .select(col("doc_id"), col("fk_grade_milli"), col("rank"),
        when(col("stage_idx") === 0, "s1_simple")
          .when(col("stage_idx") === 1, "s2_moderate")
          .when(col("stage_idx") === 2, "s3_advanced")
          .otherwise("s4_complex").as("stage"))
  }

  def dsirMargin(s: SparkSession, dir: String, targetLang: String = "en",
      buckets: Int = 256): DataFrame = {
    val tb = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        explode(split(TextFunctions.normText(col("text")), " ")).as("tok"))
      .select(col("doc_id"), col("lang"),
        graft.functions.RollingHash64(col("tok"))
          .bitwiseAND(lit(buckets - 1L)).as("b"))
    val ct = tb.where(col("lang") === targetLang)
      .groupBy(col("b")).agg(count(lit(1)).as("cnt_t"))
    val cr = tb.groupBy(col("b")).agg(count(lit(1)).as("cnt_r"))
    val nT = tb.where(col("lang") === targetLang)
      .agg(count(lit(1)).as("n_t"))
    val nR = tb.agg(count(lit(1)).as("n_r"))
    tb.join(broadcast(ct), Seq("b"), "left_outer")
      .join(broadcast(cr), Seq("b"))
      .crossJoin(broadcast(nT)).crossJoin(broadcast(nR))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("cnt_t"), lit(0L)).cast("decimal(38,0)") * col("n_r")
          - col("cnt_r").cast("decimal(38,0)") * col("n_t")).as("mg"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("mg").cast("long").as("margin"),
        (col("mg") > 0).as("selected"))
  }

  private val scoredBasePaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Scratch-parquet memo of the pipeline's scored base projection:
    * (doc_id, tk, nib, fp, q) — one corpus read per (dir), shared by
    * every branch of [[curationPipeline]].
    */
  private def scoredBaseCached(s: SparkSession, dir: String): DataFrame = {
    val path = scoredBasePaths.computeIfAbsent(dir, _ => {
      val p = graft.util.Scratch.dir("graft_cur_base").resolve("base").toString
      val tk = split(trim(col("text")), "\\s+")
      Tables.documents(s, dir)
        .where(col("text").isNotNull)
        .select(col("doc_id"), tk.as("tk"),
          substring(hashKey(col("doc_id")), 1, 1).as("nib"),
          TextFunctions.fingerprint(col("text")).as("fp"),
          TextFunctions.qualityScore(col("text")).as("q"))
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }
}
