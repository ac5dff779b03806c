package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, n-gram-heuristic language ID, document
  * fingerprinting, exact dedup. Everything is a pure column expression
  * (whole-stage codegen, no UDFs), deterministic, and reproducible in
  * vanilla SQL — so the DuckDB oracle can check each operator exactly.
  */
object TextFunctions {

  /** Canonical text form: lowercase, whitespace collapsed, trimmed. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Content-addressed document fingerprint over the canonical form. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(split(trim(c), "\\s+"))

  /** BPE-ish subword count: alpha runs, digit runs, single other glyphs. */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def punctCount(c: Column): Column = regexp_count(c, lit("[\\.,;:!?]"))

  /** Null (not an ANSI divide-by-zero crash) on empty documents. */
  def alphaRatio(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]")).cast("double") / nullif(length(c), lit(0))

  private val Stopwords = "the|a|of|and|to|in|is|it|for|on"

  def stopwordCount(c: Column): Column =
    regexp_count(lower(c), lit(s"\\b($Stopwords)\\b"))

  /** Composite quality score in [0,1]: alpha density, length saturation,
    * punctuation restraint, stopword presence. The exact formula matters
    * less than it being cheap, monotone in the obvious directions, and
    * bit-reproducible.
    */
  def qualityScore(c: Column): Column = {
    val tokens = tokenCount(c).cast("double")
    val punctRatio = punctCount(c).cast("double") / tokens
    val stopRatio = stopwordCount(c).cast("double") / tokens
    lit(0.4) * alphaRatio(c) +
      lit(0.3) * least(tokens / lit(100.0), lit(1.0)) +
      lit(0.2) * (lit(1.0) - least(punctRatio, lit(1.0))) +
      lit(0.1) * least(stopRatio * lit(5.0), lit(1.0))
  }

  /** Marker-word hit counts per candidate language (n-gram heuristic). */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "the|a|of|and|is",
    "de" -> "der|die|das|und|ist",
    "es" -> "el|la|los|y|es",
    "fr" -> "le|les|et|est|une",
    "zh" -> "")

  def langScore(c: Column, lang: String): Column = {
    val pattern = langMarkers.toMap.apply(lang)
    if (lang == "zh") regexp_count(c, lit("[\\x{4e00}-\\x{9fff}]"))
    else regexp_count(lower(c), lit(s"\\b($pattern)\\b"))
  }

  /** Argmax over the language scores with a fixed priority order, so the
    * prediction is total and deterministic even on ties.
    */
  def langPredict(scores: Map[String, Column]): Column = {
    val order = Seq("en", "de", "es", "fr", "zh")
    order.init.foldRight(lit(order.last)) { (lang, fallback) =>
      val later = order.dropWhile(_ != lang).tail.map(scores)
      val laterMax = if (later.sizeIs == 1) later.head else greatest(later: _*)
      when(scores(lang) >= laterMax, lit(lang)).otherwise(fallback)
    }
  }

  // ---- per-table query entry points ----

  def textStats(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.select(col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      subwordCount(col("text")).as("n_subwords"),
      length(col("text")).as("n_chars_measured"),
      punctCount(col("text")).as("n_punct"),
      alphaRatio(col("text")).as("alpha_ratio"))
  }

  def textQuality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      qualityScore(col("text")).as("quality"))

  /** Flesch-Kincaid readability grade (Kincaid et al. 1975 — a public
    * formula) per document, pinned as the ALL-INTEGER variant so the
    * gate is hash-exact: grade_milli = (390·words) div sentences +
    * (11800·syllables) div words − 15590 (the 0.39/11.8/15.59
    * coefficients ×1000, integer floor division — documented variant,
    * biased ≤1 milli-grade below the float formula). Words are \S+
    * runs, sentences [.!?]+ runs floored at 1, and syllables the
    * classic vowel-run proxy ([aeiouy]+ runs of the lowercased text) —
    * each a single codegen'd regexp_count, no tokenize-explode.
    * Readability is the curation signal next to [[qualityScore]] /
    * Gopher rules that grades COMPLEXITY rather than cleanliness
    * (boilerplate scores clean but reads flat; scraped prose varies).
    *
    * Scale shape: a narrow per-row map over the corpus — no shuffle,
    * no join, full whole-stage codegen; the band CASE is driver-free.
    */
  def readability(s: SparkSession, dir: String): DataFrame = {
    val words = regexp_count(col("text"), lit("\\S+")).cast("long")
    val sents = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
      .cast("long")
    val syll = regexp_count(lower(col("text")), lit("[aeiouy]+"))
      .cast("long")
    Tables.documents(s, dir)
      .select(col("doc_id"), words.as("n_words"), sents.as("n_sentences"),
        syll.as("n_syllables"))
      .where(col("n_words") > 0)
      .withColumn("fk_grade_milli",
        expr("((390 * n_words) div n_sentences)" +
          " + ((11800 * n_syllables) div n_words) - 15590"))
      .withColumn("band",
        when(col("fk_grade_milli") < 6000, "elementary")
          .when(col("fk_grade_milli") < 9000, "middle")
          .when(col("fk_grade_milli") < 13000, "high_school")
          .otherwise("college"))
  }

  /** Gopher-style quality-RULE breakdown (Rae et al. 2021 §A1.1): the
    * published per-document filter rules as individual booleans plus
    * the conjunction, next to [[qualityScore]]'s composite float — a
    * pipeline ships the rule breakdown so the drop reasons are
    * auditable per rule, not folded into one opaque score. Rules:
    * word count in [minWords, 100000], mean word length in [3, 10],
    * symbol-to-word ratio (# or ...) <= 0.1, >= 80% of words contain
    * an alphabetic character, and >= 2 stopword hits. Every metric is
    * integer counting or a single integer-ratio division, so the
    * booleans are bit-reproducible; one narrow codegen'd scan except
    * the per-token alpha filter (a bounded-doc-length lambda).
    */
  def textGopherRules(s: SparkSession, dir: String,
      minWords: Int = 50): DataFrame = {
    val tk = split(trim(col("text")), "\\s+")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), tk.as("tk"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_words"),
        (length(regexp_replace(trim(col("text")), "\\s+", "")).cast("double")
          / size(col("tk"))).as("mean_word_len"),
        (regexp_count(col("text"), lit("#|\\.\\.\\.")).cast("double")
          / size(col("tk"))).as("symbol_ratio"),
        (size(filter(col("tk"), x => x.rlike("[A-Za-z]"))).cast("double")
          / size(col("tk"))).as("alpha_word_frac"),
        stopwordCount(col("text")).cast("long").as("n_stopwords"))
      .select(col("*"),
        col("n_words").between(minWords, 100000).as("r_words"),
        col("mean_word_len").between(3.0, 10.0).as("r_word_len"),
        (col("symbol_ratio") <= 0.1).as("r_symbol"),
        (col("alpha_word_frac") >= 0.8).as("r_alpha"),
        (col("n_stopwords") >= 2).as("r_stopwords"))
      .withColumn("passes",
        col("r_words") && col("r_word_len") && col("r_symbol") &&
          col("r_alpha") && col("r_stopwords"))
  }

  /** Default canary patterns: three phrases that really occur in the
    * corpus (single- and multi-hit branches both live) plus a
    * BIG-bench-style GUID that must never match — the zero branch.
    */
  val DefaultCanaries: Seq[String] = Seq(
    "slow slow", "window window", "merge merge merge",
    "canary-d9c2ba3e-7f1a-guid")

  /** CANARY-STRING scan (eval-integrity sweep): exact substring hits of
    * a small watch-list — benchmark canary GUIDs, license markers,
    * known PII seeds — reported per (document, canary) with hit count
    * and first offset. Occurrence counting is the replace-length
    * identity (no regex, so patterns need no escaping and the count
    * semantics — non-overlapping left-to-right — are engine-portable).
    * One narrow scan with a |canaries|-way per-row expansion; no
    * shuffle at all, whatever the corpus size.
    */
  def textCanaryScan(s: SparkSession, dir: String,
      canaries: Seq[String] = DefaultCanaries): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        posexplode(array(canaries.map(lit): _*)).as(Seq("canary_id", "canary")))
      .select(col("doc_id"), col("canary_id").cast("long").as("canary_id"),
        col("canary"),
        ((length(col("text"))
          - length(expr("replace(text, canary, '')")))
          / length(col("canary"))).cast("long").as("n_hits"),
        expr("instr(text, canary)").cast("long").as("first_pos"))
      .where(col("n_hits") > 0)

  def textLangId(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val scores = langMarkers.map { case (l, _) =>
      l -> langScore(col("text"), l) }.toMap
    d.select(col("doc_id") +: col("lang").as("labeled_lang") +:
      langMarkers.map { case (l, _) => scores(l).as(s"s_$l") } :+
      langPredict(scores).as("predicted_lang"): _*)
  }

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      fingerprint(col("text")).as("fingerprint"))

  /** Exact dedup: cluster by canonical-form fingerprint; keep the min
    * doc_id per cluster. One shuffle on the 128-bit fingerprint — the
    * canonical exact-dedup plan at any scale.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val f = Tables.documents(s, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
    val clusters = f.groupBy("fp")
      .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("keeper_id"))
    f.join(clusters, Seq("fp"))
      .select(col("doc_id"), col("fp"), col("cluster_size"),
        (col("doc_id") === col("keeper_id")).as("is_keeper"))
  }

  /** Bloom-filter reference-corpus dedup — the pre-filter a pipeline runs
    * BEFORE any expensive dedup when a new crawl lands against an already
    * curated corpus: build a Bloom bitset over the reference half's
    * canonical fingerprints, then probe every incoming doc and flag the
    * maybe-duplicates (zero false negatives; false positives go to the
    * exact/near-dup stages).
    *
    * All hashing is plain POSITIVE BIGINT arithmetic both engines share:
    * h1/h2 are disjoint 15-hex-digit slices of the md5 fingerprint
    * (< 2^60), probe i lands at (h1 + i·(h2|1)) mod 2^bitsLog2
    * (Kirsch-Mitzenmacher double hashing; |1 keeps the stride odd) — the
    * largest intermediate is < 2^63, so no wraparound exists to get
    * wrong, and the oracle can check MEMBERSHIP SEMANTICS definitionally
    * (a probe hits iff its bit position appears in the reference
    * position set) without replaying the bitset.
    *
    * Scale shape: the filter itself is a ≤ 2^bitsLog2/64-row
    * (word, bits) digest built by a map-side-combinable `bit_or` — the
    * mergeable-sketch discipline, same as HLL registers — then BROADCAST
    * to the probe side: per incoming doc the cost is k codegen'd hashes
    * and a hash-join against the digest; the reference corpus is
    * re-read never, shuffled never.
    */
  def bloomRefDedup(s: SparkSession, dir: String, bitsLog2: Int = 16,
      k: Int = 7): DataFrame = {
    val docs = Tables.documents(s, dir)
    bloomProbe(bloomCandidates(docs), bloomWordBits(docs, bitsLog2, k),
      bitsLog2, k)
  }

  /** The derived incoming batch the prefilter gates on: every fifth doc
    * re-delivered under a new id (TRUE duplicates — each must flag
    * maybe_dup, the filter's zero-false-negative contract), plus a
    * salted near-copy cohort whose fingerprints are novel (flagged only
    * at the Bloom false-positive rate). The corpus itself has no exact
    * duplicates, so without this derivation the gate would never
    * exercise a positive.
    *
    * Cohort ids are collision-proof NEGATIVES — dup −(2·id)−1 (odd),
    * salted −(2·id)−2 (even): injective, mutually disjoint, and
    * disjoint from every non-negative corpus id at ANY corpus size (an
    * additive offset would silently conflate probe groups once corpus
    * ids reach the offset).
    */
  def bloomCandidates(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 5 === 0)
      .select((-col("doc_id") * 2L - 1L).as("doc_id"), col("text"))
      .unionAll(docs.where(col("doc_id") % 5 === 1)
        .select((-col("doc_id") * 2L - 2L).as("doc_id"),
          concat(col("text"), lit(" ~"), col("doc_id")).as("text")))

  /** The k distinct probe positions of a doc's canonical fingerprint. */
  private def bloomPositions(k: Int, bitsLog2: Int): Column = {
    val m = 1L << bitsLog2
    val h1 = expr("CAST(conv(substring(fp, 1, 15), 16, 10) AS BIGINT)")
    val h2 = expr("CAST(conv(substring(fp, 16, 15), 16, 10) AS BIGINT) | 1")
    array_distinct(transform(sequence(lit(0), lit(k - 1)),
      i => (h1 + i.cast("long") * h2) % m))
  }

  /** The Bloom bitset as a ≤ 2^bitsLog2/64-row (w, bits) word digest —
    * built by a map-side-combinable `bit_or`, so partials from any
    * batching fold to the identical digest (the property the
    * incremental replay gates).
    */
  def bloomWordBits(refDocs: DataFrame, bitsLog2: Int, k: Int): DataFrame =
    bloomWordBitsOfPartials(
      refDocs.select(fingerprint(col("text")).as("fp"))
        .select(explode(bloomPositions(k, bitsLog2)).as("pos"))
        .select((col("pos") / lit(64)).cast("long").as("w"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            .as("bits")))

  /** Fold (w, bits) partial rows into the final word digest. */
  def bloomWordBitsOfPartials(partials: DataFrame): DataFrame =
    partials.groupBy(col("w")).agg(expr("bit_or(bits)").as("bits"))

  /** Probe each candidate doc's k positions against the broadcast word
    * digest: (doc_id, n_probes, n_set, maybe_dup).
    */
  def bloomProbe(candDocs: DataFrame, wordBits: DataFrame,
      bitsLog2: Int, k: Int): DataFrame = {
    val probes = candDocs
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .select(col("doc_id"), explode(bloomPositions(k, bitsLog2)).as("pos"))
      .select(col("doc_id"), (col("pos") / lit(64)).cast("long").as("w"),
        (col("pos") % 64).cast("int").as("b"))
    probes.join(broadcast(wordBits), Seq("w"), "left")
      .select(col("doc_id"),
        coalesce(expr("(bits >> b) & 1"), lit(0L)).as("hit"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_probes"), sum(col("hit")).as("n_set"))
      .withColumn("maybe_dup", col("n_set") === col("n_probes"))
  }

  /** Mode frequency and distinct count of an array in ONE fold over its
    * SORTED form: equal values are adjacent after the sort, so the longest
    * run length IS the most-frequent-element count. A single codegen'd
    * `aggregate` per row — no token explode, no shuffle. The accumulator
    * seeds `prev` with NULL (null-safe `<=>` makes the first element start
    * a fresh run) because an empty document tokenizes to `[""]` and a ""
    * sentinel would silently merge with it.
    */
  private def modeAndDistinct(sorted: Column): Column = {
    val init = struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"), lit(0L).as("nd"))
    aggregate(sorted, init, (acc, x) => {
      val run = when(acc.getField("prev") <=> x, acc.getField("run") + 1L)
        .otherwise(lit(1L))
      struct(x.as("prev"), run.as("run"),
        greatest(acc.getField("best"), run).as("best"),
        (acc.getField("nd") +
          when(acc.getField("prev") <=> x, 0L).otherwise(1L)).as("nd"))
    })
  }

  /** Repetition-based quality stats (the Gopher-rule family): duplicate
    * word fraction, most-frequent-word fraction, most-frequent-bigram
    * fraction, and the keep/drop gate over them. Highly repetitive
    * documents (boilerplate, keyword stuffing, generation loops) are the
    * classic training-data poison these filters exist to drop.
    *
    * Everything is a pure narrow column map — per-document sort + fold
    * inside whole-stage codegen, NO token explode and NO shuffle (the
    * explode+groupBy formulation shuffles every token of a 100 TB corpus;
    * this reads and writes one row per document at scan speed). Fractions
    * are single double divisions of exact integer counts, so the DuckDB
    * oracle (which MAY afford the unnest+GROUP BY form at test scale)
    * reproduces them bit-identically.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    // null text → no stats row (same contract as minhashSignatures, and
    // what the oracle's unnest-based formulation computes: a null token
    // array contributes no rows, so the doc is absent on both sides)
    val tk = split(trim(col("text")), "\\s+")
    val bigrams = zip_with(
      slice(col("tk"), lit(1), size(col("tk")) - 1),
      slice(col("tk"), lit(2), size(col("tk")) - 1),
      (a, b) => concat(a, lit(" "), b))
    val nTok = size(col("tk")).cast("long")
    val nBig = size(col("bg")).cast("long")
    val w = modeAndDistinct(array_sort(col("tk")))
    val b = modeAndDistinct(array_sort(col("bg")))
    val dupFrac = lit(1.0) -
      col("w").getField("nd").cast("double") / col("n_tokens")
    val topWordFrac = col("w").getField("best").cast("double") / col("n_tokens")
    val topBigramFrac =
      col("b").getField("best").cast("double") / nullif(col("n_bigrams"), lit(0L))
    Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"), tk.as("tk"))
      .withColumn("bg", bigrams)
      .select(col("doc_id"), nTok.as("n_tokens"), nBig.as("n_bigrams"),
        w.as("w"), b.as("b"))
      .select(col("doc_id"), col("n_tokens"), col("n_bigrams"),
        dupFrac.as("dup_word_frac"),
        topWordFrac.as("top_word_frac"),
        topBigramFrac.as("top_bigram_frac"))
      .withColumn("gopher_keep",
        !(col("dup_word_frac") > 0.55 || col("top_bigram_frac") > 0.05))
  }

  /** CORPUS-level boilerplate signal (the cross-document complement of
    * [[textRepetition]]'s within-document fractions): for each document,
    * the fraction of its DISTINCT word-trigram phrases that are
    * corpus-frequent — i.e. appear in at least `minDocs` distinct
    * documents. Repeated navigation chrome, license headers, and
    * templated spans score high; the CCNet/RefinedWeb-style cleanups
    * drop or down-weight such documents before training.
    *
    * Shape at 100 TB: shingling is a narrow per-row map; the document
    * frequency table is one map-side-combined groupBy on the shingle;
    * per-doc scoring is a left join of the exploded shingles against the
    * FREQUENT subset (df >= minDocs — orders of magnitude smaller than
    * the full df table) followed by a per-doc count. Two shuffles on the
    * shingle string, one on doc_id — no driver state, no all-pairs work.
    * The exploded relation feeds both the df aggregation and the scoring
    * join; it is memoized as scratch parquet (the TfIdf.tfCached idiom —
    * a `.persist` held past the query would leak executor memory) so the
    * documents scan + shingling runs once per (dir), not twice per call.
    */
  def textBoilerplate(s: SparkSession, dir: String,
      minDocs: Long = 5L): DataFrame = {
    val docSh = docShinglesCached(s, dir)
    val frequent = docSh.groupBy(col("sh"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocs)
      .select(col("sh"), lit(1).as("__b"))
    docSh.join(frequent, Seq("sh"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__b")).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_shingles"))
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal runs of non-stopword tokens; a word scores degree/freq
    * within its document (degree = Σ phrase length over its
    * occurrences — co-occurrence weight), a phrase scores the sum of
    * its member-occurrence word scores, top-k phrases per doc win. The
    * word score is micro-scaled INTEGER division (degree·10⁶ div freq)
    * so every score is an exact long and the phrase sum is
    * shuffle-order-proof — RAKE-faithful to 1e-6 and hash-gateable.
    *
    * Scale shape: one shuffle to the per-doc token order (the window
    * that finds the runs), then co-partitioned (doc, word) joins; no
    * corpus-global state at all — the per-doc work is bounded by doc
    * length, the classic embarrassingly-parallel text-analysis shape.
    */
  def textRakeKeywords(s: SparkSession, dir: String,
      topK: Int = 3): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it",
      "for", "on")
    val toks = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(split(normText(col("text")), " ")).as(Seq("pos", "w")))
      .where(col("w") =!= "")
    val wIsl = Window.partitionBy("doc_id").orderBy("pos")
    val runs = toks.where(!col("w").isInCollection(stop))
      .withColumn("grp", col("pos") - row_number().over(wIsl))
    val members = runs.withColumn("plen",
      count(lit(1)).over(Window.partitionBy("doc_id", "grp")))
    val wordStats = members.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
      .withColumn("score_u", expr("(degree * 1000000) div freq"))
      .select(col("doc_id"), col("w"), col("score_u"))
    val phrases = members
      .join(wordStats, Seq("doc_id", "w"))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w"))).as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("score_u")).as("score_u"))
    val wTop = Window.partitionBy("doc_id")
      .orderBy(col("score_u").desc, col("phrase").asc)
    phrases.withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= topK)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("phrase"), col("n_words"), col("score_u"))
  }

  /** WINNOWING FINGERPRINTS (Schleimer, Wilkerson, Aiken 2003 — the
    * MOSS primitive): from the rolling hashes of a document's word
    * trigrams, every window of `w` consecutive hashes contributes its
    * RIGHTMOST MINIMUM; the distinct selected (pos, hash) pairs are
    * the fingerprint. The guarantee that makes this the local-dedup
    * standard: any shared run of ≥ w+2 tokens between two documents
    * shares at least one fingerprint, while density stays ~2/(w+1).
    * The rightmost-argmin is genuinely windowed (no prefix-min
    * shortcut reproduces it — a middle window can select a position
    * neither edge window does), so each hash expands to its ≤w member
    * windows (bounded fan-out Generate) and one row_number per (doc,
    * window) picks the winner — a shuffle on doc_id only. Documents
    * shorter than w+2 tokens collapse to a single window; documents
    * under 3 tokens have no trigrams and emit nothing.
    */
  def textWinnowing(s: SparkSession, dir: String, w: Int = 4): DataFrame = {
    val tk = split(normText(col("text")), " ")
    val len = greatest(size(col("tk")) - 2, lit(0))
    val tri = zip_with(
      slice(col("tk"), lit(1), len),
      zip_with(slice(col("tk"), lit(2), len), slice(col("tk"), lit(3), len),
        (b, c) => concat(b, lit(" "), c)),
      (a, bc) => concat(a, lit(" "), bc))
    val hashed = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"), tk.as("tk"))
      .select(col("doc_id"), posexplode(tri).as(Seq("pos", "sh")),
        (size(col("tk")) - 2).as("nk"))
      .select(col("doc_id"), col("pos"), col("nk"),
        graft.functions.RollingHash64(col("sh")).as("h"))
    val expanded = hashed.select(col("doc_id"), col("pos"), col("h"),
      explode(sequence(
        greatest(col("pos") - lit(w - 1), lit(0)),
        least(col("pos"), greatest(col("nk") - lit(w), lit(0))))).as("j"))
    val rw = Window.partitionBy("doc_id", "j")
      .orderBy(col("h").asc, col("pos").desc)
    expanded.withColumn("rn", row_number().over(rw)).where(col("rn") === 1)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("h").as("fp_hash"))
      .distinct()
  }

  /** NEAR-DUP pairs over the winnowing fingerprints — what the
    * fingerprints exist for: two documents sharing ≥ `minShared`
    * distinct selected hashes share that many winnowed local runs.
    * Candidate pairs form ONLY through the inverted-index join on the
    * fingerprint (df-capped like every sibling); Jaccard is the exact
    * rational over the distinct fingerprint sets. Complements
    * MinHash (whole-document resemblance) with LOCAL overlap
    * sensitivity — a long shared passage inside otherwise-different
    * documents still pairs here.
    */
  def winnowingNearDup(s: SparkSession, dir: String,
      maxDocsPerHash: Int = 100, minShared: Int = 2): DataFrame = {
    // the fingerprint digest is referenced four times below (df cap,
    // sizes, both self-join sides) — checkpoint it so the winnowing
    // pipeline (trigram explode + per-window argmin) runs ONCE per
    // invocation, not once per reference; ~2/(w+1) density keeps the
    // digest corpus-digest-sized
    val fh = textWinnowing(s, dir)
      .select(col("doc_id"), col("fp_hash")).distinct()
      .localCheckpoint()
    val capped = fh.join(
      fh.groupBy(col("fp_hash")).agg(count(lit(1)).as("df"))
        .where(col("df") <= maxDocsPerHash).select(col("fp_hash")),
      Seq("fp_hash"))
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val pairs = capped.select(col("doc_id").as("doc_a"), col("fp_hash"))
      .join(capped.select(col("doc_id").as("doc_b"), col("fp_hash")),
        Seq("fp_hash"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_fp").as("na")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_fp").as("nb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        (col("n_shared").cast("double")
          / (col("na") + col("nb") - col("n_shared")).cast("double"))
          .as("jaccard"))
  }

  /** SECRET/CREDENTIAL scan — the leak sweep a training corpus runs
    * next to the PII scrub: per document, counts of hex-API-key-shaped
    * tokens (32-hex runs) and AWS-access-key-shaped tokens
    * (`AKIA` + 16 uppercase alnum), plus the flag. Conservative regex
    * syntax only (character classes + brace quantifiers — identical
    * semantics in Java and RE2 engines, non-overlapping counts). The
    * gate composes the detector with a deterministic TAINT fixture
    * (the synthetic corpus contains no credential-shaped strings, so a
    * detector over the raw text has no live positive branch — the same
    * stand-in role the derived video corpus plays): docs with
    * `doc_id % 7 == 3` carry an appended `sk_<md5-hex>` key, docs with
    * `doc_id % 11 == 5` an `AKIA…` key, both pure functions of the id
    * the oracle replays. One narrow codegen'd scan, no shuffle.
    */
  def textSecretScan(s: SparkSession, dir: String): DataFrame = {
    val tainted = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 7 === 3,
          concat(lit(" sk_"), md5(col("doc_id").cast("string"))))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 5,
          concat(lit(" AKIA"), upper(substring(
            md5(concat(lit("aws"), col("doc_id").cast("string"))), 1, 16))))
          .otherwise(lit(""))).as("text"))
    tainted
      .select(col("doc_id"),
        regexp_count(col("text"), lit("[0-9a-f]{32}")).cast("long")
          .as("n_hex32"),
        regexp_count(col("text"), lit("AKIA[0-9A-Z]{16}")).cast("long")
          .as("n_awskey"))
      .withColumn("has_secret", col("n_hex32") > 0 || col("n_awskey") > 0)
  }

  /** BIGRAM LANGUAGE-MODEL table — the count-based n-gram LM that
    * backs perplexity filters and KenLM-style scoring: for the
    * `nContexts` most frequent contexts w1 (by continuation
    * occurrences), the top `k` continuations w2 with exact pair and
    * context counts and the conditional `p_next = pair/ctx` (a single
    * IEEE division of exact integers — bit-identical in any engine, no
    * rounding step needed). Smoothing/backoff ride on these counts
    * downstream; the counts ARE the model.
    *
    * Scale shape: bigram expansion is a narrow Generate (posexplode +
    * element_at — no per-doc array rebuild, no shuffle); then ONE
    * map-side-combinable groupBy on (w1, w2). Context totals fold from
    * the bigram DIGEST (vocabulary², not corpus, and in practice the
    * seen-bigram count), never re-scanning the corpus; both rankings
    * are WindowGroupLimit top-k over digests.
    */
  def textBigramLm(s: SparkSession, dir: String, nContexts: Int = 50,
      k: Int = 3): DataFrame =
    bigramLmFromCounts(
      bigramPairs(Tables.documents(s, dir))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("pair_count")),
      nContexts, k)

  /** The narrow bigram expansion (posexplode + element_at, no shuffle). */
  private def bigramPairs(docs: DataFrame): DataFrame = {
    val tk = split(lower(trim(col("text"))), "\\s+")
    docs.where(col("text").isNotNull)
      .select(tk.as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "w1")), col("tk"))
      .where(col("pos") < size(col("tk")) - 1)
      .select(col("w1"), element_at(col("tk"), col("pos") + 2).as("w2"))
  }

  /** Context ranking + top continuations from a (w1, w2, pair_count)
    * relation — shared by the one-shot gate and the incremental fold,
    * which must reproduce it bit for bit.
    */
  private def bigramLmFromCounts(bc: DataFrame, nContexts: Int,
      k: Int): DataFrame = {
    val cc = bc.groupBy(col("w1")).agg(sum(col("pair_count")).as("ctx_count"))
    val topCtx = cc.withColumn("cr", row_number().over(
        Window.orderBy(col("ctx_count").desc, col("w1").asc)))
      .where(col("cr") <= nContexts).drop("cr")
    val rankW = Window.partitionBy("w1")
      .orderBy(col("pair_count").desc, col("w2").asc)
    bc.join(topCtx, Seq("w1"))
      .withColumn("rank", row_number().over(rankW))
      .where(col("rank") <= k)
      .select(col("w1"), col("w2"), col("rank").cast("long").as("rank"),
        col("pair_count"), col("ctx_count"),
        (col("pair_count").cast("double") / col("ctx_count").cast("double"))
          .as("p_next"))
  }

  /** Batch half of INCREMENTAL bigram-LM maintenance: append this
    * batch's (w1, w2) partial counts — O(batch), LSM shape,
    * batchId-idempotent. Counts are the model, and counts fold, so the
    * maintained table equals the one-shot under any batching.
    */
  def appendBigramBatch(s: SparkSession, countsDir: String,
      batch: DataFrame, batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$countsDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    graft.util.BatchAppend.append(
      bigramPairs(batch)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("pair_count")),
      s"$countsDir/partials", batchId)
    marker.foreach { case (fs, p) =>
      fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  /** Report half: fold the partial counts and rank — must equal the
    * one-shot [[textBigramLm]] bit for bit.
    */
  def bigramLmFromPartials(s: SparkSession, countsDir: String,
      nContexts: Int = 50, k: Int = 3): DataFrame =
    bigramLmFromCounts(
      s.read.parquet(s"$countsDir/partials")
        .groupBy(col("w1"), col("w2"))
        .agg(sum(col("pair_count")).as("pair_count")),
      nContexts, k)

  /** N-GRAM DIVERSITY per language — the self-repetition metric a
    * synthetic-data pipeline watches (mode-collapsed generations reuse
    * the same trigrams; diverse corpora don't): per lang, total word-
    * trigram occurrences, distinct trigrams, and the type-token ratio
    * over trigrams. Exact integer counts; the ratio is one IEEE
    * division. Two map-side-combinable aggregations over the trigram
    * relation (the distinct leg shuffles on (lang, trigram) — the
    * blocking key, never all-pairs).
    */
  def textNgramDiversity(s: SparkSession, dir: String): DataFrame = {
    val tk = split(trim(col("text")), "\\s+")
    val len = greatest(size(col("tk")) - 2, lit(0))
    val tri = zip_with(
      slice(col("tk"), lit(1), len),
      zip_with(slice(col("tk"), lit(2), len), slice(col("tk"), lit(3), len),
        (b, c) => concat(b, lit(" "), c)),
      (a, bc) => concat(a, lit(" "), bc))
    val occ = Tables.documents(s, dir)
      .where(col("text").isNotNull)
      .select(col("lang"), tk.as("tk"))
      .select(col("lang"), explode(tri).as("sh"))
    val totals = occ.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_trigrams"))
    val distincts = occ.distinct()
      .groupBy(col("lang")).agg(count(lit(1)).as("n_distinct"))
    totals.join(distincts, Seq("lang"))
      .select(col("lang"), col("n_trigrams"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_trigrams").cast("double"))
          .as("diversity"))
  }

  private val shinglePaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Scratch-parquet memo of each doc's DISTINCT word trigrams, one
    * (doc_id, sh) row each — shared by the df aggregation and the
    * scoring join of [[textBoilerplate]].
    */
  private def docShinglesCached(s: SparkSession, dir: String): DataFrame = {
    val path = shinglePaths.computeIfAbsent(dir, _ => {
      val p = graft.util.Scratch.dir("graft_boiler_sh").resolve("sh").toString
      val tk = split(trim(col("text")), "\\s+")
      // the three staggered slices zip into the doc's word trigrams
      val len = greatest(size(col("tk")) - 2, lit(0))
      val tri = zip_with(
        slice(col("tk"), lit(1), len),
        zip_with(slice(col("tk"), lit(2), len), slice(col("tk"), lit(3), len),
          (b, c) => concat(b, lit(" "), c)),
        (a, bc) => concat(a, lit(" "), bc))
      Tables.documents(s, dir)
        .where(col("text").isNotNull)
        .select(col("doc_id"), tk.as("tk"))
        .select(col("doc_id"), explode(array_distinct(tri)).as("sh"))
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }
}
