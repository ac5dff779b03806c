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
    * pack it started in rather than splitting); it needs ONE window
    * cumsum per language partition, so packing a 100 TB corpus is a
    * single sort-shuffle, not a sequential driver loop. Token counts use
    * the same whitespace tokenizer as text_stats (oracle-proven).
    */
  def packSequences(s: SparkSession, dir: String,
      budgetTokens: Int = 512): DataFrame = {
    val toks = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("start_tok") / lit(budgetTokens)).cast("long").as("pack_id"))
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
}
