package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StructField, StructType}

import graft.model.Tables

/** In-engine trained linear document classifier over hashed bag-of-words
  * features — the fasttext-shaped component every large-corpus curation
  * pipeline keeps near its quality/language gates (the reference has no
  * model training at all; this is the LLM-pipeline extension surface).
  * Training IS a query here: feature extraction, every gradient step,
  * and the final scores run as Spark jobs, and the whole procedure is
  * bit-reproducible so the DuckDB gate replays TRAINING itself, not just
  * an inference pass.
  *
  * What makes distributed training hash-exact across engines:
  *
  *   - **Fixed-point features and margins.** x = tokenCount/docTokens is
  *     quantized to x_u = floor(x·2^20 + 0.5) (half-up on doubles — the
  *     validated portable rounding); weights live as longs in the same
  *     2^-20 grid; a doc's margin Σ x_u·w_u is EXACT INTEGER arithmetic,
  *     so the cross-row sums that a shuffle reorders never touch a
  *     float. (A double dot product here would make training depend on
  *     aggregation order — the cross-row float SUM trap.)
  *   - **A correctly-rounded link.** The logistic σ needs exp(), whose
  *     last-ulp behavior differs between libm implementations; the
  *     softsign link p = ½ + ½·m/(1+|m|) uses only IEEE add/mul/div/abs
  *     — correctly rounded by spec — so both engines compute the same
  *     residual doubles from the same integer margins. σ and softsign
  *     are interchangeable as GD links (same sign structure, same
  *     fixed-point decision rule p ≥ ½ ⟺ m ≥ 0).
  *   - **Quantized gradient partials.** Each feature row contributes
  *     g_u = floor(r·x_u + 0.5) as a long; per-bucket sums are exact and
  *     order-free, and the weight step w_u ← w_u − floor(η·G_u/N + 0.5)
  *     (η = ½, a binary power) is one double expression on identical
  *     operands.
  *
  * Scale shape: the feature relation is |docs|×(distinct hashed tokens)
  * rows, shuffled once on doc_id per iteration for margins and once on
  * bucket for gradients (both map-side combinable); the driver holds
  * only the (d+1)-long weight vector per iteration — the k-means-
  * centroid lineage-cut pattern. Hashing is the codegen'd RollingHash64
  * per token into d = 32 buckets (d | 2^64, so the signed-vs-unsigned
  * residue agrees across engines) plus a bias feature at index d.
  */
object QualityClassifier {

  val Dim: Int = 32
  val Scale: Double = 1048576.0           // 2^20
  val ScaleSq: Double = 1099511627776.0   // 2^40
  val DefaultIters: Int = 4

  /** (doc_id, bucket, x_u) fixed-point hashed features + the bias row
    * per doc. Tokenization matches the corpus vocabulary queries:
    * whitespace split of lower(trim(text)).
    */
  def features(docs: DataFrame): DataFrame = {
    val toks = docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
    val cnt = toks
      .select(col("doc_id"),
        pmod(graft.functions.RollingHash64(col("tok")), lit(Dim.toLong))
          .cast("int").as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))
    val nt = cnt.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
    val xs = cnt.join(nt, "doc_id")
      .select(col("doc_id"), col("bucket"),
        floor(col("c").cast("double") / col("n").cast("double") * lit(Scale)
          + lit(0.5)).cast("long").as("xu"))
    val bias = nt.select(col("doc_id"), lit(Dim).as("bucket"),
      lit(Scale.toLong).as("xu"))
    xs.unionByName(bias)
  }

  /** 0/1 labels from the language column (the language-ID training
    * task; any deterministic labeling column works the same way).
    */
  def labels(docs: DataFrame, posLang: String): DataFrame =
    docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        when(col("lang") === posLang, lit(1.0)).otherwise(lit(0.0)).as("y"))

  /** The exact-integer margin frame for a weight vector: doc_id, m_u
    * (Σ x_u·w_u — overflow-safe: |x_u| ≤ 2^20, |w_u| bounded by the
    * step rule, ≤ 33 terms).
    */
  private def margins(feats: DataFrame, w: Array[Long]): DataFrame = {
    val s = feats.sparkSession
    val wdf = s.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        w.toSeq.zipWithIndex.map { case (v, j) => Row(j, v) }).asJava,
      StructType(Seq(StructField("bucket", IntegerType, nullable = false),
        StructField("wu", LongType, nullable = false))))
    feats.join(broadcast(wdf), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("xu") * col("wu")).as("mu"))
  }

  /** Softsign residual r = p − y from the integer margin. */
  private def residual(mu: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val m = mu.cast("double") / lit(ScaleSq)
    (lit(0.5) + lit(0.5) * m / (lit(1.0) + abs(m))) - y
  }

  /** Train: full-batch fixed-point gradient descent, η = ½, w_0 = 0.
    * Returns the weight vector after `iters` steps. One margins job +
    * one gradient job per iteration; driver state = d+1 longs.
    */
  def train(feats: DataFrame, labs: DataFrame,
      iters: Int = DefaultIters): Array[Long] = {
    val f = feats.localCheckpoint(true) // reused 2·iters times: cut lineage
    val l = labs.localCheckpoint(true)
    val n = l.count()
    val w = Array.fill(Dim + 1)(0L)
    for (_ <- 0 until iters) {
      val g = f.join(margins(f, w).join(l, "doc_id")
          .select(col("doc_id"), residual(col("mu"), col("y")).as("r")),
          "doc_id")
        .groupBy(col("bucket"))
        .agg(sum(floor(col("r") * col("xu").cast("double") + lit(0.5))
          .cast("long")).as("gu"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      for (j <- 0 to Dim) {
        val gu = g.getOrElse(j, 0L)
        w(j) = w(j) - math.floor(0.5 * (gu.toDouble / n.toDouble) + 0.5).toLong
      }
    }
    w
  }

  /** Per-JVM memo of trained weight vectors: training is a persisted
    * artifact reused by every downstream search/score — the trained-
    * centroids pattern; a production deployment writes the (d+1)-row
    * table and loads it, it does not retrain per query.
    */
  private val weightCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), Array[Long]]

  def trained(s: SparkSession, dir: String, posLang: String,
      iters: Int): Array[Long] =
    weightCache.computeIfAbsent((dir, posLang, iters), _ => {
      val docs = Tables.documents(s, dir)
      train(features(docs), labels(docs, posLang), iters)
    })

  /** The canonical (feature, weight_u) frame for a weight vector — the
    * ONE schema the oracles key on, shared by the one-shot gate and the
    * incremental replay so the two can never drift.
    */
  def weightFrame(s: SparkSession, w: Array[Long]): DataFrame =
    s.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        w.toSeq.zipWithIndex.map { case (v, j) => Row(j, v) }).asJava,
      StructType(Seq(StructField("feature", IntegerType, nullable = false),
        StructField("weight_u", LongType, nullable = false))))

  /** The trained weight table (feature, weight_u) for `dir`'s documents
    * — the gate's replayed-training artifact.
    */
  def trainedWeights(s: SparkSession, dir: String,
      posLang: String = "en", iters: Int = DefaultIters): DataFrame =
    weightFrame(s, trained(s, dir, posLang, iters))

  /** Inference over the trained model: exact integer margin per doc and
    * the fixed-point decision p ≥ ½ ⟺ m_u ≥ 0 — no floats in the
    * decision at all. Emits (doc_id, margin_u, predicted, y).
    */
  def scores(s: SparkSession, dir: String, posLang: String = "en",
      iters: Int = DefaultIters): DataFrame = {
    val docs = Tables.documents(s, dir)
    scoredWith(docs, trained(s, dir, posLang, iters), posLang)
  }

  /** Train on `docs` and score them (no memo — spec/experiment path). */
  def scoresFrom(docs: DataFrame, posLang: String,
      iters: Int = DefaultIters): DataFrame =
    scoredWith(docs,
      train(features(docs), labels(docs, posLang), iters), posLang)

  private def scoredWith(docs: DataFrame, w: Array[Long],
      posLang: String): DataFrame =
    margins(features(docs), w).join(labels(docs, posLang), "doc_id")
      .select(col("doc_id"), col("mu").as("margin_u"),
        (col("mu") >= 0L).as("predicted"), col("y").cast("int").as("y"))

  /** EXACT ROC-AUC of the trained margins via the Mann-Whitney rank
    * form — the threshold-free eval completing the classifier family
    * (weights → scores → calibration → AUC). Ties handled exactly by
    * staying in the DOUBLED-U integer space:
    *   2U = Σ_{pos i, neg j} (2·1{m_i > m_j} + 1{m_i = m_j}),
    * computed distributively as Σ over margin groups of
    * p·(2·negatives_strictly_below + negatives_equal) — one grouped
    * count plus one ordered prefix sum over the ≤|distinct margins|
    * digest (at warehouse scale the prefix sum swaps to the repo's
    * two-pass distributed form, the packing recipe; the arithmetic is
    * unchanged). AUC = 2U / (2·P·N), the one double division.
    */
  def aucReport(s: SparkSession, dir: String, posLang: String = "en",
      iters: Int = DefaultIters): DataFrame = {
    val sc = scores(s, dir, posLang, iters)
      .select(col("margin_u").as("m"), col("y").cast("long").as("y"))
    val g = sc.groupBy(col("m"))
      .agg(sum(col("y")).as("p"), (count(lit(1)) - sum(col("y"))).as("q"))
    val w = g.withColumn("below",
      sum(col("q")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("m"))) - col("q"))
    w.agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"),
        sum(col("p") * (lit(2L) * col("below") + col("q"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        (col("u2").cast("double")
          / (lit(2.0) * col("n_pos").cast("double")
            * col("n_neg").cast("double"))).as("auc"))
  }

  /** CALIBRATION table over the trained model's margins — the ML-eval
    * view a curation pipeline reads before trusting a learned quality
    * filter: documents bucketed into margin deciles, per-bucket positive
    * rate. Monotone pos_rate across buckets = the margin actually ranks
    * quality. Decile BOUNDS come from one percentile aggregate over the
    * exact integer margins (the RFM recipe — never a global ntile sort:
    * bounds are a 9-number broadcast however large the corpus) and each
    * doc buckets by counting bounds its margin strictly exceeds; counts
    * and positives are exact integers, so the oracle replays training,
    * margins, bounds, and the bucketing end to end.
    */
  def calibrationTable(s: SparkSession, dir: String,
      posLang: String = "en", iters: Int = DefaultIters): DataFrame = {
    val sc = scores(s, dir, posLang, iters)
    val bounds = sc.agg(
      percentile(col("margin_u"),
        typedlit((1 to 9).map(_ / 10.0))).as("bs"))
    val bucket = (0 until 9).map(i =>
      when(col("margin_u").cast("double") > element_at(col("bs"), i + 1),
        lit(1)).otherwise(lit(0))).reduce(_ + _)
    sc.crossJoin(broadcast(bounds))
      .select(bucket.cast("long").as("bucket"), col("y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).cast("long").as("n_pos"))
      .select(col("bucket"), col("n_docs"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_docs").cast("double"))
          .as("pos_rate"))
  }
}
