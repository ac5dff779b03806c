package graft.oracle

import graft.text.QualityClassifier

/** DuckDB-SQL replay of QualityClassifier's ENTIRE training procedure —
  * feature hashing, every fixed-point gradient-descent step, and the
  * final margins — so the gate verifies distributed model TRAINING
  * value-exactly, the way the BPE and PageRank oracles replay theirs.
  *
  * Why this replays bitwise (mirrors QualityClassifier's contract):
  * integer margins and gradient sums (order-free), a correctly-rounded
  * softsign link instead of libm exp(), and half-up quantization on
  * doubles at every float→int boundary. Each iteration unrolls to four
  * chained CTEs (margins → residuals → gradient sums → weight step).
  */
object ClassifierOracleSql {

  private val Dim = QualityClassifier.Dim
  private val S = QualityClassifier.Scale      // 2^20
  private val S2 = QualityClassifier.ScaleSq   // 2^40

  /** Per-token rolling hash (the RollingHash64 fold) over UTF-8 bytes as
    * unsigned HUGEINT; bucket = hu % Dim agrees with Spark's
    * pmod(signed, Dim) because Dim divides 2^64.
    */
  private def baseCtes(posLang: String): String =
    s"""toks AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents WHERE text IS NOT NULL
       |), tk AS (
       |  SELECT doc_id, tok, hex(encode(tok)) AS hx,
       |    octet_length(encode(tok)) AS len
       |  FROM toks WHERE length(tok) > 0
       |), th AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend(CAST(1125899906842597 AS HUGEINT),
       |        list_transform(range(0, len), j ->
       |          CAST(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
       |               + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
       |               AS HUGEINT))),
       |      (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT) AS hu
       |  FROM tk
       |), cnt AS (
       |  SELECT doc_id, CAST(hu % $Dim AS INT) AS bucket, count(*) AS c
       |  FROM th GROUP BY 1, 2
       |), nt AS (
       |  SELECT doc_id, sum(c) AS n FROM cnt GROUP BY 1
       |), fx AS (
       |  SELECT doc_id, bucket,
       |    CAST(floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) * $S + 0.5)
       |         AS BIGINT) AS xu
       |  FROM cnt JOIN nt USING (doc_id)
       |  UNION ALL
       |  SELECT doc_id, $Dim AS bucket, ${S.toLong} AS xu FROM nt
       |), lab AS (
       |  SELECT doc_id,
       |    CASE WHEN lang = '$posLang' THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents WHERE text IS NOT NULL
       |), nn AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS nd FROM lab
       |), w0 AS (
       |  SELECT CAST(f AS INT) AS bucket, CAST(0 AS BIGINT) AS wu
       |  FROM range(0, ${Dim + 1}) t(f)
       |)""".stripMargin

  /** One GD step: margins with w{k-1}, softsign residuals, quantized
    * gradient sums, the η=½ weight update. Expression shapes copy the
    * Scala ones operand-for-operand.
    */
  private def iterCtes(k: Int): String =
    s""", m$k AS (
       |  SELECT f.doc_id, CAST(sum(f.xu * w.wu) AS BIGINT) AS mu
       |  FROM fx f JOIN w${k - 1} w USING (bucket) GROUP BY 1
       |), r$k AS (
       |  SELECT l.doc_id,
       |    (0.5 + 0.5 * (CAST(m.mu AS DOUBLE) / $S2)
       |           / (1.0 + abs(CAST(m.mu AS DOUBLE) / $S2))) - l.y AS r
       |  FROM lab l JOIN m$k m USING (doc_id)
       |), g$k AS (
       |  SELECT f.bucket,
       |    CAST(sum(CAST(floor(r.r * CAST(f.xu AS DOUBLE) + 0.5) AS BIGINT))
       |         AS BIGINT) AS gu
       |  FROM fx f JOIN r$k r USING (doc_id) GROUP BY 1
       |), w$k AS (
       |  SELECT w.bucket,
       |    CAST(w.wu - CAST(floor(
       |        0.5 * (CAST(coalesce(g.gu, 0) AS DOUBLE) / (SELECT nd FROM nn))
       |        + 0.5) AS BIGINT) AS BIGINT) AS wu
       |  FROM w${k - 1} w LEFT JOIN g$k g USING (bucket)
       |)""".stripMargin

  private def allCtes(posLang: String, iters: Int): String =
    baseCtes(posLang) + (1 to iters).map(iterCtes).mkString

  /** Oracle for cur_classifier_weights: the replayed trained table. */
  def weights(posLang: String = "en",
      iters: Int = QualityClassifier.DefaultIters): String =
    s"""WITH ${allCtes(posLang, iters)}
       |SELECT bucket AS feature, wu AS weight_u FROM w$iters""".stripMargin

  /** Oracle for cur_classifier_scores: final margins + the integer
    * decision rule m_u ≥ 0.
    */
  def scores(posLang: String = "en",
      iters: Int = QualityClassifier.DefaultIters): String =
    s"""WITH ${allCtes(posLang, iters)}, fm AS (
       |  SELECT f.doc_id, CAST(sum(f.xu * w.wu) AS BIGINT) AS mu
       |  FROM fx f JOIN w$iters w USING (bucket) GROUP BY 1
       |)
       |SELECT fm.doc_id, fm.mu AS margin_u, fm.mu >= 0 AS predicted,
       |  CAST(l.y AS INT) AS y
       |FROM fm JOIN lab l USING (doc_id)""".stripMargin

  /** Oracle for cur_classifier_auc: the doubled Mann-Whitney U over the
    * replayed margins — per margin group, p·(2·neg-below + neg-equal),
    * one ordered prefix sum; the single division mirrors the engine's
    * operand order.
    */
  def auc(posLang: String = "en",
      iters: Int = QualityClassifier.DefaultIters): String =
    s"""WITH ${allCtes(posLang, iters)}, fm AS (
       |  SELECT f.doc_id, CAST(sum(f.xu * w.wu) AS BIGINT) AS mu
       |  FROM fx f JOIN w$iters w USING (bucket) GROUP BY 1
       |), sc AS (
       |  SELECT fm.mu AS m, CAST(l.y AS BIGINT) AS y
       |  FROM fm JOIN lab l USING (doc_id)
       |), g AS (
       |  SELECT m, CAST(sum(y) AS BIGINT) AS p,
       |    CAST(count(*) - sum(y) AS BIGINT) AS q
       |  FROM sc GROUP BY 1
       |), wnd AS (
       |  SELECT m, p, q,
       |    CAST(sum(q) OVER (ORDER BY m) - q AS BIGINT) AS below
       |  FROM g
       |)
       |SELECT CAST(sum(p) AS BIGINT) AS n_pos,
       |  CAST(sum(q) AS BIGINT) AS n_neg,
       |  CAST(sum(p * (2 * below + q)) AS BIGINT) AS u2,
       |  CAST(sum(p * (2 * below + q)) AS DOUBLE)
       |    / (2.0 * CAST(sum(p) AS DOUBLE) * CAST(sum(q) AS DOUBLE)) AS auc
       |FROM wnd""".stripMargin

  /** Oracle for cur_classifier_calibration: margins + percentile decile
    * bounds (quantile_cont ↔ Spark percentile, the q_exact_percentiles
    * precedent) + strict-exceed bucketing + exact per-bucket counts.
    */
  def calibration(posLang: String = "en",
      iters: Int = QualityClassifier.DefaultIters): String = {
    val boundCols = (1 to 9)
      .map(i => s"quantile_cont(mu, 0.${i}) AS b$i").mkString(",\n       |    ")
    val bucketExpr = (1 to 9)
      .map(i => s"(CASE WHEN mu > b$i THEN 1 ELSE 0 END)")
      .mkString("\n       |      + ")
    s"""WITH ${allCtes(posLang, iters)}, fm AS (
       |  SELECT f.doc_id, CAST(sum(f.xu * w.wu) AS BIGINT) AS mu
       |  FROM fx f JOIN w$iters w USING (bucket) GROUP BY 1
       |), sc AS (
       |  SELECT fm.doc_id, fm.mu, CAST(l.y AS INT) AS y
       |  FROM fm JOIN lab l USING (doc_id)
       |), bnd AS (
       |  SELECT $boundCols
       |  FROM sc
       |), bk AS (
       |  SELECT doc_id, y,
       |    $bucketExpr AS bucket
       |  FROM sc, bnd
       |)
       |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
       |  CAST(sum(y) AS BIGINT) AS n_pos,
       |  CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pos_rate
       |FROM bk GROUP BY 1""".stripMargin
  }
}
