package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.RateAnalysis
import graft.ingest.MergeOps
import graft.model.Tables
import graft.operators.{AsOfJoin, Sessionize}
import graft.queries.BreadthQueries
import graft.similarity.Similarity
import graft.text.{NearDup, TextFunctions}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the scale-pipeline extensions) is
  * exposed as a named query over the shared parquet tables, with a
  * semantically equivalent DuckDB SQL oracle where expressible.
  */
object SparkEntry {

  /** The reference's NY-5pm-style cutoff (Fx_1min.py:133-145), pinned to a
    * literal inside the 30-day synthetic window so every scale factor
    * exercises both sides of it.
    */
  private val CutoffSql = "TIMESTAMP '2024-01-20 17:00:00'"
  private def cutoff = expr(CutoffSql)

  /** Activity window (reference: 30 s, Fx_1min.py:156) widened to 7 days so
    * the synthetic 30-day event stream keeps a realistic active set.
    */
  private val ActiveWindowSpark = "7 DAYS"
  private val ActiveWindowDuck = "7 DAY"

  private def rates(s: SparkSession, dir: String): DataFrame = Tables.rates(s, dir)

  // ---- shared oracle CTE fragments (DuckDB dialect) ----
  private val RatesCte = Tables.ratesOracleCte

  /** The IngestFeed fixture constant rendered as a DuckDB VALUES list
    * (pair, quote date, decimal-pinned rate, delivery index) — shared by
    * the CDC changelog and time-travel oracles.
    */
  private def RetentionCutoffSql = graft.streaming.StreamReplay.RetentionCutoff

  private lazy val IngestFeedValuesSql =
    graft.streaming.StreamReplay.IngestFeed.zipWithIndex
      .flatMap { case ((name, quotes), v) =>
        val pair = name.take(3) + "/" + name.slice(4, 7)
        quotes.map { case (d, c) =>
          s"('$pair', DATE '$d', CAST($c AS DECIMAL(10,6)), $v)" }
      }.mkString(",\n  ")
  private val ActiveCte =
    s"""active AS (
       |  SELECT * FROM rates
       |  WHERE "timestamp" >= (SELECT max("timestamp") FROM rates) - INTERVAL $ActiveWindowDuck
       |)""".stripMargin
  private val LatestCte =
    """latest AS (
      |  SELECT ccy_couple, rate AS current_rate, event_time AS current_event_time
      |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple
      |          ORDER BY event_time DESC, event_id DESC) AS rn FROM active)
      |  WHERE rn = 1
      |)""".stripMargin
  private val PrevCte =
    s"""prev AS (
       |  SELECT ccy_couple, rate AS previous_rate, event_time AS previous_event_time
       |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple
       |          ORDER BY event_time DESC, event_id DESC) AS rn
       |        FROM rates WHERE date <= $CutoffSql)
       |  WHERE rn = 2
       |)""".stripMargin
  private val PctSql =
    """CASE WHEN p.previous_rate IS NULL THEN 'No Previous Rate'
      |     ELSE CAST(ROUND(CAST((l.current_rate - p.previous_rate) / p.previous_rate * 100
      |                          AS DECIMAL(28,10)), 2) AS VARCHAR) || '%' END""".stripMargin

  /** Pad-only %-15s (rpad alone truncates >15-char strings; printf never
    * does) — the golden-report oracle's padding, mirroring
    * [[graft.report.ReportSink.lines]].
    */
  private def duckPad15(x: String) =
    s"CASE WHEN length($x) < 15 THEN rpad($x, 15, ' ') ELSE $x END"

  /** The golden report's body-line render in DuckDB: 6-dp rate via the
    * half-up integer recipe, then pad-only fixed-width columns.
    */
  private val GoldenBodySql = {
    val micro = "CAST(floor(current_rate * 1000000 + 0.5) AS BIGINT)"
    val rate6 = s"printf('%d.%06d', $micro // 1000000, CAST($micro % 1000000 AS INT))"
    s"""SELECT CAST(row_number() OVER (ORDER BY ccy_couple) + 1 AS BIGINT) AS line_no,
       |    ${duckPad15("ccy_couple")} || ' ' ||
       |    ${duckPad15(rate6)} || '  ' ||
       |    ${duckPad15("rate_change")} AS line
       |  FROM rep""".stripMargin
  }

  /** The close→change→series digest CTEs both DTW oracles start from:
    * one ≤16-element exact ×1000-long change series per currency
    * (mirrors MarketAnalytics.changeSeries).
    */
  private val DtwSeqCtes =
    """cl AS (
      |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
      |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
      |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
      |  WHERE rn = 1
      |), ch AS (
      |  SELECT ccy_couple, date,
      |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
      |        ORDER BY date) AS DECIMAL(12,3)) AS chg
      |  FROM cl
      |), chn AS (
      |  SELECT ccy_couple, date, CAST(chg * 1000 AS BIGINT) AS chg_u
      |  FROM ch WHERE chg IS NOT NULL
      |), seq AS (
      |  SELECT * FROM (
      |    SELECT ccy_couple,
      |      list_slice(list(chg_u ORDER BY date), 1, 16) AS v
      |    FROM chn GROUP BY 1)
      |  WHERE len(v) >= 2
      |)""".stripMargin

  /** The banded-DTW DP fold over a `base` CTE carrying series columns
    * `a` and `v` (band 4) — nested list folds with the prepend-init
    * trick, pure BIGINT (the row-0 sum cast keeps DuckDB off HUGEINT).
    * `selectCols` carries the edge/anchor key columns through.
    */
  private def dtwDpCte(selectCols: String) =
    s"""dp AS (
       |  SELECT $selectCols,
       |    list_reduce(
       |      list_prepend(
       |        list_transform(range(0, len(v)), j -> CASE WHEN j <= 4
       |          THEN CAST(list_aggregate(list_transform(range(0, j + 1),
       |            t -> abs(a[CAST(1 AS BIGINT)] - v[CAST(t + 1 AS BIGINT)])), 'sum') AS BIGINT)
       |          ELSE CAST(1000000000000000 AS BIGINT) END),
       |        list_transform(range(1, len(a)), i -> [CAST(i AS BIGINT)])),
       |      (prev, st) -> list_reduce(
       |        list_prepend(CAST([] AS BIGINT[]),
       |          list_transform(range(0, len(v)), j -> [CAST(j AS BIGINT)])),
       |        (acc, js) -> list_append(acc,
       |          CASE WHEN abs(st[1] - js[1]) > 4
       |            THEN CAST(1000000000000000 AS BIGINT)
       |          ELSE abs(a[CAST(st[1] + 1 AS BIGINT)]
       |                   - v[CAST(js[1] + 1 AS BIGINT)])
       |            + least(
       |              prev[CAST(js[1] + 1 AS BIGINT)],
       |              CASE WHEN js[1] = 0
       |                THEN CAST(1000000000000000 AS BIGINT)
       |                ELSE prev[CAST(js[1] AS BIGINT)] END,
       |              CASE WHEN len(acc) = 0
       |                THEN CAST(1000000000000000 AS BIGINT)
       |                ELSE acc[-1] END)
       |          END))) AS fin
       |  FROM base
       |)""".stripMargin

  /** Final DP cell → dtw_milli (NULL = alignment forced out of band). */
  private val DtwFinalSql =
    """CASE WHEN fin[CAST(len(v) AS BIGINT)] >= 1000000000000000
      |    THEN NULL ELSE fin[CAST(len(v) AS BIGINT)] END""".stripMargin

  /** The mutual-top-3 co-sign-agreement graph over `chn` (the
    * definitional join+SUM the SignAgreement kernel replaces) — yields
    * `mutall`, the SYMMETRIC mutual edge set (both orientations).
    * Shared by the DTW pair graph and the Granger screen oracles.
    */
  private val CoSignGraphCtes =
    """sg AS (
      |  SELECT ccy_couple, date,
      |    CASE WHEN chg_u > 0 THEN 1 WHEN chg_u < 0 THEN -1 ELSE 0 END AS s
      |  FROM chn
      |), wt AS (
      |  SELECT a.ccy_couple AS src, b.ccy_couple AS dst,
      |         sum(CASE WHEN a.s = b.s THEN 1 ELSE 0 END) AS w
      |  FROM sg a JOIN sg b ON a.date = b.date
      |    AND a.ccy_couple <> b.ccy_couple
      |  GROUP BY 1, 2
      |), top AS (
      |  SELECT src, dst FROM (
      |    SELECT src, dst, row_number() OVER (PARTITION BY src
      |        ORDER BY w DESC, dst ASC) AS rn
      |    FROM wt)
      |  WHERE rn <= 3
      |), mutall AS (
      |  SELECT t.src, t.dst FROM top t
      |  JOIN top r ON t.src = r.dst AND t.dst = r.src
      |)""".stripMargin

  /** Shared by dedup_bloom_prefilter and stream_bloom_incremental (the
    * folded partials are bit-equal to the one-shot bitset).
    */
  private val BloomPrefilterOracleSql =
    """WITH allr AS (
      |  SELECT doc_id, text, 0 AS role FROM documents
      |  UNION ALL
      |  SELECT -doc_id * 2 - 1, text, 1 FROM documents WHERE doc_id % 5 = 0
      |  UNION ALL
      |  SELECT -doc_id * 2 - 2, text || ' ~' || CAST(doc_id AS VARCHAR), 1
      |  FROM documents WHERE doc_id % 5 = 1
      |), f AS (
      |  SELECT doc_id, role,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM allr
      |), h AS (
      |  SELECT doc_id, role,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, 16), i ->
      |        CAST(strpos('0123456789abcdef',
      |          substr(fp, CAST(i AS INT), 1)) - 1 AS BIGINT))),
      |      (a, b) -> a * 16 + b) AS h1,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(16, 31), i ->
      |        CAST(strpos('0123456789abcdef',
      |          substr(fp, CAST(i AS INT), 1)) - 1 AS BIGINT))),
      |      (a, b) -> a * 16 + b) | 1 AS h2
      |  FROM f
      |), p AS (
      |  SELECT doc_id, role, list_distinct(list_transform(range(0, 7),
      |    i -> (h1 + i * h2) % 65536)) AS pos
      |  FROM h
      |), refpos AS (
      |  SELECT DISTINCT u.bp AS pos
      |  FROM p, unnest(p.pos) AS u(bp)
      |  WHERE role = 0
      |), cand AS (
      |  SELECT doc_id, u.bp AS pos
      |  FROM p, unnest(p.pos) AS u(bp)
      |  WHERE role = 1
      |)
      |SELECT c.doc_id, count(*) AS n_probes, count(r.pos) AS n_set,
      |  count(r.pos) = count(*) AS maybe_dup
      |FROM cand c LEFT JOIN refpos r ON r.pos = c.pos
      |GROUP BY 1""".stripMargin

  /** The zigzag recurrence as iteration-with-emission. Predicates are
    * spelled once here and spliced into every CASE, so the state
    * transition and the emission can never drift apart.
    */
  private val ZigzagOracleSql: String = {
    val T = 100000L
    val e = "z.s[CAST(r.i + 1 AS BIGINT)].ev"
    val d = "z.s[CAST(r.i + 1 AS BIGINT)].ed"
    // kind +1 (swing high): a down-reversal out of an unknown or rising
    // leg; kind −1 (swing low): an up-reversal out of unknown or falling
    val k1 = s"(r.dir >= 0 AND $e <= r.ev - $T)"
    val kM1 = s"((r.dir = 0 OR r.dir = -1) AND $e >= r.ev + $T)"
    val ext = s"((r.dir = 1 AND $e > r.ev) OR (r.dir = -1 AND $e < r.ev))"
    s"""WITH RECURSIVE $RatesCte, cl AS MATERIALIZED (
       |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
       |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
       |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
       |  WHERE rn = 1
       |), sz AS MATERIALIZED (
       |  SELECT ccy_couple, list(struct_pack(ed := date,
       |      ev := CAST(CAST(close AS DECIMAL(12,3)) * 1000 AS BIGINT))
       |    ORDER BY date) AS s
       |  FROM cl GROUP BY 1
       |), rec AS (
       |  SELECT ccy_couple, CAST(1 AS BIGINT) AS i, CAST(0 AS INTEGER) AS dir,
       |    s[1].ev AS ev, s[1].ed AS ed,
       |    CAST(NULL AS DATE) AS pd, CAST(NULL AS BIGINT) AS pv,
       |    CAST(NULL AS INTEGER) AS kind
       |  FROM sz WHERE len(s) >= 2
       |  UNION ALL
       |  SELECT r.ccy_couple, r.i + 1,
       |    CAST(CASE WHEN $kM1 THEN 1 WHEN $k1 THEN -1 ELSE r.dir END AS INTEGER),
       |    CASE WHEN $k1 OR $kM1 OR $ext THEN $e ELSE r.ev END,
       |    CASE WHEN $k1 OR $kM1 OR $ext THEN $d ELSE r.ed END,
       |    CASE WHEN $k1 OR $kM1 THEN r.ed END,
       |    CASE WHEN $k1 OR $kM1 THEN r.ev END,
       |    CAST(CASE WHEN $k1 THEN 1 WHEN $kM1 THEN -1 END AS INTEGER)
       |  FROM rec r JOIN sz z ON z.ccy_couple = r.ccy_couple
       |  WHERE r.i < len(z.s)
       |)
       |SELECT ccy_couple, pd AS pivot_date, pv AS pivot_milli, kind
       |FROM rec WHERE pd IS NOT NULL""".stripMargin
  }

  private def goldenLinesSql(repCte: String) =
    s"""$repCte, body AS (
       |  $GoldenBodySql
       |)
       |SELECT CAST(0 AS BIGINT) AS line_no,
       |       '${graft.report.ReportSink.HeaderLine}' AS line
       |UNION ALL SELECT CAST(1 AS BIGINT), repeat('=', 60)
       |UNION ALL SELECT line_no, line FROM body
       |UNION ALL SELECT (SELECT count(*) FROM rep) + 2,
       |       '${graft.report.ReportSink.FooterLine}'""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RateAnalysis.rateChangeReport(
      rates(spark, "/root/testdata/sf0.001"), cutoff, ActiveWindowSpark)

  /** A ListMap that REFUSES duplicate keys: a plain Map literal keeps
    * the last binding silently, which would shadow an existing gate's
    * query or oracle without any signal (nearly happened in round 17
    * with a second fx_kalman). Fails fast at first access instead.
    */
  private def checkedMap[V](pairs: (String, V)*): ListMap[String, V] = {
    val dups = pairs.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty, s"duplicate gate keys: ${dups.mkString(", ")}")
    ListMap(pairs: _*)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = checkedMap(

    // S4+P2+A1: scan + ingestion-relative recency filter (scalar subquery)
    "fx_active_rates" -> ((s, dir) =>
      RateAnalysis.activeRates(rates(s, dir), ActiveWindowSpark)
        .select(col("event_id"), col("ccy_couple"), col("rate"), col("event_time"))),

    // W1+P4: latest-per-pair via row_number, rn=1 (WindowGroupLimit path)
    "fx_latest_per_pair" -> ((s, dir) =>
      RateAnalysis.latestPerPair(RateAnalysis.activeRates(rates(s, dir), ActiveWindowSpark))
        .select(col("ccy_couple"), col("rate").as("current_rate"),
          col("event_time").as("current_event_time"))),

    // A2 + native argmax (max_by)
    "fx_grouped_max" -> ((s, dir) =>
      RateAnalysis.maxPerPair(rates(s, dir), cutoff)),

    // J1+J3+A3 native rewrite: as-of previous rate via window rn=2
    "fx_previous_rates" -> ((s, dir) =>
      RateAnalysis.previousRates(rates(s, dir), cutoff)),

    // J1+J3+A3 in the reference's dataflow shape, decorrelated by hand
    // (oracle keeps the literal correlated-subquery SQL)
    "fx_previous_rates_subq" -> ((s, dir) =>
      RateAnalysis.previousRatesJoinAgg(rates(s, dir), cutoff)),

    // Task B end-to-end report (P1-P6, J1-J3, A1-A3, W1, F1-F4)
    "fx_report_b" -> ((s, dir) =>
      RateAnalysis.rateChangeReport(rates(s, dir), cutoff, ActiveWindowSpark)),

    // Task B as the reference's single SQL statement (spark.sql CTE path)
    "fx_report_b_sql" -> ((s, dir) =>
      RateAnalysis.taskBCompatSql(rates(s, dir), CutoffSql, "7 DAYS")),

    // Task A end-to-end report (A4 independent-MAX dedup + LEFT join J2)
    "fx_report_a" -> ((s, dir) =>
      RateAnalysis.rateChangeReportTaskA(rates(s, dir), cutoff, ActiveWindowSpark)),

    // Task A as the reference's single SQL statement (dedup CTEs + LEFT)
    "fx_report_a_sql" -> ((s, dir) =>
      RateAnalysis.taskACompatSql(rates(s, dir), CutoffSql, "7 DAYS")),

    // K3 golden console render, distributed: one row per fixed-width
    // output line (header/separator/body/footer), byte-identical to
    // ReportSink.format (ReportSinkSpec ties them) — the last spec-only
    // §2 surface, now hash-gated
    "fx_report_golden" -> ((s, dir) =>
      graft.report.ReportSink.lines(
        RateAnalysis.rateChangeReport(rates(s, dir), cutoff, ActiveWindowSpark))),

    // K3 golden render of the Task A report (LEFT join — exercises the
    // 16-char 'No Previous Rate' sentinel the pad-only %-15s keeps whole)
    "fx_report_golden_a" -> ((s, dir) =>
      graft.report.ReportSink.lines(
        RateAnalysis.rateChangeReportTaskA(rates(s, dir), cutoff, ActiveWindowSpark))),

    // K1: last-writer-wins upsert on (ccy_couple, date)
    "fx_upsert_latest" -> ((s, dir) =>
      MergeOps.upsertLatest(rates(s, dir), Seq("ccy_couple", "date"),
          Seq(col("timestamp"), col("event_id")))
        .select(col("ccy_couple"), col("date"), col("rate"), col("event_time"))),

    // §1.4 OHLC extension: daily bars, one hash agg (min_by/max_by)
    "fx_ohlc_bars" -> ((s, dir) => RateAnalysis.ohlcBars(rates(s, dir))),

    // ingest-side quote conflation: last quote per (pair, 6h slot) —
    // map-side combine shrinks a burst-heavy feed inside the scan,
    // before any shuffle; deterministic keeper via the (time, id)
    // tiebreak (grain chosen so the fixture really conflates: ~23%
    // of its quotes collapse at sf0.01)
    "fx_conflate" -> ((s, dir) =>
      RateAnalysis.conflate(rates(s, dir), grainUs = 6L * 3600 * 1000000)),

    // candlestick pattern flags (doji / engulfing) over the OHLC bars:
    // pure comparisons on the digest, bitwise-replayable
    "fx_candle_patterns" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.candlePatterns(rates(s, dir))),

    // time-RANGE window frame (the VALUE-based sliding frame a rows
    // frame can't express): per tick, the trailing-7-day count / mean /
    // max over the pair's quote history — rangeBetween on event-time
    // micros, one shuffle on the pair key. The mean routes through an
    // exact decimal sum over the frame and divides in double at the
    // boundary, so distributed accumulation order cannot perturb it.
    "fx_rolling_7d" -> ((s, dir) => {
      val sevenDaysUs = 7L * 24 * 3600 * 1000000
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("ccy_couple")).orderBy(col("event_time"))
        .rangeBetween(-sevenDaysUs, 0)
      rates(s, dir).select(col("ccy_couple"), col("event_id"),
          col("event_time"), col("rate"))
        .withColumn("n_7d", count(lit(1)).over(w))
        .withColumn("avg_7d",
          sum(col("rate").cast("decimal(18,6)")).over(w).cast("double")
            / col("n_7d").cast("double"))
        .withColumn("max_7d", max(col("rate")).over(w))
        .select(col("ccy_couple"), col("event_id"), col("n_7d"),
          col("avg_7d"), col("max_7d"))
    }),

    // cross-rate triangulation: every pair quotes against the same base,
    // so cross(a,b) = rate_a / rate_b over the latest active quotes; the
    // quadratic step runs on the |pairs|-row digest (broadcast NLJ), the
    // tick corpus is only scanned once for the WindowGroupLimit digest
    "fx_cross_rates" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.crossRates(rates(s, dir), ActiveWindowSpark)),

    // TWAP: dwell-time-weighted mean price per pair-day (lead window for
    // the dwell, day-end close-out for the last tick); the weighted sum
    // is decimal-exact and divides in double only at the boundary
    "fx_twap" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.twap(rates(s, dir))),

    // co-movement matrix: Pearson correlation of day-over-day close
    // changes for every unordered currency pair, from EXACT decimal
    // moments (built-in corr is accumulation-order-dependent in double);
    // the pair-pair join touches only the daily-close digest
    "fx_change_corr" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.dailyChangeCorr(rates(s, dir))),

    // per-pair OLS trend over daily closes: slope/intercept/r² from
    // exact integer moments (one map-side-combinable groupBy over the
    // daily-close digest — no joins, no windows, nothing quadratic)
    "fx_trend_ols" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.trendOls(rates(s, dir))),

    // pairs-trading spread monitor: OLS hedge ratio per couple combo
    // over common dates + latest-spread z-score and entry signal, all
    // from exact integer moments over the close digest
    "fx_pairs_spread" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.pairsSpread(rates(s, dir))),

    // elastic shape similarity: banded DTW of each pair's change series
    // vs the anchor pair — all-integer DP, order-free by construction
    "fx_dtw_pairs" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.dtwToAnchor(rates(s, dir))),

    // per-edge DTW on the mutual-top-3 co-sign-agreement graph: the
    // |pairs|² space is sparsified FIRST (mutualTopK, exact integer
    // weights), then one bounded integer DP per surviving edge
    "fx_dtw_graph" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.dtwGraph(rates(s, dir),
        memoKey = Some(dir))),

    // directional lead/lag: lag-1 Granger F per ORDERED mutual edge —
    // ten exact-long moments from one codegen'd kernel pass, then the
    // RSS/Cramer trees in double with oracle-identical operand order
    "fx_granger_pairs" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.grangerPairs(rates(s, dir),
        memoKey = Some(dir))),

    // CCF peak: the |corr|-maximizing lag per ordered mutual edge —
    // shifted vectors through PairMoments, round-to-6dp |corr| ranking
    // with the lag tiebreak
    "fx_leadlag_pairs" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.leadLagPairs(rates(s, dir),
        memoKey = Some(dir))),

    // closed-form two-asset minimum-variance basket weight per
    // unordered mutual edge from exact centered moments
    "fx_minvar_pairs" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.minVariancePairs(rates(s, dir),
        memoKey = Some(dir))),

    // OU mean-reversion half-life per unordered mutual edge: AR(1) β on
    // the cumulative common-day spread (exact-long moment fold), then
    // the libm-free integer half-life via a running IEEE power chain
    "fx_ou_halflife" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.ouHalflifePairs(rates(s, dir),
        memoKey = Some(dir))),

    // two-state HMM trend-regime labeling by ALL-INTEGER Viterbi (bit
    // costs, no floats anywhere); per-pair day-ordered fold, the path
    // pinned whole via md5
    "fx_regime_viterbi" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.regimeViterbi(rates(s, dir))),

    // GARCH(1,1) conditional variance with fixed literal params — the
    // clustering-aware volatility filter next to the flat sample stddev
    // and the EWMA; per-pair day-ordered fold, iteration-shaped oracle
    "fx_garch_vol" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.garchVol(rates(s, dir))),

    // Dickey-Fuller unit-root t² on the same spread — the significance
    // test that closes the pairs-desk chain (hedge → half-life → is the
    // reversion real); exact-long moments, double trees operand-identical
    "fx_adf_spread" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.adfSpreadPairs(rates(s, dir),
        memoKey = Some(dir))),

    // Welch two-sample t² for the Monday effect per pair — the event-
    // study pre/post primitive; exact conditional moments, fixed double
    // tree, sqrt-free squared 1.96² threshold behind an n floor
    "fx_monday_effect" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.mondayEffect(rates(s, dir))),

    // cross-sectional momentum backtest: per-day tercile rank on the
    // trailing 5-day move, next-day long-short spread — exact milli-
    // long baskets, two closing divisions; the factor-portfolio axis
    "fx_xs_momentum" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.crossSectionalMomentum(rates(s, dir))),

    // per-pair fat-tail report: signed-squared skewness + excess
    // kurtosis from exact power sums via DECIMAL(38) central-moment
    // identities — the n-powers cancel so no integer division exists
    "fx_higher_moments" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.higherMoments(rates(s, dir))),

    // empirical upper-tail dependence per mutual edge: top-⌈n/20⌉
    // selection thresholds per side, exact joint/marginal tail counts,
    // λ_U = joint/na one division — the crash co-movement Pearson and
    // Spearman both average away
    "fx_tail_dependence" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.tailDependencePairs(rates(s, dir),
        memoKey = Some(dir))),

    // Spearman rank correlation per mutual edge: tie-aware DOUBLED
    // average ranks (exact integers) over common days, Pearson tree on
    // the rank moments — the robust sibling of fx_change_corr
    "fx_spearman_pairs" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.spearmanPairs(rates(s, dir),
        memoKey = Some(dir))),

    // Lo-MacKinlay variance-ratio VR(5) per pair: the random-walk
    // diagnostic on each pair's OWN series (ADF tests the spread) —
    // exact-long moments over observed-day changes and their
    // overlapping 5-day sums, sqrt-free squared-z rejection at 1.96²
    "fx_variance_ratio" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.varianceRatio(rates(s, dir))),

    // confirmed zigzag swing pivots: all-integer leg fold per pair,
    // inline in the generator select; strict-extreme/≥T-retrace rules
    "fx_zigzag" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.zigzagPivots(rates(s, dir))),

    // incremental zigzag: ORDER-dependent maintenance — buffered
    // frontier day + chronological fold; must equal one-shot fx_zigzag
    "stream_zigzag_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayZigzagIncremental(s, dir)),
    // incremental GARCH: the second order-dependent incremental — the
    // recurrence tail + buffered frontier; must equal fx_garch_vol
    "stream_garch_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayGarchIncremental(s, dir)),

    // robust trend: Theil-Sen median-of-pairwise-slopes, median by
    // SELECTION (no interpolation arithmetic), slopes exact-int ratios
    "fx_theilsen" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.theilSen(rates(s, dir))),

    // robust outlier digest: median/MAD in pure long arithmetic — the
    // estimator a wild tick cannot drag, one summary row per pair
    "fx_outliers_mad" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.madOutliers(rates(s, dir))),

    // per-pair volatility: sample stddev of daily changes from exact
    // integer moments (stddev_samp would be accumulation-order-dependent)
    "fx_volatility" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.volatility(rates(s, dir))),

    // lag-1 autocorrelation of daily changes: the change vector zipped
    // with itself shifted one CALENDAR day (null slots break pairs, as
    // the date+1 join they replay would) through the PairMoments kernel
    "fx_autocorr" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.autocorr1d(rates(s, dir))),

    // per-pair max drawdown: running-peak window over DECIMAL closes,
    // exact integer result — no doubles anywhere in the path
    "fx_drawdown" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.maxDrawdown(rates(s, dir))),

    // per-pair calendar gap report: feed-liveness at day grain — lag
    // window over the (pair, day) presence digest, one row per maximal
    // quiet run with bounds and length
    "fx_gaps" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.quoteGaps(rates(s, dir))),

    // the composed nightly market report: EMA + volatility + drawdown +
    // RSI + trend slope in ONE plan — AQE exchange reuse dedupes the
    // branches' shared daily-close digest subtrees at runtime
    // (ReusedExchange pinned in MarketAnalyticsSpec)
    "fx_market_report" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.marketReport(rates(s, dir))),

    // per-pair RSI (Wilder smoothing): two recursive folds over the
    // day-ordered gain/loss split of the change digest, α = 1/16
    // binary-exact, 100-pinned when no losses — the momentum oscillator
    // on the EMA fold machinery
    "fx_rsi" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.rsiWilder(rates(s, dir))),

    // per-pair EMA of the daily close: the RECURSIVE fold no algebraic
    // aggregate expresses — exact ×1000-long closes, per-pair sorted
    // array, sequential codegen'd fold with α = 1/4 (binary-exact), so
    // DuckDB's list_reduce replays the identical rounding sequence
    "fx_ema" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.emaDailyClose(rates(s, dir))),

    // MACD triple (fast EMA − slow EMA, signal EMA, histogram): three
    // coupled recursive folds in ONE sequential pass with a struct
    // accumulator; all α binary powers, so the DuckDB recursive CTE
    // replays the identical rounding sequence
    "fx_macd" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.macd(rates(s, dir))),

    // Holt linear-trend smoothing + h-step forecast: level and trend
    // evolve jointly in one struct fold (α=1/4, β=1/8 binary-exact)
    "fx_holt_forecast" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.holtLinear(rates(s, dir))),

    // 1-D random-walk Kalman filter: adaptive-gain state estimate +
    // variance per pair (q=1, r=4 binary-exact; IEEE gain division)
    "fx_kalman" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.kalmanFilter(rates(s, dir))),

    // longest up/down streaks: gaps-and-islands on the change signs —
    // dates and integer counts only, (len desc, start asc) tiebreak
    "fx_streaks" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.streaks(rates(s, dir))),

    // Bollinger bands: trailing-20-day mean ± 2 sample σ per pair-day —
    // the windowed sibling of fx_volatility's exact-integer-moment
    // recipe (built-in windowed stddev would round differently across
    // engines); one shuffle, bounded ROWS frame over the close digest
    "fx_bollinger" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.bollingerBands(rates(s, dir))),

    // layout maintenance: rewrite events Z-ORDERED by (user_id, time) —
    // interleaved-bit sort key → every file gets a tight min/max
    // envelope on BOTH dimensions (the multi-dim data-skipping layout);
    // rows must be untouched (hash identity), ZOrderSpec measures the
    // envelopes
    "maint_zorder_events" -> ((s, dir) => {
      val tmp = graft.util.Scratch.dir("graft_zorder").resolve("events").toString
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      graft.operators.ZOrder.writeZOrdered(ev, "user_id", "ts_us", tmp)
      s.read.parquet(tmp)
    }),

    // layout maintenance: the same rewrite HILBERT-clustered — the
    // tighter-locality curve (consecutive codes are always grid
    // neighbors); rows must be untouched, ZOrderSpec measures both
    // curves' envelopes
    "maint_hilbert_events" -> ((s, dir) => {
      val tmp = graft.util.Scratch.dir("graft_hilbert").resolve("events").toString
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      graft.operators.ZOrder.writeHilbertOrdered(ev, "user_id", "ts_us", tmp)
      s.read.parquet(tmp)
    }),

    // table maintenance: compact a deliberately fragmented copy of the
    // date-partitioned rates table (8 files/day — the post-ingest sprawl
    // shape) and hash-check that not a single row changed through the
    // fragment → compact round trip
    "maint_compact_rates" -> ((s, dir) => {
      val tmp = graft.util.Scratch.dir("graft_compact").resolve("rates").toString
      Tables.rates(s, dir).repartition(8)
        .withColumn("p_date", to_date(col("date")))
        .write.partitionBy("p_date").mode("overwrite").parquet(tmp)
      graft.operators.Compaction.compactDatePartitioned(s, tmp)
      s.read.parquet(tmp)
        .select(col("event_id"), col("ccy_couple"), col("rate"),
          col("date"), col("event_time"))
    }),

    // data-skipping index: range-clustered layout + per-file min/max
    // stats; the scan reads ONLY the files whose envelope intersects the
    // predicate (file identity is hash-invisible, so the oracle checks
    // the contract that matters: pruned scan ≡ full-table filter;
    // DataSkippingSpec pins that files are actually skipped)
    "maint_skipping_scan" -> ((s, dir) => {
      val tmp = graft.util.Scratch.dir("graft_skip").resolve("events").toString
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
        .repartitionByRange(8, col("user_id"))
        .write.mode("overwrite").parquet(tmp)
      val stats = graft.operators.DataSkipping.buildStats(s, tmp, Seq("user_id"))
      graft.operators.DataSkipping
        .prunedRangeScan(s, tmp, stats, "user_id", 30L, 44L)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("event_type"), col("value"))
    }),

    // bloom-index point lookup: a HASH-clustered layout (the co-located-
    // join layout) gives every file a full-domain min/max envelope, so
    // range skipping prunes nothing — the per-file bloom index answers
    // "can this file hold THIS key" instead; pruned scan ≡ full filter
    // by the one-sided-error contract (DataSkippingSpec pins that files
    // are actually skipped and negatives are definitive)
    "maint_bloom_lookup" -> ((s, dir) => {
      val tmp = graft.util.Scratch.dir("graft_bloom").resolve("events").toString
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
        .repartition(8, col("user_id"))
        .write.mode("overwrite").parquet(tmp)
      val bloom = graft.operators.DataSkipping.buildBloom(s, tmp, "user_id")
      graft.operators.DataSkipping
        .prunedPointScan(s, tmp, bloom, "user_id", lit(37L))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("event_type"), col("value"))
    }),

    // CDC: recover the change set between the as-of-cutoff upsert table
    // and the current one — one null-safe full-outer diff on the key;
    // the complement of MergeOps (which applies changes, this RECOVERS
    // them for downstream sync)
    "fx_cdc_snapshot_diff" -> ((s, dir) => {
      val r = rates(s, dir)
      val keys = Seq("ccy_couple", "date")
      val ord = Seq(col("timestamp"), col("event_id"))
      graft.operators.Cdc.snapshotDiff(
        MergeOps.upsertLatest(r.where(col("timestamp") <= cutoff), keys, ord),
        MergeOps.upsertLatest(r, keys, ord),
        keys, Seq("rate", "event_time"))
    }),

    // SCD2 temporal history: the version intervals the reference's
    // destructive upsert throws away — one lead() window per key under
    // the (timestamp, event_id) total order; `is_current` recovers the
    // upsert table, any as-of time is a range predicate
    "fx_scd2_history" -> ((s, dir) =>
      graft.operators.Scd2.history(rates(s, dir), Seq("ccy_couple", "date"),
          "timestamp", col("event_id"))
        .select(col("ccy_couple"), col("date"), col("rate"),
          unix_micros(col("valid_from")).as("valid_from_us"),
          unix_micros(col("valid_to")).as("valid_to_us"),
          col("is_current"))),

    // point-in-time AS OF over the SCD2 history: the version live at the
    // cutoff instant per key (valid_from <= t < valid_to) — the temporal
    // query the history exists to answer. On the bucketed incremental
    // history this is a partition-pruned scan + interval filter.
    "fx_scd2_asof" -> ((s, dir) => {
      val asOfUs = 1705300000000000L // 2024-01-15T05:46:40Z, mid-corpus
      graft.operators.Scd2.history(rates(s, dir), Seq("ccy_couple", "date"),
          "timestamp", col("event_id"))
        .select(col("ccy_couple"), col("date"), col("rate"),
          unix_micros(col("valid_from")).as("valid_from_us"),
          unix_micros(col("valid_to")).as("valid_to_us"))
        .where(col("valid_from_us") <= asOfUs &&
          (col("valid_to_us").isNull || col("valid_to_us") > asOfUs))
        .select(col("ccy_couple"), col("date"), col("rate"),
          col("valid_from_us"))
    }),

    // TEMPORAL dimension join over the SCD2 history: each purchase
    // event meets the rate version valid AT ITS OWN instant (not a
    // global cutoff) — hash equi-join on the entity key with the
    // interval residual bounded by per-key version counts
    "fx_scd2_temporal_join" -> ((s, dir) => {
      val hist = graft.operators.Scd2.history(rates(s, dir),
          Seq("ccy_couple", "date"), "timestamp", col("event_id"))
        .select(col("ccy_couple"), col("date"), col("rate"),
          col("valid_from"), col("valid_to"))
      val facts = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("fact_id"),
          col("user_id").cast("string").as("ccy_couple"),
          to_date(col("ts")).as("date"), col("ts").as("fact_ts"))
      graft.operators.Scd2.temporalJoin(facts, hist,
          Seq("ccy_couple", "date"), "fact_ts")
        .select(col("fact_id"), col("ccy_couple"),
          unix_micros(col("fact_ts")).as("fact_ts_us"),
          col("rate").as("rate_then"),
          unix_micros(col("valid_from")).as("valid_from_us"))
    }),

    // §2.10 streaming replay: rates driven through the real Structured
    // Streaming file source + foreachBatch partition-scoped LWW merge;
    // must converge to the one-shot batch upsert (batching-order
    // independent, O(touched days) per micro-batch)
    "stream_replay_upsert" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayUpsert(s, dir)),

    // §2.10 STATEFUL streaming replay: flatMapGroupsWithState
    // latest-per-pair driven through real file micro-batches + the state
    // store; the per-key argmax of its emissions must equal the batch
    // window argmax (event_time, event_id total order)
    "stream_latest_per_pair" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayLatestPerPair(s, dir)),

    // the SAME stateful semantics on the arbitrary-stateful V2 API
    // (transformWithState + RocksDB provider, Spark 4) — the two APIs
    // must converge to the identical batch argmax
    "stream_latest_tws" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayLatestPerPairTws(s, dir)),

    // §2.10 WATERMARKED window replay: tumbling-window aggregation driven
    // through ordered micro-batches; append mode must emit exactly the
    // windows whose end passed the final watermark — watermark semantics
    // as a hash-checked fact
    "stream_window_stats" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayWindowedStats(s, dir)),

    // §2.10 SESSION-window replay: gap-based sessions through the real
    // merging session store; emitted set = sessions closed by the final
    // watermark (half-open [first, last+gap) semantics)
    "stream_session_stats" -> ((s, dir) =>
      graft.streaming.StreamReplay.replaySessionStats(s, dir)),

    // incremental aggregate maintenance: a daily-OHLC bars table kept by
    // the stream at O(touched days) per batch (idempotent tick merge +
    // partition-pruned bar refresh + dynamic overwrite); must converge
    // to the one-shot batch OHLC aggregation
    "stream_ohlc_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayOhlcIncremental(s, dir)),

    // §2.10 streaming exact dedup of a document feed: dropDuplicates
    // keyed state across micro-batches must emit exactly one row per
    // distinct content fingerprint (streaming form of dedup_exact)
    "stream_dedup_docs" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayDedupDocs(s, dir)),

    // BOUNDED-STATE streaming dedup (dropDuplicatesWithinWatermark):
    // state expires with the watermark instead of growing forever —
    // near re-deliveries suppressed, far ones re-emitted; the oracle
    // replays the exact expiry rule batch by batch
    "stream_dedup_bounded" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayDedupBounded(s, dir)),

    // §2.10 stream-static join: the events stream enriched against the
    // static customer dimension per micro-batch (no state, no
    // watermark); emitted rows = the batch join, checked through the
    // per-segment aggregate
    "stream_static_join" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayStreamStaticJoin(s, dir)),

    // §2.10 stream-stream interval join: purchases matched to the same
    // user's clicks in the preceding 30 min through the real symmetric
    // state store; watermarks bound state to one window of active users;
    // emitted pairs must equal the batch interval join
    "stream_interval_join" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayStreamStreamJoin(s, dir)),

    // LEFT OUTER stream-stream join: matches stream out like the inner
    // join; an unmatched click emits with a null purchase only once the
    // watermark proves no in-window purchase can still arrive (state
    // expiry). The oracle replays BOTH rules: the batch interval join
    // plus the null rows under the final global watermark
    "stream_outer_join" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayStreamStreamJoinLeftOuter(s, dir)),

    // incremental NEAR-DUP INDEX maintenance: each micro-batch of new
    // documents is admitted into the persisted LSH index (signatures /
    // buckets / supports) at O(batch) cost — never a corpus recompute;
    // the report from the maintained index must equal the one-shot
    // dedup_minhash_lsh (same oracle)
    // incremental vocabulary: per-batch partial-count appends (LSM
    // shape, O(batch)/batch) folded at report time — must equal the
    // one-shot cur_top_tokens
    "stream_vocab_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayTopTokensIncremental(s, dir)),
    // incremental bigram-LM counts: per-batch (w1, w2) partials (LSM
    // shape) folded at report time — must equal the one-shot
    // text_bigram_lm
    "stream_bigramlm_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayBigramLmIncremental(s, dir)),
    // incremental Bloom maintenance: per-batch (word, bits) partials
    // (bit_or is associative/commutative/idempotent) folded, then the
    // incoming half probed — must equal the one-shot prefilter
    "stream_bloom_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayBloomIncremental(s, dir)),
    // gap sessionization on transformWithState EVENT-TIME TIMERS (the
    // V2 surface session_window hides): inline gap closes + per-key
    // timer closes; emission rule pinned empirically by the probe
    "stream_session_timers" -> ((s, dir) =>
      graft.streaming.StreamReplay.replaySessionTimers(s, dir)),
    // the timer-rule BOUNDARY gate: injected keys whose sessions end
    // exactly on / 1 ms past the final watermark — the non-strict `≤`
    // close rule is pinned by the hash at gate scale, both arms
    "stream_session_timers_boundary" -> ((s, dir) =>
      graft.streaming.StreamReplay.replaySessionTimersBoundary(s, dir)),
    // trailing-K buffer on the V2 LIST-STATE surface: keep-K-largest
    // merge per batch, final digest = the batch top-K aggregate
    "stream_trailingk_tws" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayTrailingK(s, dir)),
    // per-day counts on the V2 MAP-STATE surface (triad complete):
    // additive map entries, O(touched days) per batch
    "stream_daycounts_tws" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayDayCounts(s, dir)),
    // incremental line-dedup dictionary: per-batch per-line distinct-doc
    // partials (LSM shape) folded, then the cleaned corpus cut against
    // the maintained dictionary — must equal the one-shot cur_line_dedup
    "stream_linededup_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayLineDedupIncremental(s, dir)),
    // incremental self-repeat dictionary: per-batch per-gram partials
    // (count + batch-local keeper, both mergeable) folded, excision cut
    // against the maintained state — must equal cur_selfrepeat_spans
    "stream_selfrepeat_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replaySelfRepeatIncremental(s, dir)),
    // incremental drift monitor: per-batch (date, bucket) partials
    // folded, split re-derived from the maintained span at report time
    // — must equal the one-shot dq_drift_chi2
    "stream_drift_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayDriftIncremental(s, dir)),
    // incremental CvM drift: per-batch (d, v) distinct-value partials
    // folded, split re-derived from the maintained span at report time
    // — must equal the one-shot dq_cvm_drift
    "stream_cvm_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayCvmIncremental(s, dir)),
    // the KS report over the SAME maintained digest — one state, both
    // whole-CDF statistics; must equal the one-shot dq_ks_drift
    "stream_ks_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayKsIncremental(s, dir)),
    // incremental trending: per-batch (type, date) partials folded,
    // decay levels re-derived from the maintained anchor at report time
    // — must equal the one-shot q_trending_events
    "stream_trending_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayTrendingIncremental(s, dir)),
    // incremental ANN-index ingestion: per-batch assignment to the
    // frozen trained centroids appended to the (cell, vec_id, embedding)
    // index; the IVF search over the maintained index must equal the
    // one-shot sim_ivf_kmeans_topk
    "stream_annindex_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayAnnIndexIncremental(s, dir)),
    // ANN-index DELETES + re-adds: tombstone batches (LSM, O(batch))
    // then LWW-resolved reads; the search over the maintained index
    // must equal the one-shot search over the retained corpus
    "stream_annindex_delete" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayAnnIndexDeletes(s, dir)),
    // incremental navigable-graph (HNSW) maintenance: per-batch in-cell
    // neighbor candidates appended (mergeable per-src top-m), graph
    // folded at report time; the beam search over the maintained graph
    // must equal the one-shot sim_hnsw_topk
    "stream_hnsw_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayHnswIncremental(s, dir)),
    // incremental PCA: per-batch dimension-bounded exact-Long moment
    // partials folded, then the same collected-digest power iteration
    // — must equal the one-shot sim_pca_power
    "stream_pca_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayPcaIncremental(s, dir)),
    // incremental SemDeDup: per-batch lower-cos partial maxes folded at
    // report time — must equal the one-shot dedup_semantic
    "stream_semantic_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replaySemanticIncremental(s, dir)),
    // navigable-graph DELETES: tombstones still route (soft delete, the
    // documented HNSW practice) but are filtered from results — must
    // equal the full-graph beam search retained-filtered and re-ranked
    "stream_hnsw_delete" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayHnswDeletes(s, dir)),
    // incremental tokenizer-training state: per-batch word-type partial
    // counts (LSM shape) folded, then the merge loop retrained from
    // state — must learn the identical table to cur_bpe_merges
    "stream_bpe_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayBpeIncremental(s, dir)),
    // incremental KMV sketch: per-batch ≤k-row partial sketches folded
    // at report time — k-min of unioned k-min sets IS the k-min of the
    // union, so the result equals the one-shot q_kmv_distinct exactly
    "stream_kmv_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayKmvIncremental(s, dir)),
    // incremental Count-Min: per-batch partial CELLS summed at fold —
    // mergeable counts, batch markers for re-delivery; must equal the
    // one-shot q_cms_heavy_hitters
    "stream_cms_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayCmsIncremental(s, dir)),
    // incremental data-contract maintenance: additive counter partials
    // (marker-guarded) + idempotent-by-value key state per batch; the
    // folded report must equal the one-shot dq_constraints exactly
    "stream_constraints_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayConstraintsIncremental(s, dir)),
    // incremental classifier-training state: per-batch feature/label
    // partials (disjoint doc sets — fold by union, marker-guarded);
    // retraining from folded state must learn the identical model
    "stream_classifier_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayClassifierIncremental(s, dir)),
    // incremental histogram sketch: additive bin partials in
    // batch-scoped dirs; the folded digest's percentile estimates must
    // equal the one-shot sketch
    "stream_hist_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayHistIncremental(s, dir)),
    // incremental JOIN-view maintenance (delta-merge): per batch, join
    // ONLY the batch to the broadcast dim and merge mergeable aggregates
    // into the |groups|-row stored view — must equal the one-shot
    // join+agg over all facts
    "stream_mv_join_incremental" -> ((s, dir) =>
      graft.operators.IncrementalView.revenueBySegmentIncremental(s, dir)),
    // incremental GRAPH maintenance: the weighted edge relation merges
    // exact decimal batch deltas (O(batch)/batch, O(|edges|) state);
    // the damped iteration reruns over the maintained digest and must
    // equal the one-shot ranks bit for bit — same oracle as
    // q_pagerank_trade
    "stream_pagerank_incremental" -> ((s, dir) =>
      graft.operators.IncrementalView.pagerankTradeIncremental(s, dir)),
    // incremental graph-stats: the SAME maintained edge digest, with
    // the mutual-kNN sparsification + topology summary rerun at report
    // time — must equal the one-shot q_graph_stats_trade
    "stream_graphstats_incremental" -> ((s, dir) =>
      graft.operators.GraphStats.summary(
        graft.operators.GraphStats.mutualTopK(
          graft.operators.IncrementalView.tradeEdgeDigestIncremental(
            s, dir, nBatches = 4, scratchTag = "graft_gs_edges"),
          topN = 7))),
    // incremental HITS: the same maintained edge digest, distinct
    // directed pairs projected, the 5-iteration fixpoint rerun at
    // report time — must equal the one-shot q_hits_trade bit for bit
    "stream_hits_incremental" -> ((s, dir) =>
      graft.operators.Hits.hits(
          graft.operators.IncrementalView.tradeEdgeDigestIncremental(
              s, dir, nBatches = 4, scratchTag = "graft_hits_edges")
            .where(col("src") =!= col("dst"))
            .select(col("src"), col("dst")), iters = 5)
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("node"), col("n_name"))), "node")
        .select(col("n_name").as("nation"), col("authority"), col("hub"))),

    "stream_neardup_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayNearDupIncremental(s, dir)),

    // incremental LOSSLESS similarity-join maintenance: each batch is
    // rank-encoded against the frozen df-rank universe and prefix-probes
    // the members admitted so far in both size-order roles; the union of
    // per-batch verified emissions must equal the one-shot dedup_ppjoin
    // pair set — same naive all-pairs oracle
    "stream_ppjoin_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayPpjoinIncremental(s, dir)),

    // the directional sibling: incremental containment-join maintenance
    // (contained side probes, container side indexed; both directions
    // per batch); union of per-batch emissions = one-shot
    // dedup_containment — same naive all-ordered-pairs oracle
    "stream_containment_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayContainmentIncremental(s, dir)),

    // incremental SCD2 maintenance: the full version-history table kept
    // by the stream at O(touched key-buckets) per batch (bucket-pruned
    // read + interval rebuild + dynamic overwrite); must converge to the
    // one-shot batch SCD2 — same oracle as fx_scd2_history
    "stream_scd2_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayScd2Incremental(s, dir)),

    // the COMPOSED ingest pipeline (the reference's whole E1 loop,
    // Fx_1min.py:240-262) as one checked artifact: versioned payload
    // files → file stream → FxJson flatten → key+value dedup →
    // partition-scoped LWW merge; final table = delivery-order argmax,
    // recomputed by the oracle from the same fixture constant
    "stream_ingest_pipeline" -> ((s, _) =>
      graft.streaming.StreamReplay.replayIngestPipeline(s)),

    // the SAME composed pipeline, with the merge diffing each batch's
    // before/after partition images into an append-only CDC changelog;
    // the oracle recomputes every batch's LWW state transition from the
    // fixture constant and diffs consecutive states
    "stream_cdc_changelog" -> ((s, _) =>
      graft.streaming.StreamReplay.replayCdcChangelog(s)),

    // CDC TIME TRAVEL (the consumer half): the table AS OF batch 1,
    // reconstructed purely from the changelog — corrections delivered in
    // later batches must NOT appear; the oracle recomputes the same
    // historical state from the fixture constant
    "stream_cdc_timetravel" -> ((s, _) =>
      graft.streaming.StreamReplay.replayCdcTimeTravel(s, batch = 1L)),

    // CDC DELETE path: a retention sweep (MergeOps.deleteWhere) retires
    // the keys dated ≤ the cutoff from a COPY of the converged ingest
    // table, appending delete rows (old images, next batch id) to the
    // changelog — the change an LWW upsert can never emit
    "stream_cdc_delete_changelog" -> ((s, _) =>
      graft.streaming.StreamReplay.replayCdcDeleteChangelog(s)),

    // ...and the consumer half: time travel over the delete-bearing
    // changelog must DROP the retired keys (their newest change is the
    // delete)
    "stream_cdc_delete_timetravel" -> ((s, _) =>
      graft.streaming.StreamReplay.replayCdcDeleteTimeTravel(s)),

    // §7.2 partitioned layout: the day-granular cutoff answered by
    // PARTITION PRUNING over the date-partitioned rates table (the scan's
    // PartitionFilters carry the predicate — asserted in
    // PartitionPruningSpec; no row filter remains)
    "fx_partitioned_cutoff" -> ((s, dir) =>
      graft.ingest.PartitionedRates.cutoffStats(s, dir)),

    // DYNAMIC partition pruning: the days to scan come from a broadcast
    // filtered dim join (fact⋈calendar) — the scan's PartitionFilters
    // carry a dynamicpruning InSubquery, pruned at runtime
    "fx_dpp_days" -> ((s, dir) =>
      graft.ingest.PartitionedRates.dppDayStats(s, dir)),

    // K2: insert-if-absent (left-anti against existing key set)
    "fx_insert_if_absent" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val incoming = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("date"), col("value"))
      val existing = ev.where(col("event_type") =!= "click")
        .select(col("user_id"), to_date(col("ts")).as("date"))
      MergeOps.insertIfAbsent(incoming, existing, Seq("user_id", "date"))
    }),

    // S5-adjacent: semi-structured extraction from the JSON props column
    "fx_json_extract" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))),

    // ---- relational breadth (SURVEY §2.9: families the reference lacks) ----

    // graph centrality: weighted PageRank over the customer-nation →
    // supplier-nation trade graph. The scale-dominant step is the edge
    // aggregation (fact-table shuffle, map-side combinable, dims
    // broadcast); the damped iteration then runs on the |nations|²-max
    // digest with per-target source-ordered double folds so the replay
    // is bitwise (see operators.PageRank)
    // 2-D Pareto frontier (skyline): best price/recency trade-offs via
    // the chunked two-pass running max — no global window sort; the
    // oracle is the DEFINITIONAL quadratic NOT-EXISTS, so the scalable
    // plan must equal the textbook semantics
    "q_skyline_orders" -> ((s, dir) =>
      graft.operators.Skyline.skylineMax2D(
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderdate")),
        col("o_totalprice"), col("o_orderdate"))),

    // incrementally maintained frontier: state IS the skyline —
    // skyline(A∪B) = skyline(skyline(A)∪B), so each batch folds into
    // O(|frontier|) state; must equal the one-shot skyline
    "stream_skyline_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replaySkylineIncremental(s, dir)),

    // incrementally maintained exact top-k: per-batch <= k-row partials
    // (top-k of a union of per-batch top-k's IS the global top-k), final
    // fold over batches*k rows; must equal the one-shot ranking
    "stream_topk_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayTopKIncremental(s, dir)),

    // distributed triangle counting: degree-ordered wedge closure
    // (compact-forward) over the nation trade graph — every triangle
    // generated once from its lowest-ordered vertex; oriented out-degree
    // O(sqrt|E|) bounds the wedge join under any skew
    "q_triangle_count" -> ((s, dir) =>
      graft.operators.Triangles.triangleCounts(
        graft.operators.Triangles.tradeGraph(
          Tables.lineitem(s, dir), Tables.orders(s, dir),
          Tables.customer(s, dir), Tables.supplier(s, dir)))),

    "q_pagerank_trade" -> ((s, dir) =>
      graft.operators.PageRank.weightedPageRank(
          tradeRevenueEdges(s, dir), iters = 5)
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("node"), col("n_name"))), "node")
        .select(col("n_name").as("nation"), col("pr"))),

    // PERSONALIZED PageRank: the same damped iteration with teleport
    // mass landing on the {0, 1} seed nations — rank as seen FROM the
    // seeds, the related-entity/trust-propagation primitive
    "q_ppr_trade" -> ((s, dir) =>
      graft.operators.PageRank.personalizedPageRank(
          tradeRevenueEdges(s, dir), seeds = Seq(0L, 1L), iters = 5)
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("node"), col("n_name"))), "node")
        .select(col("n_name").as("nation"), col("pr"))),

    // whole-graph topology summary: global clustering coefficient +
    // degree assortativity over the mutual top-7 trade graph — exact
    // integer wedge/triangle/moment sums, the oracle counts triangles
    // definitionally so the oriented-closure algorithm is cross-checked
    "q_graph_stats_trade" -> ((s, dir) =>
      graft.operators.GraphStats.summary(mutualTopTradeEdges(s, dir, 7))),

    // k-core decomposition (iterative peel) of the MUTUAL top-7 trade
    // partner graph — cohesion, where components give reachability and
    // triangles give local closure; the mutual-kNN construction is the
    // standard way to sparsify a near-complete weighted digest into a
    // graph whose core structure is informative
    "q_kcore_trade" -> ((s, dir) =>
      graft.operators.KCore.coreMembers(
          mutualTopTradeEdges(s, dir, topN = 7), k = 4)
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("node"), col("n_name"))), "node")
        .select(col("n_name").as("nation"), col("core_degree"))),

    // EDGE-level cohesion on the same graph: the 5-truss — every
    // surviving tie embedded in ≥3 triangles of the surviving graph (a
    // hub can hold a k-core together, never a k-truss); per-edge
    // support peel, one wedge-join aggregation per round
    "q_ktruss_trade" -> ((s, dir) => {
      val names = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))
      graft.operators.KTruss.trussEdges(
          mutualTopTradeEdges(s, dir, topN = 7), k = 5)
        .join(broadcast(names.select(col("n_nationkey").as("u"),
          col("n_name").as("nation_a"))), "u")
        .join(broadcast(names.select(col("n_nationkey").as("v"),
          col("n_name").as("nation_b"))), "v")
        .select(col("nation_a"), col("nation_b"), col("support"))
    }),

    // HITS hubs & authorities (5 synchronous iterations, max-norm) on
    // the DIRECTED customer→supplier nation graph — the link-analysis
    // split PageRank folds together: buying breadth vs supplying pull;
    // ordered in/out-neighbor folds, 1-row max digests broadcast back
    "q_hits_trade" -> ((s, dir) =>
      graft.operators.Hits.hits(
          tradeRevenueEdges(s, dir)
            .where(col("src") =!= col("dst"))
            .select(col("src"), col("dst")), iters = 5)
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("node"), col("n_name"))), "node")
        .select(col("n_name").as("nation"), col("authority"), col("hub"))),

    // link prediction on the same graph: common-neighbor count +
    // resource-allocation index (scaled-integer Σ floor(1e12/deg)) for
    // every NON-adjacent pair sharing a neighbor — the "which tie forms
    // next" primitive next to the cohesion family; one wedge join, one
    // anti-join, all-integer scores
    "q_linkpred_trade" -> ((s, dir) => {
      val names = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))
      graft.operators.LinkPrediction.predictLinks(
          mutualTopTradeEdges(s, dir, topN = 7))
        .join(broadcast(names.select(col("n_nationkey").as("a"),
          col("n_name").as("nation_a"))), "a")
        .join(broadcast(names.select(col("n_nationkey").as("b"),
          col("n_name").as("nation_b"))), "b")
        .select(col("nation_a"), col("nation_b"),
          col("common_neighbors"), col("ra_scaled"))
    }),

    // community detection on the same graph: deterministic synchronous
    // label propagation (most-frequent neighbor label + self-vote, ties
    // -> smallest label, fixed 4 rounds) — the partition the cohesion
    // family lacks: components say reachable, cores say dense, LPA says
    // which dense region each node belongs to
    "q_lpa_communities" -> ((s, dir) => {
      val names = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))
      graft.operators.Communities.labelCommunities(
          mutualTopTradeEdges(s, dir, topN = 7), iters = 4)
        .join(broadcast(names.select(col("n_nationkey").as("node"),
          col("n_name").as("nation"))), "node")
        .join(broadcast(names.select(col("n_nationkey").as("community"),
          col("n_name").as("community_leader"))), "community")
        .select(col("nation"), col("community_leader"))
    }),

    // wide grouped aggregation with derived expressions (TPC-H Q1 shape)
    "q_pricing_summary" -> BreadthQueries.pricingSummary _,
    // broadcast dimension join + aggregation
    "q_revenue_by_segment" -> BreadthQueries.revenueBySegment _,
    // multi-way star join
    "q_revenue_by_nation" -> BreadthQueries.revenueByNation _,
    // global top-k (TakeOrderedAndProject)
    "q_top_orders" -> ((s, dir) => BreadthQueries.topOrders(s, dir)),
    // revenue concentration (Pareto/ABC): top-100 customers, exact cent
    // running totals, integer-exact class bands, one double share
    "q_pareto_customers" -> ((s, dir) =>
      BreadthQueries.paretoCustomers(s, dir)),
    // analytic windows: lag + rank + exact running total
    "q_customer_order_analytics" -> BreadthQueries.customerOrderAnalytics _,
    // window breadth: ntile/percent_rank/cume_dist/nth_value + sliding
    // frame, one window spec (SQL WINDOW-clause surface)
    "q_window_breadth" -> BreadthQueries.windowBreadth _,
    // exact grouped distinct aggregation
    "q_distinct_users_by_type" -> BreadthQueries.distinctUsersByType _,
    // set operations (INTERSECT / EXCEPT)
    "q_set_ops_users" -> BreadthQueries.setOpsUsers _,
    // grouping sets via ROLLUP
    "q_rollup_balance" -> BreadthQueries.rollupRevenue _,
    // CUBE grouping sets: marginals + grand total, grouping() flags
    "q_cube_events" -> BreadthQueries.cubeEventStats _,
    // explicit GROUPING SETS: the mixed-marginal shape ROLLUP/CUBE can't
    "q_grouping_sets" -> BreadthQueries.groupingSetsEvents _,
    // equi + range (band) join
    "q_shipped_within_90d" -> BreadthQueries.shippedWithin90d _,
    // Kaplan-Meier churn curve with proper censoring (users active at
    // the observation edge are censored, not churned): one corpus pass,
    // then an at-risk reverse cumsum + product fold on the duration digest
    // censorDays = 1 on the synthetic corpus (users are active to the
    // edge; gaps are 0-2 days) so BOTH the churn-product and the
    // censor arm are exercised at every sweep scale
    "q_survival_km" -> ((s, dir) =>
      graft.operators.Survival.kaplanMeier(s, dir, censorDays = 1)),
    // incremental KM: per-user (first, last) spans are value-idempotent
    // mergeable partials (min/max) — maintained LSM-style, folded, and
    // pushed through the same digest-side product
    "stream_survival_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replaySurvivalIncremental(s, dir)),

    // gap-based sessionization (30-minute gap). Session bounds surface as
    // epoch MICROsecond longs so the hash compare is timezone- and
    // engine-representation-independent (DuckDB NTZ vs Spark session-TZ).
    "q_sessionize" -> ((s, dir) =>
      Sessionize.sessionStats(Tables.events(s, dir), "user_id", "ts",
          gapSeconds = 1800L, tiebreak = col("event_id"), valueCol = "value")
        .withColumn("session_start", unix_micros(col("session_start")))
        .withColumn("session_end", unix_micros(col("session_end")))),
    // path analysis: each session's first-5-event path string, top-10
    // paths corpus-wide — the per-session reassembly sorts collected
    // structs, so it is shuffle-order-proof
    "q_session_paths" -> ((s, dir) =>
      Sessionize.topSessionPaths(Tables.events(s, dir), "user_id", "ts",
        gapSeconds = 1800L, tiebreak = col("event_id"),
        stepCol = "event_type")),

    // exact interpolated percentiles per group (sort-based, not sketch)
    "q_exact_percentiles" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type")).agg(
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.9)).as("p90"))),

    // trending ranking with exact DYADIC time decay (weights are
    // negative powers of two — order-independent double sums, no libm)
    "q_trending_events" -> ((s, dir) =>
      graft.analysis.EventAnalytics.trending(Tables.events(s, dir))),

    // A/B experiment readout: deterministic parity-bucket arms,
    // conversion = >= 15 purchases, two-proportion z-test on exact
    // counts — one per-user digest + a 1-row aggregate
    "q_ab_test" -> ((s, dir) =>
      graft.analysis.EventAnalytics.abTest(Tables.events(s, dir))),
    // CUPED variance-reduced readout: pre-period spend as the control
    // covariate, pooled theta from exact cent-long moments; rho_sq IS
    // the sensitivity CUPED buys
    "q_cuped_readout" -> ((s, dir) =>
      graft.analysis.EventAnalytics.cupedReadout(Tables.events(s, dir))),

    // ordered conversion funnel view -> click -> purchase: earliest view,
    // earliest click strictly after it, earliest purchase strictly after
    // that — conditional-min stage joins, everything keyed on user_id
    "q_funnel_steps" -> ((s, dir) =>
      graft.analysis.EventAnalytics.funnel(s, dir)
        .select(col("user_id"), unix_micros(col("view_ts")).as("view_us"),
          unix_micros(col("click_ts")).as("click_us"),
          unix_micros(col("purchase_ts")).as("purchase_us"),
          col("stage_reached"))),

    // retention-cohort matrix: first-event day x day-offset activity
    // counts; the (user, day) distinct runs BEFORE the cohort join
    "q_retention_cohorts" -> ((s, dir) =>
      graft.analysis.EventAnalytics.retentionCohorts(s, dir)),

    // first-order Markov transition matrix: lead() over the per-user
    // (ts, event_id) total order, counts to a |types|^2 digest, row-
    // normalized probability as one IEEE division of exact longs
    "q_event_transitions" -> ((s, dir) =>
      graft.analysis.EventAnalytics.transitionMatrix(s, dir)),

    // market-basket association rules: per-order item-set digest, suffix
    // pair expansion (fanout <= items/order), pair counts >= 2, support/
    // confidence/lift as fixed double trees over exact longs
    "q_market_basket" -> ((s, dir) =>
      graft.analysis.Association.marketBasketRules(s, dir)),

    // RFM segmentation: quartile boundaries as an exact-percentile AGG
    // over the customer digest (broadcast back) — never a global ntile
    // window; raw metrics exact longs, scores pure comparisons
    "q_rfm_segments" -> ((s, dir) =>
      graft.analysis.CustomerAnalytics.rfmSegments(s, dir)),

    // corrupt-record QUARANTINE: a feed where every 7th payload is
    // truncated mid-object; malformed rows route to quarantine instead
    // of failing the job or silently dropping — the tolerance contract
    // any real ingestion needs (from_json yields null on malformed)
    "ing_corrupt_quarantine" -> ((s, dir) => {
      val good = concat(lit("{\"id\":"), col("doc_id"),
        lit(",\"lang\":\""), col("lang"),
        lit("\",\"src\":\""), col("source"), lit("\"}"))
      val js = when(col("doc_id") % 7 === 0,
        concat(lit("{\"id\":"), col("doc_id"), lit(",\"lang\":\""), col("lang")))
        .otherwise(good)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          from_json(js, org.apache.spark.sql.types.StructType.fromDDL(
            "lang STRING, src STRING")).as("r"))
        .select(col("doc_id"),
          when(col("r.lang").isNull, lit("quarantined"))
            .otherwise(lit("ok")).as("status"),
          col("r.lang").as("v_lang"), col("r.src").as("v_src"))
    }),

    // correlated LATERAL subquery (SQL:2016 lateral derived table): the
    // per-order top-2 line items as a lateral ORDER BY ... LIMIT — the
    // SQL surface users reach for before they know window functions;
    // Catalyst decorrelates it to the same shuffle-once ranked shape
    // RECURSIVE CTE (Spark 4's WITH RECURSIVE surface): bounded-hop
    // transitive closure over the thresholded trade graph — min hop
    // count and ≤3-hop walk count from nation 0. The recursion runs on
    // the |nations|² edge DIGEST (the corpus-scale work is the edge
    // aggregation); ONE SQL text serves both engines verbatim
    "q_recursive_closure" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.supplier(s, dir).createOrReplaceTempView("supplier")
      // materialize the |nations|²-bounded edge digest ONCE; the
      // recursion re-evaluates its step subtree per hop and must only
      // rescan the digest, never the 4-table aggregation
      s.sql(RecursiveClosureEdgesSql).localCheckpoint(true)
        .createOrReplaceTempView("recursive_closure_edges")
      s.sql(recursiveClosureOverSql("recursive_closure_edges"))
    }),

    // hop-bounded WEIGHTED shortest paths over the same trade digest:
    // edge cost inverse to trade revenue, Pregel-style min-plus rounds
    // (the engine RELAXES; only the oracle enumerates walks)
    "q_shortest_path_trade" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.supplier(s, dir).createOrReplaceTempView("supplier")
      graft.operators.ShortestPaths.boundedSingleSource(
        s.sql(ShortestPathEdgesSql), source = 0L, maxHops = 4)
    }),

    "q_lateral_topn" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_lat")
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_lat")
      s.sql("""
        SELECT o_orderkey, l.l_linenumber, l.l_extendedprice
        FROM orders_lat, LATERAL (
          SELECT l_linenumber, l_extendedprice FROM lineitem_lat
          WHERE l_orderkey = o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber ASC LIMIT 2) l
        WHERE o_totalprice > 400000.0""")
    }),

    // semi-structured VARIANT path (Spark 4): parse once into the binary
    // variant encoding, then typed path extraction — the modern engine
    // shape for schema-on-read JSON (no per-field re-parse, no rigid
    // from_json schema declared up front)
    "q_variant_extract" -> ((s, dir) => {
      val js = concat(lit("{\"id\":"), col("doc_id"),
        lit(",\"lang\":\""), col("lang"),
        lit("\",\"meta\":{\"src\":\""), col("source"),
        lit("\",\"n\":"), col("n_chars"), lit("}}"))
      Tables.documents(s, dir)
        .select(col("doc_id"), parse_json(js).as("v"))
        .select(col("doc_id"),
          variant_get(col("v"), "$.lang", "string").as("v_lang"),
          variant_get(col("v"), "$.meta.src", "string").as("v_src"),
          variant_get(col("v"), "$.meta.n", "bigint").as("v_n"))
    }),

    // runtime bloom-filter join pruning: the selective dimension filter
    // is turned into a bloom filter evaluated on the FACT side's scan,
    // cutting the big side's shuffle volume before the join — the AQE
    // runtime-filter shape that matters when neither side broadcasts.
    // Isolated session: broadcast off (at 100 TB neither side fits) and
    // the size thresholds opened so the rule fires at test scale.
    "q_runtime_filter" -> ((s, dir) => {
      val rf = s.newSession()
      rf.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      rf.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      rf.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val o = rf.read.parquet(s"$dir/orders.parquet")
        .where(col("o_totalprice") > lit(475000.0))
      rf.read.parquet(s"$dir/lineitem.parquet")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
    }),

    // footer-only aggregation: COUNT/MIN/MAX answered from parquet
    // row-group metadata via the v2 scan's aggregate pushdown — zero
    // data pages read however large the table (the isolated session
    // keeps the v2-reader switch from leaking into other queries' plans)
    "q_agg_pushdown" -> ((s, dir) => {
      val v2 = s.newSession()
      v2.conf.set("spark.sql.sources.useV1SourceList", "")
      v2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      // long/double columns: parquet stats cover them (timestamp min/max
      // is NOT pushable — one unsupported aggregate disables the whole
      // pushdown)
      v2.read.parquet(s"$dir/lineitem.parquet")
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_orderkey")).as("min_okey"),
          max(col("l_orderkey")).as("max_okey"),
          max(col("l_extendedprice")).as("max_price"))
    }),

    // single-pass data-quality profile (one aggregate, all rules)
    "dq_lineitem_profile" -> ((s, dir) =>
      graft.operators.DataQuality.profile(Tables.lineitem(s, dir), Seq(
        graft.operators.DataQuality.Rule("qty_positive", col("l_quantity") > 0),
        graft.operators.DataQuality.Rule("price_positive", col("l_extendedprice") > 0),
        graft.operators.DataQuality.Rule("discount_unit", col("l_discount").between(0, 1)),
        graft.operators.DataQuality.Rule("flag_domain",
          col("l_returnflag").isin("A", "N", "R"))))),

    // key-skew diagnostic on the events join key: the numbers that
    // decide salting vs AQE vs nothing — exact per-key count digest +
    // 1-row profile, one shuffle total
    "dq_skew_profile" -> ((s, dir) =>
      graft.operators.DataQuality.keySkewProfile(
        Tables.events(s, dir), "user_id")),

    // Benford first-digit audit on the amounts column: exact digit
    // counts + the log10(1+1/d) expectation and chi-square terms
    "dq_benford" -> ((s, dir) =>
      graft.operators.DataQuality.benfordDigits(
        Tables.lineitem(s, dir), "l_extendedprice")),

    // the POSITIVE Benford exemplar: the squared event value is
    // multiplicative (doubled log-spread) and conforms with a small
    // chi-square sum — pinning the audit's conforming branch
    "dq_benford_conforming" -> ((s, dir) =>
      graft.operators.DataQuality.benfordDigits(
        Tables.events(s, dir).where(col("value") >= 1)
          .select((col("value") * col("value"))
            .cast("decimal(18,6)").as("amt")), "amt")),

    // daily-volume anomaly monitor: each day's row count z-scored
    // against its trailing-7-day baseline (current day excluded) —
    // exact integer moments, double z tree (the Bollinger recipe)
    "dq_volume_anomaly" -> ((s, dir) =>
      graft.operators.DataQuality.volumeAnomaly(
        Tables.events(s, dir), "ts")),
    // the incrementally maintained day-count digest must converge to
    // the one-shot monitor — same oracle verbatim
    "stream_volume_anomaly_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayVolumeAnomalyIncremental(s, dir)),

    // k-anonymity audit: every (nation, segment) equivalence class
    // below k re-identifies its members — one map-side-combinable
    // groupBy on the quasi-identifier tuple, empty result = anonymous
    "dq_k_anonymity" -> ((s, dir) =>
      graft.operators.DataQuality.kAnonymityViolations(
        Tables.customer(s, dir), Seq("c_nationkey", "c_mktsegment"), 10L)),

    // chi-square distribution-drift monitor (log-free PSI): current
    // half of the span tested against the reference half over fixed
    // value buckets; bucket terms fold in bucket order
    "dq_drift_chi2" -> ((s, dir) =>
      graft.operators.DataQuality.driftChi2(
        Tables.events(s, dir), "value", "ts")),
    // the continuous sibling: two-sample Kolmogorov-Smirnov on the
    // UNBINNED values — exact integer CDF-gap core, sqrt-free 5% flag
    "dq_ks_drift" -> ((s, dir) =>
      graft.operators.DataQuality.ksDrift(
        Tables.events(s, dir), "value", "ts")),
    // the alarm arm, pinned by construction (the corpus is stationary):
    // current half shifted +20 — the flag must fire
    "dq_ks_drift_shifted" -> ((s, dir) =>
      graft.operators.DataQuality.ksDriftShifted(
        Tables.events(s, dir), "value", "ts")),
    // the whole-CDF sibling: two-sample Cramér-von-Mises integrates the
    // squared CDF gap over every sample point (DECIMAL-exact numerator,
    // string-path double division) — prices persistent small shifts KS
    // under-weights
    "dq_cvm_drift" -> ((s, dir) =>
      graft.operators.DataQuality.cvmDrift(
        Tables.events(s, dir), "value", "ts")),
    // its alarm arm: current half shifted +20, flag must fire
    "dq_cvm_drift_shifted" -> ((s, dir) =>
      graft.operators.DataQuality.cvmDriftShifted(
        Tables.events(s, dir), "value", "ts")),

    // functional-dependency profiling: per candidate det→dep, the
    // violating-key count — o_orderkey→o_custkey HOLDS (it is the key),
    // the reverse-direction candidates are live violations
    "dq_functional_deps" -> ((s, dir) =>
      graft.operators.DataQuality.functionalDependencies(
        Tables.orders(s, dir), Seq(
          "o_orderkey" -> "o_custkey",
          "o_custkey" -> "o_orderstatus",
          "o_orderpriority" -> "o_orderstatus"))),

    // l-diversity audit: classes whose sensitive attribute (balance
    // k-bucket) takes < 8 distinct values leak by homogeneity even
    // when k-anonymous — k-anonymity's complement
    "dq_l_diversity" -> ((s, dir) =>
      graft.operators.DataQuality.lDiversityViolations(
        Tables.customer(s, dir), Seq("c_nationkey", "c_mktsegment"),
        floor(col("c_acctbal").cast("double") / 1000.0).cast("long"), 8L)),

    // declarative data contract: completeness + range + key-uniqueness +
    // referential integrity validated into one per-constraint report —
    // row-level checks share ONE scan, the FK check is one semi-join
    "dq_constraints" -> ((s, dir) => {
      import graft.operators.DataQuality._
      validate(Tables.lineitem(s, dir), Seq(
        Complete("complete_suppkey", "l_suppkey"),
        Satisfies("qty_range", col("l_quantity").between(1, 50)),
        Unique("unique_line", Seq("l_orderkey", "l_linenumber")),
        SubsetOf("fk_orders", "l_orderkey",
          Tables.orders(s, dir), "o_orderkey")))
    }),

    // per-pair 3σ outlier ticks: exact integer moments broadcast onto
    // the tick stream, one double comparison per row — the fat-finger
    // detector; σ=0 / single-tick pairs emit nothing
    "fx_outliers" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.rateOutliers(rates(s, dir))),

    // hour-of-day seasonal profile + per-hour anomaly counts: ticks
    // judged against their own session-hour's distribution; bounded
    // |pairs|×24 output, corpus never shuffled
    "fx_seasonality" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.hourlySeasonality(rates(s, dir))),

    // historical VaR95/ES95 per pair: interpolated 5th percentile of
    // daily changes + the exact mean of the integer-defined worst-k
    // tail; runs on the change digest, never the tick corpus
    "fx_var_es" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.valueAtRisk(rates(s, dir))),

    // two-sided CUSUM drift alarms: persistent small moves trip the
    // detector where z-scores stay silent — an ALL-INTEGER five-state
    // recursive fold over the change digest, replayed value-exactly
    "fx_cusum" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.cusum(rates(s, dir))),

    // MA-crossover backtest: strategy eval as a query — cross-multiplied
    // integer window sums (no mean ever materialized), lagged signal
    // (no look-ahead), exact long P&L; O(1) state per pair
    "fx_backtest_ma" -> ((s, dir) =>
      graft.analysis.MarketAnalytics.backtestMaCrossover(rates(s, dir))),

    // the WRITE-PATH DQ gate: the same rule counters observed IN-FLIGHT
    // (Dataset.observe / CollectMetrics) while the instrumented frame
    // flows to a noop-format write — the zero-extra-scan shape a 100 TB
    // write pipeline gates on; must equal the second-scan profile
    "dq_observe_lineitem" -> ((s, dir) =>
      graft.operators.DataQuality.observedProfile(
        Tables.lineitem(s, dir), Seq(
          graft.operators.DataQuality.Rule("qty_positive", col("l_quantity") > 0),
          graft.operators.DataQuality.Rule("price_positive", col("l_extendedprice") > 0),
          graft.operators.DataQuality.Rule("discount_unit", col("l_discount").between(0, 1)),
          graft.operators.DataQuality.Rule("flag_domain",
            col("l_returnflag").isin("A", "N", "R")))) { instrumented =>
        instrumented.write.format("noop").mode("overwrite").save()
      }),

    // full outer join: reconcile click-days vs purchase-days per user
    "q_full_outer_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def daily(t: String, n: String) = ev.where(col("event_type") === t)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as(n))
      daily("click", "n_clicks")
        .join(daily("purchase", "n_purchases"), Seq("user_id", "day"), "full_outer")
        .select(col("user_id"), col("day"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
    }),

    // semi join (EXISTS): customers with at least one 250k+ order
    "q_semi_join" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).where(col("o_totalprice") > 250000)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))),

    // anti join (NOT EXISTS): customers with NO order above 250k — the
    // complement of q_semi_join, same broadcast-able filtered build side
    "q_anti_join" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).where(col("o_totalprice") > 250000)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))),

    // pivot (wide reshaping): events per day × type matrix
    "q_pivot_daily_types" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", types).count()
      p.select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
    }),

    // interval × interval overlap join: per-user daily click-activity
    // spans vs error-activity spans (which clicks happened inside an
    // incident window) — quantized to an equi-join like q_range_join,
    // with each pair emitted only in the overlap's CANONICAL first
    // bucket so no post-join dedup exists; oracle is the naive
    // inequality join
    "q_interval_overlap" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def spans(t: String, pfx: String) = ev
        .where(col("event_type") === t)
        .groupBy(col("user_id"), to_date(col("ts")).as(s"${pfx}_date"))
        .agg(min(col("ts")).as(s"${pfx}_start"),
          max(col("ts")).as(s"${pfx}_end"))
      graft.operators.RangeJoin.intervalOverlap(
          spans("click", "a"), spans("error", "b"),
          "a_start", "a_end", "b_start", "b_end", Seq("user_id"),
          bucketMicros = 3600L * 1000000)
        .select(col("user_id"), col("a_date"), col("b_date"),
          col("a_start"), col("a_end"), col("b_start"), col("b_end"))
    }),

    // batch RANGE JOIN via time-axis quantization (operators.RangeJoin):
    // each purchase opens a 6-hour attribution window; the same user's
    // clicks inside it are counted. The BETWEEN join runs as a plain
    // equi-join on (user, 6h-bucket) with a residual filter — never the
    // nested-loop plan the declarative form degrades to (plan pinned in
    // RangeJoinSpec)
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_event_id"),
          col("ts").as("p_ts"),
          (col("ts") + expr("INTERVAL 6 HOURS")).as("p_end"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"),
          col("value").cast("decimal(18,2)").as("c_value"))
      graft.operators.RangeJoin.pointInInterval(clicks, purchases,
          "c_ts", "p_ts", "p_end", Seq("user_id"),
          bucketMicros = 6L * 3600 * 1000000)
        .groupBy(col("p_event_id"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("c_value")).cast("double").as("click_value"))
    }),

    // the inverse surface: UNPIVOT (melt) the wide daily matrix back to
    // long (day, event_type, n) rows — the relational round-trip proves
    // both directions. Zero cells (a type absent on a day) are melted
    // then dropped, matching the plain GROUP BY the oracle runs.
    "q_unpivot_daily_types" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", types).count()
      wide.unpivot(Array(col("day")), types.map(col).toArray,
          "event_type", "n")
        .where(col("n").isNotNull && col("n") > 0)
    }),

    // typed Dataset Aggregator: bounded top-k per group (k doubles/group
    // cross partial aggregation — the distributed top-k shape). The
    // descending array is exploded to (o_custkey, rank, price) scalar rows
    // because the oracle gate cannot sort/hash array-typed columns.
    "q_typed_topk_per_customer" -> ((s, dir) => {
      import s.implicits._
      val topk = new graft.operators.TopKAggregator(3).toColumn
      Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"))
        .as[(Long, Double)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(topk.name("top_prices"))
        .toDF("o_custkey", "top_prices")
        .select(col("o_custkey"), posexplode(col("top_prices")).as(Seq("pos", "price")))
        .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rank"), col("price"))
    }),

    // approximate aggregates (HLL distinct + quantile sketch), made
    // oracle-checkable: the row carries the EXACT anchors (the oracle
    // recomputes them) plus in-engine booleans asserting each approx
    // value sits within its documented error bound — HLL++ default
    // rsd 0.05 gets a 3σ relative window (0.15); percentile_approx at
    // accuracy 1000 has rank error ≤ 0.001, checked against exact
    // quantiles ±0.02 rank (20× the bound; 0.999 on the p99 high side).
    // The oracle emits the anchors and TRUE literals — bound-tightness
    // itself is pinned by ApproxStatsSpec.
    "q_approx_stats" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type")).agg(
        countDistinct(col("user_id")).as("n_users_exact"),
        approx_count_distinct(col("user_id")).as("au"),
        percentile(col("value"), lit(0.5)).as("p50_exact"),
        percentile(col("value"), lit(0.99)).as("p99_exact"),
        percentile(col("value"), lit(0.48)).as("p50_lo"),
        percentile(col("value"), lit(0.52)).as("p50_hi"),
        percentile(col("value"), lit(0.97)).as("p99_lo"),
        percentile(col("value"), lit(0.999)).as("p99_hi"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("ap50"),
        percentile_approx(col("value"), lit(0.99), lit(1000)).as("ap99"))
      .select(col("event_type"), col("n_users_exact"),
        col("p50_exact"), col("p99_exact"),
        (abs(col("au") - col("n_users_exact")).cast("double")
          / col("n_users_exact") <= 0.15).as("users_ok"),
        col("ap50").between(col("p50_lo"), col("p50_hi")).as("p50_ok"),
        col("ap99").between(col("p99_lo"), col("p99_hi")).as("p99_ok"))),

    // KMV distinct sketch: the mergeable O(k) cardinality estimator with
    // a DETERMINISTIC replay — xxhash64 k-min set + (k−1)·2⁶⁴/u_k, every
    // step value-exact in the DuckDB oracle (unlike HLL++ above, which
    // only gets a rows-only check). k=64 < |keys| at gate scale so the
    // ESTIMATOR branch is what the oracle cross-checks, not the
    // trivial below-k exact fallback
    "q_kmv_distinct" -> ((s, dir) =>
      graft.operators.Kmv.distinctEstimate(
        Tables.events(s, dir), "user_id", k = 64)),

    // histogram quantile sketch: equi-width integer bins (mergeable,
    // one map-side-combinable groupBy to <= nBins rows) + interpolated
    // percentile estimates computed on the digest alone — the o(n)
    // alternative to the exact sort-based percentile
    "q_hist_percentiles" -> ((s, dir) => {
      val bins = graft.operators.HistogramSketch.binCounts(
        Tables.lineitem(s, dir), "l_extendedprice", 0.0, 80000.0, 64)
      graft.operators.HistogramSketch.percentiles(
        s, bins, 0.0, 80000.0, 64, Seq(0.25, 0.5, 0.75, 0.9, 0.99))
    }),

    // HyperLogLog register table: the industry-standard distinct
    // sketch next to KMV — exact integer registers (top-p-bit routing,
    // clz rank), one narrow map + one map-side-combinable groupBy to a
    // <= 2^p-row digest; the estimate derives from the registers
    "q_hll_registers" -> ((s, dir) =>
      graft.operators.Hll.registers(Tables.events(s, dir), "user_id")),
    // incremental HLL: per-batch register partials folded by max —
    // idempotent by value, no batch markers; must equal the one-shot
    "stream_hll_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayHllIncremental(s, dir)),
    // per-segment HLL registers: distinct-users-per-segment dashboards
    // from one scan; group sketches roll up to the global by the same
    // max fold (union property)
    "q_hll_grouped" -> ((s, dir) =>
      graft.operators.Hll.registersPerGroup(
        Tables.events(s, dir), "event_type", "user_id")),

    // rolling 7-day distinct actives per day (the DAU/WAU family):
    // windowed COUNT DISTINCT is not window-function-expressible, so
    // each (user, day) of the distinct-presence digest is fanned onto
    // the 7 window-end days it serves (bounded 7× replication of the
    // DIGEST, never the event corpus) and exact distinct counts group
    // per day; the calendar grid over the corpus span emits EXPLICIT
    // zeros for fully-quiet windows — a missing row would read as
    // missing data where the true answer is 0
    "q_rolling_dau" -> ((s, dir) => {
      val days = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val span = days.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val calendar = span
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val counts = days
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("w_day"))
        .groupBy(col("w_day"))
        .agg(countDistinct(col("user_id")).as("c"))
      calendar
        .join(counts, col("day") === col("w_day"), "left")
        .select(col("day"), coalesce(col("c"), lit(0L)).as("dau_7d"))
    }),

    // grouped KMV: distinct (user, day) activity per event type from one
    // O(k)-per-group sketch — the rank filter plans as a WindowGroupLimit
    // so no group's hash set is ever fully sorted; hash-verified like the
    // global sketch
    "q_kmv_grouped" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          (col("user_id") * lit(100000L)
            + datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
              .cast("long")).as("day_key"))
      graft.operators.Kmv.distinctEstimatePerGroup(
        ev, "event_type", "day_key", k = 64)
    }),

    // KMV set algebra: click vs purchase (user, day) activity sets
    // compared from their O(k) sketches alone — union / Jaccard /
    // intersection estimates without joining the raw populations; the
    // whole report hash-verified like q_kmv_distinct (the union sketch
    // IS a KMV sketch — mergeability — and membership is exact set
    // membership on replayable hashes)
    "q_kmv_set_algebra" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def keys(t: String) = ev.where(col("event_type") === t)
        .select((col("user_id") * lit(100000L)
          + datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
            .cast("long")).as("day_key"))
      graft.operators.Kmv.setAlgebra(
        keys("click"), keys("purchase"), "day_key", k = 64)
    }),

    // Count-Min heavy hitters: d×w counter cells via the multi-arg
    // xxhash64 fold, min-over-rows estimate for the exact top keys —
    // the sketch hash-verified in DuckDB. w=64 forces REAL collisions
    // at gate scale, so the cross-engine check covers the inflated
    // estimates, not just the collision-free identity
    "q_cms_heavy_hitters" -> ((s, dir) =>
      graft.operators.CountMin.heavyHitters(
        Tables.events(s, dir), "user_id", w = 64)),

    // sampled percentiles: exact interpolated quantiles over the
    // DETERMINISTIC md5-prefix ~10% sample (the third leg of the
    // replayable-approximation family: sketch cardinality, sketch
    // frequency, sampled quantiles) — the sample predicate is a pure
    // pushed filter, the hash replays in any engine
    "q_sampled_percentiles" -> ((s, dir) =>
      Tables.events(s, dir)
        .where(substring(md5(col("event_id").cast("string")), 1, 2) < "1a")
        .groupBy(col("event_type")).agg(
          count(lit(1)).as("n_sampled"),
          percentile(col("value"), lit(0.5)).as("p50"),
          percentile(col("value"), lit(0.99)).as("p99"))),

    // skew-salted join: hot keys spread across shards (rows-only check —
    // result equals the plain join; the plan shape is the point)
    "q_salted_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.SaltedJoin.saltedEquiJoin(
        ev.select(col("event_id"), col("user_id"), col("value")),
        Tables.customer(s, dir)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment")),
        keys = Seq("user_id"), shards = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    }),

    // named as-of join (the PreviousRates capability, generalized):
    // each purchase gets the user's last click value at-or-before it
    // CALENDAR RESAMPLE + FORWARD FILL (gap filling): a generated daily
    // grid (distinct pairs × the table's global day span) probed with a
    // day-end backward as-of join — each (pair, day) carries the latest
    // quote at-or-before end of day; days before a pair's first quote
    // stay null. The grid generation is sequence()+explode (no driver
    // loop); the fill rides the as-of family's single-shuffle
    // union-window plan, so resampling a 100 TB history costs one
    // Exchange on the pair key.
    "fx_resample_ffill" -> ((s, dir) => {
      val r = Tables.rates(s, dir)
      val span = r.agg(min(to_date(col("timestamp"))).as("d0"),
        max(to_date(col("timestamp"))).as("d1"))
      val grid = r.select(col("ccy_couple")).distinct()
        .crossJoin(broadcast(span))
        .select(col("ccy_couple"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val probe = grid.withColumn("__pt",
        to_timestamp(col("day")) + expr("INTERVAL 1 DAY")
          - expr("INTERVAL 1 MICROSECOND"))
      AsOfJoin.asofBackward(probe,
          r.select(col("ccy_couple"), col("timestamp"), col("rate")),
          keys = Seq("ccy_couple"), leftTime = "__pt",
          rightTime = "timestamp",
          valueCols = Seq("rate" -> "rate_ffill"))
        .select(col("ccy_couple"), col("day"), col("rate_ffill"))
    }),

    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      AsOfJoin.asofBackward(
        ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts")),
        ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value")),
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        valueCols = Seq("value" -> "last_click_value"))
    }),

    // forward as-of: each purchase gets the user's NEXT click value
    // at-or-after it (mirror window, same single shuffle)
    "q_asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      AsOfJoin.asofForward(
        ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts")),
        ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value")),
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        valueCols = Seq("value" -> "next_click_value"))
    }),

    // nearest-within-tolerance as-of: the closer of the two directions
    // within 1 hour, ties backward; both passes ride one shuffle
    "q_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      AsOfJoin.asofNearest(
        ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts")),
        ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value")),
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        valueCols = Seq("value" -> "nearest_click_value"),
        toleranceMicros = 3600L * 1000000L)
    }),

    // ---- text-analysis pipeline operators (documents table) ----

    // token / subword / punctuation counting, alpha density
    "text_stats" -> TextFunctions.textStats _,
    // composite quality score
    "text_quality" -> TextFunctions.textQuality _,
    // Flesch-Kincaid grade, all-integer milli-grade variant + band —
    // the complexity signal next to the cleanliness scores; pure
    // codegen'd regexp_count map, no shuffle
    "text_readability" -> TextFunctions.readability _,
    // curriculum-learning stages: exact (grade, doc_id) rank via the
    // two-pass distributed prefix count, 4 equal-frequency stages by
    // one integer floor division — no global sort touches the corpus
    "cur_curriculum_stages" -> graft.text.Curation.curriculumStages _,
    // the Gopher per-rule filter breakdown: each published drop rule as
    // an auditable boolean next to the composite score
    "text_gopher_rules" -> ((s, dir) =>
      TextFunctions.textGopherRules(s, dir)),
    // canary-string eval-integrity sweep: exact substring watch-list
    // hits per (doc, canary) via the replace-length identity — no
    // regex, no shuffle
    "text_canary_scan" -> ((s, dir) =>
      TextFunctions.textCanaryScan(s, dir)),
    // tokenizer-fertility diagnostic: words/subwords/chars per language
    // with subwords-per-word and chars-per-subword
    "cur_token_fertility" -> ((s, dir) =>
      graft.text.Curation.tokenFertility(s, dir)),
    // n-gram-heuristic language ID with per-language scores
    "text_langid" -> TextFunctions.textLangId _,
    // Gopher-style repetition stats + keep/drop gate (single codegen'd
    // sort+fold per document — no token explode, no shuffle)
    "text_repetition" -> TextFunctions.textRepetition _,
    // corpus-frequent trigram-phrase fraction per doc (cross-document
    // boilerplate signal — the complement of text_repetition's
    // within-document fractions)
    "text_boilerplate" -> ((s, dir) =>
      TextFunctions.textBoilerplate(s, dir)),
    // canonical-form content fingerprint
    "text_fingerprint" -> TextFunctions.textFingerprint _,
    // exact dedup clusters keyed by fingerprint
    "dedup_exact" -> TextFunctions.dedupExact _,
    // Bloom pre-filter: incoming half probed against the reference
    // half's broadcast bit digest — zero false negatives by construction
    "dedup_bloom_prefilter" -> ((s, dir) =>
      TextFunctions.bloomRefDedup(s, dir)),
    // MinHash + LSH banding near-dup (hash-checked: the XXH64 signature
    // pipeline is replayed in DuckDB by graft.oracle.XxhOracleSql)
    "dedup_minhash_lsh" -> ((s, dir) => NearDup.minhashLsh(s, dir)),
    // 64-bit SimHash + Hamming nearest (hash-checked, same replay)
    "dedup_simhash" -> ((s, dir) => NearDup.simhashReport(s, dir)),
    // exact char-trigram Jaccard in (lang, source) buckets (oracle-checked)
    "dedup_ngram_jaccard" -> ((s, dir) => NearDup.ngramJaccardPairs(s, dir)),
    // GLOBAL exact-threshold similarity self-join via PPJoin prefix
    // filtering — lossless (no blocking key, no bucket cap); the oracle
    // verifies against naive all-pairs, which must agree pair for pair
    "dedup_ppjoin" -> ((s, dir) => graft.text.PpJoin.pairs(s, dir)),
    // DIRECTIONAL containment (quote / near-superset detection) — the
    // asymmetric measure Jaccard can't express; contained side
    // prefix-pruned, container side fully indexed, exact verification
    "dedup_containment" -> ((s, dir) => graft.text.PpJoin.containment(s, dir)),
    // recall property-oracles: every exact trigram-Jaccard>=0.8 pair must
    // be covered by the family's candidate pairs (violations must be 0 —
    // external evidence the LSH candidates are any good)
    "dedup_minhash_recall" -> ((s, dir) => NearDup.minhashRecallCheck(s, dir)),
    "dedup_simhash_recall" -> ((s, dir) => NearDup.simhashRecallCheck(s, dir)),
    // near-dup CLUSTERS: connected components of the exact-Jaccard pair
    // graph via hash-min label propagation; oracle replays it with a
    // recursive CTE (min over the transitive closure)
    "dedup_clusters" -> ((s, dir) => NearDup.nearDupClustersCached(s, dir)),
    // canonical keeper per cluster: highest-quality member wins (ties ->
    // lowest doc_id); quality scored only for cluster members, argmax is
    // a WindowGroupLimit top-1 per cluster
    "dedup_canonical_keeper" -> ((s, dir) => NearDup.canonicalKeepers(s, dir)),
    // fuzzy key join (record linkage): customer-name pairs at edit
    // distance <= 1 via FastSS deletion-neighborhood blocking + exact
    // levenshtein verify -- one variant equi-join, never O(n^2)
    "dedup_fuzzy_keys" -> ((s, dir) =>
      graft.operators.FuzzyJoin.edit1Pairs(
        Tables.customer(s, dir), "c_custkey", "c_name")),
    // schema-evolved feed read: three parquet generations with different
    // schemas merged into ONE scan (mergeSchema), nulls where a
    // generation predates a column
    "ing_schema_evolution" -> ((s, dir) =>
      graft.sources.SchemaEvolution.evolvedDocsRead(s, dir)),
    // EXTERNAL CDC interop: Debezium-style op/before/after JSON envelopes
    // parsed schema-first and adapted onto the engine's changelog
    // contract; Cdc.applyChangelog reconstructs the final state
    "ing_cdc_envelope" -> ((s, dir) =>
      graft.ingest.CdcEnvelope.appliedState(s, dir)),

    // ORC round-trip: the events feed written to ORC (the other columnar
    // format a lakehouse ingests) and read back through Spark's native
    // ORC source; the aggregate must equal the parquet-derived oracle —
    // format-independence of the engine, decimal-routed sum
    "ing_orc_roundtrip" -> ((s, dir) => {
      val tmp = graft.util.Scratch.dir("graft_orc").resolve("events").toString
      Tables.events(s, dir).write.mode("overwrite").orc(tmp)
      s.read.orc(tmp).groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
    }),
    // EXACT substring-span dedup (Lee et al. 2022 shape): maximal
    // verbatim token runs >= 12 shared between doc pairs, via anchor
    // diagonals + gaps-and-islands — span-level duplication shingle-set
    // Jaccard can't see
    "dedup_substring" -> ((s, dir) => NearDup.substringSpans(s, dir)),

    // ---- curation operators (deterministic, RNG-free) ----

    // ~10% hash sample: md5-prefix filter, reproducible across engines
    "cur_hash_sample" -> ((s, dir) => graft.text.Curation.hashSample(s, dir)),
    // 75/12.5/12.5 train/val/test split on the first hash nibble
    "cur_train_val_test" -> ((s, dir) => graft.text.Curation.trainValTest(s, dir)),
    // group-leakage-safe split: whole sources assigned to one split;
    // the report contrasts doc-level straddling vs the group guarantee
    "cur_group_split" -> ((s, dir) => graft.text.Curation.groupSplit(s, dir)),
    // source balancing: <=50 docs per (lang, source) in hash order
    "cur_source_quota" -> ((s, dir) => graft.text.Curation.sourceQuota(s, dir)),
    // PII scrub: email/phone redaction counts + scrubbed-text fingerprint
    "cur_redact_pii" -> ((s, dir) => graft.text.Curation.redactPii(s, dir)),
    // global top-100 vocabulary (map-side partial agg + bounded-heap cut)
    "cur_top_tokens" -> ((s, dir) => graft.text.Curation.topTokens(s, dir)),
    // greedy sequence packing into 512-token packs (two-pass distributed
    // prefix sum — no single-task-per-language cumsum)
    "cur_pack_sequences" -> ((s, dir) => graft.text.Curation.packSequences(s, dir)),
    // quality-weighted deterministic sampling: hash-uniform draw under
    // the quality score — RNG-free curation under a quality prior, a
    // pure pushed filter at scan speed
    "cur_weighted_sample" -> ((s, dir) => graft.text.Curation.weightedSample(s, dir)),
    // temperature-scaled (alpha=0.5) language-mixture sampling: keep
    // rate least(1, c/sqrt(n_lang)) per language, md5-uniform draw —
    // head languages flattened toward the temperature mixture
    "cur_temperature_mix" -> ((s, dir) => graft.text.Curation.temperatureMix(s, dir)),
    // BPE tokenizer training on the word-type frequency table: 8 merge
    // steps of integer pair counts + total-order argmax + fold-merge;
    // the oracle replays every step unrolled
    // the training loop runs once per JVM (Bpe.trainedMerges memo) and
    // feeds both the merge-table gate and the tokenizer-inference gate
    "cur_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      graft.text.Bpe.trainedMerges(s, dir)
        .toDF("step", "merge_left", "merge_right", "pair_count")
    }),
    // unigram-LM tokenizer training (SentencePiece-style hard EM): seed
    // substring counts → Viterbi E-step under integer bit-length
    // surprisals → usage M-step → usage prune, 3 rounds; the oracle
    // replays the whole loop as unrolled DP chains
    "cur_unigram_vocab" -> ((s, dir) =>
      graft.text.UnigramLm.vocabTable(s, dir)),
    // the inference side of the trained unigram artifact: Viterbi
    // segmentation of the word-type table under the final costs — a
    // pure narrow map (the shape that tokenizes 100 TB)
    "cur_unigram_tokenize" -> ((s, dir) =>
      graft.text.UnigramLm.tokenizeTable(s, dir)),
    // tokenizer eval: frequency-weighted chars-per-token of BOTH
    // trained families over the shared capped type table
    "cur_tokenizer_stats" -> ((s, dir) =>
      graft.text.UnigramLm.tokenizerStats(s, dir)),
    // incremental unigram retrain: the SAME maintained word-type LSM
    // partials as stream_bpe_incremental, retrained through the
    // Viterbi-EM loop — must learn the batch-trained vocabulary
    "stream_unigram_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayUnigramIncremental(s, dir)),
    // incremental WordPiece retrain from the same partials — the third
    // family off one maintained corpus pass; same oracle as the batch
    "stream_wordpiece_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayWordPieceIncremental(s, dir)),
    // positional phrase search: the inverted-index primitive TF-IDF/BM25
    // can't express — postings joined on (doc, offset); the gate carries
    // its own query (the corpus's top bigram, tiebroken lexically)
    "text_phrase_search" -> ((s, dir) =>
      graft.text.PhraseSearch.topBigramMatches(Tables.documents(s, dir))),
    // TextRank extractive summaries: per-doc chunk-graph PageRank, all
    // docs' graphs advancing in the same five (doc, node)-keyed jobs —
    // the per-group-graph shape corpus-scale summarization needs
    "text_textrank" -> ((s, dir) => graft.text.TextRank.topPassages(s, dir)),
    // incremental TextRank: doc-atomic partials (no cross-doc state at
    // all) — each batch decodes ITS docs and appends finished rows;
    // the union must equal the one-shot corpus run (same oracle)
    "stream_textrank_incremental" -> ((s, dir) =>
      graft.streaming.StreamReplay.replayTextRankIncremental(s, dir)),

    // in-engine model TRAINING as a query: hashed-bag-of-words linear
    // classifier, fixed-point full-batch GD with a correctly-rounded
    // softsign link — every gradient step is replayed by the oracle
    "cur_classifier_weights" -> ((s, dir) =>
      graft.text.QualityClassifier.trainedWeights(s, dir)),
    // the inference side of the trained artifact: exact integer margins
    // + the float-free decision rule m_u >= 0 (weights memoized per JVM,
    // not retrained per query)
    "cur_classifier_scores" -> ((s, dir) =>
      graft.text.QualityClassifier.scores(s, dir)),
    // calibration: margin deciles (percentile-agg bounds, never a
    // global ntile) with exact per-bucket positive rates — the eval a
    // pipeline reads before trusting the learned quality filter
    "cur_classifier_calibration" -> ((s, dir) =>
      graft.text.QualityClassifier.calibrationTable(s, dir)),
    // exact ROC-AUC via the doubled Mann-Whitney U (tie-correct, all
    // integers until the one closing division) — the threshold-free
    // eval completing the classifier family
    "cur_classifier_auc" -> ((s, dir) =>
      graft.text.QualityClassifier.aucReport(s, dir)),
    // the INFERENCE side of the tokenizer artifact: apply the trained
    // merge list to the word-type table from scratch (a pure narrow
    // map, embarrassingly parallel — the shape that tokenizes 100 TB);
    // must equal the training loop's own final symbol state
    "cur_bpe_tokenize" -> ((s, dir) => {
      val merges = graft.text.Bpe.trainedMerges(s, dir)
        .map { case (_, l, r, _) => (l, r) }
      graft.text.Bpe.tokenizeWith(graft.text.Bpe.wordTypes(s, dir), merges)
        .select(col("word"), col("freq"),
          size(col("tokens")).cast("long").as("n_tokens"),
          array_join(col("tokens"), "|").as("tokens_str"))
    }),
    // greedy longest-match (MaxMatch / WordPiece-style) inference over
    // the SAME trained artifact — the other tokenizer inference
    // algorithm; vocabulary = base letters + merge concatenations
    "cur_maxmatch_tokenize" -> ((s, dir) => {
      val vocab = graft.text.Bpe.maxMatchVocab(
        graft.text.Bpe.trainedMerges(s, dir))
      graft.text.Bpe.maxMatchTokenize(graft.text.Bpe.wordTypes(s, dir), vocab)
        .select(col("word"), col("freq"),
          size(col("tokens")).cast("long").as("n_pieces"),
          array_join(col("tokens"), "|").as("pieces_str"))
    }),
    // WordPiece training: the THIRD trained tokenizer family — BPE's
    // greedy merges but likelihood-scored, cnt(lr)/(cnt(l)·cnt(r)),
    // decided by exact integer cross-multiplication (no division ever
    // computed; the oracle replays the same NOT EXISTS tournament)
    "cur_wordpiece_merges" -> ((s, dir) =>
      graft.text.WordPiece.trainMerges(s, dir)),
    // WordPiece inference = greedy longest-match over ITS trained
    // vocabulary — same algorithm as cur_maxmatch_tokenize, different
    // (likelihood-trained) artifact; the two gates differ exactly where
    // the trainings diverge
    "cur_wordpiece_tokenize" -> ((s, dir) => {
      val vocab = graft.text.WordPiece.vocab(
        graft.text.WordPiece.trainedMerges(s, dir))
      graft.text.Bpe.maxMatchTokenize(graft.text.Bpe.wordTypes(s, dir), vocab)
        .select(col("word"), col("freq"),
          size(col("tokens")).cast("long").as("n_pieces"),
          array_join(col("tokens"), "|").as("pieces_str"))
    }),
    // context-window chunking: 64-token chunks every 48 tokens (narrow
    // map + explode; the tail chunk is kept, every doc yields >=1 chunk)
    // bigram-LM quality score (the CCNet/Gopher LM-filter stage) in
    // probability space: mean P(w2|w1) over the doc's bigram sequence,
    // position-ordered sequential fold — transcendental-free, so the
    // oracle replays it bitwise
    "cur_lm_score" -> ((s, dir) => graft.text.Curation.lmScore(s, dir)),
    // Stupid Backoff over a held-out half: even docs train, odd docs
    // score; unseen bigrams back off to 0.4·unigram/N (libm-free)
    "cur_backoff_lm" -> ((s, dir) =>
      graft.text.Curation.backoffLmScore(s, dir)),
    // interpolated Kneser-Ney over the same held-out split: discounted
    // ML mass + interpolation weight × continuation probability
    // (distinct-context counts) — the KenLM/CCNet smoothing family,
    // D = 0.75 dyadic so nothing transcendental exists
    "cur_kneser_ney" -> ((s, dir) =>
      graft.text.Curation.knLmScore(s, dir)),
    // per-language winsorization: clip n_chars to exact [p05, p95]
    // quantile bounds (broadcast back — the corpus never shuffles)
    "cur_winsorize" -> ((s, dir) => graft.text.Curation.winsorize(s, dir)),
    "cur_chunk_docs" -> ((s, dir) => graft.text.Curation.chunkDocs(s, dir)),
    // fill-in-the-middle re-serialization (PSM): hash-derived coin and
    // cut points, the transformed corpus hashed via its fingerprint
    "cur_fim_split" -> ((s, dir) => graft.text.Curation.fimSplit(s, dir)),
    // T5/UL2 span corruption: RNG-free greedy 3-token masked spans from
    // per-position md5 coins (order-dependent fold — iteration-shaped
    // oracle); emits sentinel input/target fingerprints per doc
    "cur_span_corruption" -> ((s, dir) =>
      graft.text.Curation.spanCorruption(s, dir)),
    // RefinedWeb-style line-level dedup: lines recurring across >= 3
    // docs are cut from every doc and the survivors re-joined in order
    // — the cleaned-corpus rewrite, not just a boilerplate score
    "cur_line_dedup" -> ((s, dir) => graft.text.Curation.lineDedup(s, dir)),
    // benchmark decontamination: flag train docs sharing any word 5-gram
    // with the hash-split eval set (eval n-grams broadcast — the corpus
    // is never shuffled)
    "cur_decontaminate" -> ((s, dir) => graft.text.Curation.decontaminate(s, dir)),
    // pairwise benchmark-leakage attribution: (train doc, eval doc,
    // shared n-grams, containment) via a broadcast inverted-index join
    "cur_contamination_pairs" -> ((s, dir) =>
      graft.text.Curation.contaminationPairs(s, dir)),
    // decontamination by span EXCISION: tokens covered by a matching
    // eval 5-gram cut out, the document kept — the surgical variant
    "cur_decontaminate_spans" -> ((s, dir) =>
      graft.text.Curation.decontaminateSpans(s, dir)),
    // exact-substring SELF-dedup (Lee et al. 2022): every 8-token
    // window occurring >1 time in the corpus is excised everywhere but
    // its globally-first occurrence — keep-one span dedup, the
    // boilerplate/mirror killer that runs before near-dup
    "cur_selfrepeat_spans" -> ((s, dir) =>
      graft.text.Curation.selfRepeatSpans(s, dir)),
    // the COMPOSED curation chain (split → quality → dedup keeper →
    // decontaminate → chunk) as ONE lazy plan — the end-to-end run a
    // real training-data pipeline executes; every stage also checked in
    // isolation by its own gate query
    "cur_pipeline_e2e" -> ((s, dir) => graft.text.Curation.curationPipeline(s, dir)),
    // DSIR-shaped selection: hashed-unigram linear discriminant between
    // the target slice and the raw corpus, exact integer margins
    "cur_dsir_margin" -> ((s, dir) => graft.text.Curation.dsirMargin(s, dir)),
    // tf-idf keyword extraction: per-doc top-5 distinctive terms (linear
    // idf keeps the score in exact IEEE arithmetic; ranking identical to
    // the ln form)
    "text_tfidf_top_terms" -> ((s, dir) => graft.text.TfIdf.topTerms(s, dir)),
    // RAKE phrase keywords: stopword-delimited runs scored by
    // micro-scaled-integer degree/freq — exact longs end to end
    "text_rake_keywords" -> ((s, dir) =>
      graft.text.TextFunctions.textRakeKeywords(s, dir)),

    // BM25 top-k retrieval for a fixed query (lexical candidate search);
    // rational idf core without the monotone ln wrapper — same libm
    // dodge as the linear tf-idf — and fixed-order per-term addition
    "text_bm25_topk" -> ((s, dir) => graft.text.TfIdf.bm25TopK(s, dir)),
    // hybrid lexical+dense retrieval fused by reciprocal-rank fusion —
    // rank-only fusion (no cross-leg score calibration), legs cut to
    // top-50 before the fusion join ever forms
    "text_hybrid_rrf" -> ((s, dir) =>
      graft.text.HybridRetrieval.rrfTopK(s, dir)),
    // the composed RAG serving chain: hybrid fusion → MMR
    // diversification over the fused candidates → greedy token-budget
    // context packing; each stage also gated in isolation
    "cur_rag_context" -> ((s, dir) =>
      graft.text.HybridRetrieval.ragContext(s, dir)),
    // winnowing fingerprints (the MOSS local-dedup primitive): rightmost
    // window minima of the trigram rolling hashes, bounded-fanout
    // Generate + one row_number per window
    "text_winnowing" -> ((s, dir) =>
      graft.text.TextFunctions.textWinnowing(s, dir)),
    // near-dup pairs over the winnowed fingerprints: LOCAL-overlap
    // sensitivity (shared passages) next to MinHash's whole-document
    // resemblance; df-capped inverted index, exact-rational Jaccard
    "dedup_winnowing" -> ((s, dir) =>
      graft.text.TextFunctions.winnowingNearDup(s, dir)),
    // secret/credential scan over the deterministically tainted corpus:
    // hex-key and AWS-key shaped tokens, portable regex classes only
    "text_secret_scan" -> ((s, dir) =>
      graft.text.TextFunctions.textSecretScan(s, dir)),
    // bigram LM count table: top continuations per frequent context
    // with exact counts and the single-division conditional — the
    // counts that back perplexity filters and KenLM-style scoring
    "text_bigram_lm" -> ((s, dir) =>
      graft.text.TextFunctions.textBigramLm(s, dir)),
    // n-gram diversity per language (type-token ratio over word
    // trigrams) — the self-repetition metric for synthetic-data QA
    "text_ngram_diversity" -> ((s, dir) =>
      graft.text.TextFunctions.textNgramDiversity(s, dir)),

    // ---- similarity search (embeddings table) ----

    // brute-force cosine top-k (oracle-checked; fold-order-exact doubles)
    "sim_topk" -> ((s, dir) => Similarity.bruteForceTopK(s, dir)),
    // hard-triplet mining (FaceNet recipe): hardest same-label positive
    // + hardest different-label negative per anchor, margin = pos − neg
    "sim_triplet_mining" -> ((s, dir) => Similarity.tripletMining(s, dir)),
    // two-stage retrieval: 8-byte Hamming prefilter over the corpus,
    // exact cosine rerank over the 50 survivors — the binary-embedding
    // serving pipeline composed and gated end to end
    "sim_twostage_topk" -> ((s, dir) =>
      Similarity.twoStageTopK(s, dir)),
    // diversified rerank: greedy maximal-marginal-relevance over the
    // brute top-50 — relevance minus max-similarity-to-selected, the
    // redundancy killer for RAG context assembly; O(k·legK) after the
    // candidate cut, corpus never touched past the leg
    "sim_mmr_topk" -> ((s, dir) => Similarity.mmrTopK(s, dir)),
    // int8-quantized top-k (the 4× memory path): integer code dots over
    // integer norms, one final double division — oracle replays the
    // quantization and ranking value-exactly
    "sim_quantized_topk" -> ((s, dir) => Similarity.quantizedTopK(s, dir)),
    // 1-bit sign-pattern retrieval: 8 bytes/vector, xor+popcount
    // ranking (codegen'd SignBits) — the first-stage binary filter
    "sim_binary_topk" -> ((s, dir) => Similarity.binaryTopK(s, dir)),
    // recall@10 of the sign-bit ranking vs the exact brute top-10
    "sim_binary_recall" -> ((s, dir) => Similarity.binaryRecall(s, dir)),
    // random-hyperplane LSH bucketed ANN (rows-only check)
    "sim_ann_lsh" -> ((s, dir) => Similarity.lshNearestInBucket(s, dir)),

    // MIPS via norm augmentation: one extra coordinate makes every
    // database vector the same length, so the cosine LSH index answers
    // inner-product queries unchanged (dim+1 planes); exact dot rerank
    // inside the probed bucket only
    "sim_mips_topk" -> ((s, dir) => Similarity.mipsTopK(s, dir)),
    // IVF search: probe nearest cells, rerank within (rows-only check)
    "sim_ivf_topk" -> ((s, dir) => Similarity.ivfTopK(s, dir)),
    // spherical k-means training (REAL trained IVF cells): deterministic
    // seed + 3 Lloyd steps at k=16, decimal-exact means — the oracle
    // replays the whole training loop unrolled (KmeansSpec additionally
    // pins fixpoint stability on a separable corpus)
    "sim_kmeans_cells" -> ((s, dir) =>
      Similarity.kmeansCellsScalar(s, dir, k = 16, iters = 3)),
    // IVF search over the trained cells (assignment + probe + rerank,
    // end-to-end reproducible)
    "sim_ivf_kmeans_topk" -> ((s, dir) => Similarity.ivfKmeansTopK(s, dir)),
    // graph-traversal ANN (HNSW/NSW family, flat layer + k-means-cell
    // backbone): deterministic beam search over the bounded-degree
    // neighbor artifact, fixed 3-hop budget, 6-dp-rounded cosines with
    // id tiebreaks — the whole index build AND search unroll as chained
    // oracle CTEs
    "sim_hnsw_topk" -> ((s, dir) => Similarity.hnswTopK(s, dir)),
    // recall@5 of the beam search against the exact cosine brute-force
    // top-5 — the same anchor the IVF/PQ/binary recall gates use
    "sim_hnsw_recall" -> ((s, dir) => Similarity.hnswRecall(s, dir)),
    // PRODUCT QUANTIZATION top-k (Jégou et al. 2011): per-subspace
    // Euclidean codebooks (the trainer recipe with L2 geometry),
    // m-byte codes per vector (32× compression — the representation
    // that keeps a billion-vector index in RAM), asymmetric-distance
    // scoring against the uncompressed query; every per-subspace
    // distance 6-dp rounded, parts folded in subspace order → bitwise
    // replay of the ENTIRE train+encode+search pipeline
    // the PQ codebook-training job itself (the sim_kmeans_cells shape);
    // sim_pq_topk then searches against the persisted artifact
    "sim_pq_codebooks" -> ((s, dir) => Similarity.pqCodebooksScalar(s, dir)),
    // dominant principal component by power iteration on the exact-
    // integer covariance digest (milli-quantized moment identity, d² =
    // 4096 rows at any corpus size); ordered folds, L∞ normalization,
    // final normalizer = eigenvalue estimate
    "sim_pca_power" -> ((s, dir) => Similarity.pcaPower(s, dir)),
    // the trained component applied back: memoized 64-double artifact,
    // index-ordered q·v fold per vector, top-10 by |score| — the
    // train→project pair of the reduction pipeline
    "sim_pca_project" -> ((s, dir) => Similarity.pcaProject(s, dir)),

    "sim_pq_topk" -> ((s, dir) => Similarity.pqTopK(s, dir)),
    // IVFADC: IVF cell pruning + PQ asymmetric-distance scoring over the
    // persisted codes — the billion-vector serving composition
    "sim_ivfpq_topk" -> ((s, dir) => Similarity.ivfPqTopK(s, dir)),
    // recall@10 of IVFADC vs the exact-cosine brute top-10 — the index
    // quality dial as a checked query
    "sim_ivfpq_recall" -> ((s, dir) => Similarity.ivfPqRecall(s, dir)),
    // matryoshka truncation recall: search on the 16-component prefix
    // (prefix-norm cosine), recall@10 vs the full-dim exact top-k
    "sim_matryoshka_recall" -> ((s, dir) =>
      Similarity.matryoshkaRecall(s, dir)),
    // embedding-cosine near-dup flags at 0.95 (rows-only check)
    "dedup_embedding" -> ((s, dir) => Similarity.embeddingNearDup(s, dir)),
    // SemDeDup: k-means-clustered semantic dedup — pairwise cosine ONLY
    // within a trained cell, keepers are the id-minimal exemplars; the
    // oracle replays training + assignment + flagging value-exactly
    "dedup_semantic" -> ((s, dir) => Similarity.semanticDedup(s, dir)),
    // rolling-hash document fingerprint (codegen'd byte loop); the
    // 31·h+b mod-2^64 polynomial is replayed in DuckDB via the same
    // HUGEINT fold as mm_features, so this is hash-checked too
    "text_rolling_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        graft.functions.RollingHash64(
          TextFunctions.normText(col("text"))).as("rolling_fp"))),
    // multimodal: binary payload + batched per-partition decode (stub codec)
    "mm_meta" -> graft.multimodal.Multimodal.metaTable _,
    // multimodal FEATURE path: the decode's vector reduced to a
    // deterministic fold-sum scalar; the stub codec's byte-stride hash
    // loop is replayed in DuckDB (hex-pair byte extraction + HUGEINT
    // mod-2^64 fold), so the whole decode path is hash-checked
    "mm_features" -> graft.multimodal.Multimodal.featureTable _,
    // frame sampling on the opaque video payloads: every 2nd stub-codec
    // frame window fingerprinted BEFORE any decode (sample-then-decode)
    "mm_frame_sample" -> ((s, dir) =>
      graft.multimodal.Multimodal.frameSamples(s, dir)),
    // content-defined chunking over the payloads: boundaries where the
    // rolling 16-byte window sum hits 0 mod 64 (resyncs after edits,
    // unlike fixed-stride framing), chunks fingerprinted with the
    // wrapping 31h+b fold — the rsync/backup-dedup primitive
    "mm_cdc_chunks" -> ((s, dir) =>
      graft.multimodal.Multimodal.cdcChunks(s, dir)
        .select(col("doc_id"), col("kind"),
          col("chunk_idx").cast("long").as("chunk_idx"),
          col("chunk_off").cast("long").as("chunk_off"),
          col("chunk_len").cast("long").as("chunk_len"),
          col("chunk_hash"))),
    // near-dup payload pairs by CDC chunk-fingerprint overlap: the
    // inverted-index join on the chunk hash is the only pairing step
    "mm_cdc_neardup" -> ((s, dir) =>
      graft.multimodal.Multimodal.cdcNearDup(s, dir)),
    // near-dup VIDEO pairs by frame-fingerprint overlap over the video
    // corpus with derived re-encodes (frame-0-perturbed, length-stable
    // copies of even videos): the inverted-index join on the frame
    // hash is the only pairing step, df-capped
    "mm_video_neardup" -> ((s, dir) =>
      graft.multimodal.Multimodal.videoNearDup(s, dir)),
    // the dedup-store savings number: unique (hash, len) chunk bytes
    // over total payload bytes
    "mm_cdc_savings" -> ((s, dir) =>
      graft.multimodal.Multimodal.cdcSavings(s, dir)),
    // connected components of the thresholded CDC pair graph — the
    // dedup decision layer over the payload evidence
    "mm_cdc_clusters" -> ((s, dir) =>
      graft.multimodal.Multimodal.cdcClusters(s, dir)),
    // shot-boundary detection: frame-difference thresholding on the
    // stub frame grid — exact byte-sum intensity mass per frame, a cut
    // when mean abs change > 16 gray levels; narrow flatMap, no shuffle
    "mm_scene_cuts" -> ((s, dir) =>
      graft.multimodal.Multimodal.sceneCuts(s, dir)),
    // keyframe selection per shot: gaps-and-islands over the cut flags,
    // then a max-intensity argmax per shot (descending row_number) —
    // the decoder downstream touches one frame per shot, not the grid
    "mm_video_keyframes" -> ((s, dir) =>
      graft.multimodal.Multimodal.videoKeyframes(s, dir)),
    // audio windowing on the opaque payloads: 8-bit-PCM windows with
    // exact-integer energy/peak — the silence/clipping prefilter runs
    // BEFORE any decode, same sample-then-decode shape as the video path
    "mm_audio_windows" -> ((s, dir) =>
      graft.multimodal.Multimodal.audioWindows(s, dir)),
    // perceptual-hash (dHash) image near-dup: byte-chunk blocking makes
    // candidate recall EXACT at Hamming <= 7 (pigeonhole), bucket-capped;
    // the oracle replays grid fold + bit extraction + blocking + distance
    "mm_phash_dedup" -> ((s, dir) =>
      graft.multimodal.Multimodal.phashNearDup(s, dir)),
    // word co-occurrence LIFT over the top vocabulary: P(a,b)/(P(a)P(b))
    // from exact doc-presence counts — the collocation statistic PMI
    // reduces to once the (engine-unportable) log is dropped; pairs are
    // bounded by |vocab|² per doc, the corpus contributes only the
    // presence digest
    "text_word_lift" -> ((s, dir) => {
      val words = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
        .where(col("word").rlike("^[a-z]+$"))
        .distinct()
      val vocab = words.groupBy(col("word"))
        .agg(count(lit(1)).as("n_w"))
        .orderBy(col("n_w").desc, col("word").asc).limit(20)
      val pres = words.join(broadcast(vocab), "word")
      val nDocs = Tables.documents(s, dir)
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      val a = pres.select(col("doc_id"), col("word").as("word_a"),
        col("n_w").as("n_a"))
      val b = pres.select(col("doc_id"), col("word").as("word_b"),
        col("n_w").as("n_b"))
      a.join(b, Seq("doc_id")).where(col("word_a") < col("word_b"))
        .groupBy(col("word_a"), col("word_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("n_both"))
        .crossJoin(broadcast(nDocs))
        .select(col("word_a"), col("word_b"), col("n_a"), col("n_b"),
          col("n_both"),
          ((col("n_both") * col("n_docs")).cast("double")
            / (col("n_a") * col("n_b")).cast("double")).as("lift"))
    }),

    // VAD-style audio segmentation: voiced = energy above the doc's own
    // mean (exact integer cross-multiplication), maximal voiced runs
    // merged gaps-and-islands style — the activity-extraction stage of
    // an audio pipeline, one payload read
    "mm_audio_segments" -> ((s, dir) =>
      graft.multimodal.Multimodal.audioSegments(s, dir)),
    // Shazam-style constellation hashes: energy peaks paired within the
    // target zone, (anchor, target, dt) packed to one integer — the
    // audio fingerprint relation the landmark matcher runs on
    "mm_audio_fingerprints" -> ((s, dir) =>
      graft.multimodal.Multimodal.audioFingerprints(s, dir)),

    // CLIP-shaped cross-modal retrieval: image payloads stub-encoded
    // into the text-embedding space (64 rolling-hash slots — one-
    // function swap for a real vision tower), cosine top-3 text vectors
    // per image through the codegen'd kernel; text side broadcasts,
    // images stream through a narrow map
    "mm_crossmodal_topk" -> ((s, dir) =>
      graft.multimodal.Multimodal.crossModalTopK(s, dir)),
    // the same retrieval routed through the IVF cells — the 100-TB
    // serving path: probe the label-cell centroids, rerank within the
    // nprobe best cells only; the text corpus never fully scans
    "mm_crossmodal_ivf_topk" -> ((s, dir) =>
      graft.multimodal.Multimodal.crossModalIvfTopK(s, dir)),
    // the same retrieval WALKED over the trained navigable graph — the
    // graph-index serving path: probes beam-search from the cell reps,
    // O(beam·hops·degree) per probe whatever the text-corpus size
    "mm_crossmodal_hnsw_topk" -> ((s, dir) =>
      graft.multimodal.Multimodal.crossModalHnswTopK(s, dir)),
    // per-label centroids: distributed vector aggregation (IVF training
    // step). Emitted as (label, pos, c) scalar rows — one row per centroid
    // component, 1-based pos — because the oracle gate cannot sort/hash
    // array-typed columns. Still one shuffle: posexplode → hash agg.
    "sim_label_centroid" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      e.groupBy(col("label"), col("pos"))
        .agg(sum(col("v").cast("double").cast("decimal(30,15)")).as("s"),
          count(lit(1)).as("n"))
        .select(col("label"), (col("pos") + 1).cast("long").as("pos"),
          round(col("s").cast("double") / col("n"), 6).as("c"))
    }),
  )

  /** DuckDB CTE chain shared by the ngram-Jaccard oracles: normalize →
    * distinct char trigrams (`d`) → drop (lang, source) buckets larger
    * than 500 docs (`db`), mirroring NearDup.ngramJaccardPairs' bucket
    * cap. The Spark side intersects xxhash64'd trigrams; the oracle
    * intersects the strings directly — counts agree (64-bit collision
    * inside one doc's ~300-trigram set is ~1e-15).
    */
  private val NgramCappedCtes =
    """d AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(CASE WHEN length(nt) < 3 THEN [nt]
      |      ELSE list_transform(range(0, length(nt) - 2),
      |                          i -> substring(nt, i + 1, 3)) END) AS g
      |  FROM (SELECT doc_id, lang, source,
      |          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      |        FROM documents)
      |), ok AS (
      |  SELECT lang, source FROM d GROUP BY lang, source
      |  HAVING count(*) <= 500
      |), db AS (
      |  SELECT d.* FROM d JOIN ok USING (lang, source)
      |)""".stripMargin

  /** Shared by `dedup_ppjoin` and its maintained-index streaming twin
    * `stream_ppjoin_incremental`: the naive global all-pairs join at the
    * same integer threshold (9i >= 4(a+b) <=> J >= 0.8) — both plans
    * must reproduce it pair for pair.
    */
  private lazy val PpjoinPairsSql: String =
    s"""WITH $NgramCappedCtes
       |SELECT a.doc_id, b.doc_id AS nb_id,
       |  len(list_intersect(a.g, b.g)) AS n_common,
       |  len(a.g) AS n_a, len(b.g) AS n_b,
       |  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
       |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
       |    AS jaccard
       |FROM d a JOIN d b ON a.doc_id < b.doc_id
       |WHERE 9 * len(list_intersect(a.g, b.g))
       |   >= 4 * (len(a.g) + len(b.g))""".stripMargin

  /** Shared by `dedup_containment` and its maintained-index streaming
    * twin `stream_containment_incremental`: the naive directional
    * all-ordered-pairs join at 10i >= 9·|a| (C >= 0.9).
    */
  private lazy val ContainmentSql: String =
    s"""WITH $NgramCappedCtes
       |SELECT a.doc_id, b.doc_id AS container_id,
       |  len(list_intersect(a.g, b.g)) AS n_common,
       |  len(a.g) AS n_a, len(b.g) AS n_b,
       |  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) / len(a.g)
       |    AS containment
       |FROM d a JOIN d b ON a.doc_id <> b.doc_id
       |WHERE 10 * len(list_intersect(a.g, b.g)) >= 9 * len(a.g)""".stripMargin

  /** The LSH hyperplanes inlined as DuckDB DOUBLE[] literals. The planes
    * are a deterministic LCG stream (Similarity.planes — no RNG at
    * runtime), and Scala's Double.toString is the shortest round-trip
    * representation, so DuckDB parses back bit-identical doubles and the
    * oracle can recompute the exact same signatures the Spark side does.
    */
  /** The histogram-sketch percentile replay — shared by the one-shot
    * gate and the incremental fold, which must produce identical bins.
    */
  private val HistPercentilesOracleSql: String =
    """WITH b AS (
      |  SELECT CAST(least(greatest(
      |      floor((CAST(l_extendedprice AS DOUBLE) - 0.0) / 1250.0), 0), 63)
      |    AS INT) AS bin, count(*) AS cnt
      |  FROM lineitem GROUP BY 1
      |), t AS (
      |  SELECT CAST(sum(cnt) AS DOUBLE) AS nd FROM b
      |), qs AS (
      |  SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q
      |), r AS (
      |  SELECT q, greatest(CAST(ceil(q * (SELECT nd FROM t)) AS BIGINT),
      |    1) AS rank FROM qs
      |), c AS (
      |  SELECT bin, cnt,
      |    sum(cnt) OVER (ORDER BY bin) AS cum,
      |    coalesce(sum(cnt) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumprev
      |  FROM b
      |), sel AS (
      |  SELECT r.q, r.rank, c.bin, c.cnt, c.cumprev,
      |    row_number() OVER (PARTITION BY r.q ORDER BY c.bin) AS rn
      |  FROM r JOIN c ON c.cum >= r.rank
      |)
      |SELECT q AS quantile, rank, bin,
      |  0.0 + 1250.0 * (CAST(bin AS DOUBLE)
      |    + CAST(rank - cumprev AS DOUBLE) / CAST(cnt AS DOUBLE)) AS estimate
      |FROM sel WHERE rn = 1""".stripMargin

  /** Textbook skyline dominance as oracle SQL — shared verbatim by the
    * one-shot `q_skyline_orders` gate and the incrementally maintained
    * `stream_skyline_incremental` frontier, which must converge to it.
    */
  private val SkylineOrdersOracleSql: String =
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderdate
      |FROM orders o
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders q
      |  WHERE q.o_totalprice >= o.o_totalprice
      |    AND q.o_orderdate >= o.o_orderdate
      |    AND (q.o_totalprice > o.o_totalprice
      |         OR q.o_orderdate > o.o_orderdate))""".stripMargin

  /** The data-contract report as oracle SQL — shared verbatim by the
    * one-shot `dq_constraints` gate and the incrementally maintained
    * `stream_constraints_incremental` replay, which must converge to it.
    */
  private val DqConstraintsOracleSql: String =
    """WITH t AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN l_suppkey IS NOT NULL THEN 1 ELSE 0 END) AS g_complete,
      |    sum(CASE WHEN coalesce(l_quantity BETWEEN 1 AND 50, false) THEN 1 ELSE 0 END) AS g_range
      |  FROM lineitem
      |), uq AS (
      |  SELECT count(*) AS g FROM
      |    (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)
      |), fk AS (
      |  SELECT count(*) AS g FROM lineitem
      |  WHERE l_orderkey IS NOT NULL
      |    AND l_orderkey IN (SELECT o_orderkey FROM orders)
      |)
      |SELECT 'complete_suppkey' AS check_name, n AS n_rows,
      |  CAST(g_complete AS BIGINT) AS n_good,
      |  CAST(g_complete AS DOUBLE) / CAST(n AS DOUBLE) AS metric,
      |  CAST(g_complete AS DOUBLE) / CAST(n AS DOUBLE) >= 1.0 AS passed
      |FROM t
      |UNION ALL
      |SELECT 'qty_range', n, CAST(g_range AS BIGINT),
      |  CAST(g_range AS DOUBLE) / CAST(n AS DOUBLE),
      |  CAST(g_range AS DOUBLE) / CAST(n AS DOUBLE) >= 1.0 FROM t
      |UNION ALL
      |SELECT 'unique_line', n, CAST(uq.g AS BIGINT),
      |  CAST(uq.g AS DOUBLE) / CAST(n AS DOUBLE),
      |  CAST(uq.g AS DOUBLE) / CAST(n AS DOUBLE) >= 1.0 FROM t, uq
      |UNION ALL
      |SELECT 'fk_orders', n, CAST(fk.g AS BIGINT),
      |  CAST(fk.g AS DOUBLE) / CAST(n AS DOUBLE),
      |  CAST(fk.g AS DOUBLE) / CAST(n AS DOUBLE) >= 1.0 FROM t, fk""".stripMargin

  /** The volume-anomaly report as oracle SQL — shared verbatim by the
    * one-shot `dq_volume_anomaly` gate and the incrementally maintained
    * `stream_volume_anomaly_incremental` replay, which must converge to
    * it. Trailing-frame integer moments + the identical double z tree;
    * sums feed straight into DOUBLE casts so no HUGEINT surfaces.
    */
  private val DqVolumeAnomalyOracleSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_rows
      |  FROM events GROUP BY 1
      |), m AS (
      |  SELECT day, n_rows,
      |    count(*) OVER w AS n_l,
      |    sum(n_rows) OVER w AS s_l,
      |    sum(n_rows * n_rows) OVER w AS ss_l
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
      |), zc AS (
      |  SELECT day, n_rows, n_l,
      |    CAST(s_l AS DOUBLE) / CAST(n_l AS DOUBLE) AS baseline_mean,
      |    sqrt(greatest(CAST(n_l AS DOUBLE) * CAST(ss_l AS DOUBLE)
      |                  - CAST(s_l AS DOUBLE) * CAST(s_l AS DOUBLE), 0.0)
      |         / nullif(CAST(n_l AS DOUBLE)
      |                  * (CAST(n_l AS DOUBLE) - 1.0), 0.0)) AS sd
      |  FROM m
      |), zf AS (
      |  SELECT day, n_rows, n_l, baseline_mean, sd,
      |    (CAST(n_rows AS DOUBLE) - baseline_mean) / nullif(sd, 0.0)
      |      AS z_score
      |  FROM zc
      |)
      |SELECT day, n_rows, baseline_mean, z_score,
      |  CASE WHEN n_l >= 2 THEN
      |    (sd = 0.0 AND CAST(n_rows AS DOUBLE) <> baseline_mean)
      |    OR (sd > 0.0 AND abs(z_score) > 3.0)
      |  END AS is_anomaly
      |FROM zf""".stripMargin

  /** DuckDB CTE chain replaying Multimodal.cdcChunks: payload bytes
    * from the hex dump, rolling-window byte sums as prefix-sum
    * arithmetic (lag by the window width), boundary positions where the
    * window sum hits 0 mod 64, chunk segmentation with the forced final
    * cut, and the wrapping 31·h+b HUGEINT fold per chunk. Ends at CTE
    * `cdc_hs` (doc_id, kind, chunk_idx, chunk_off, chunk_len, hh) —
    * shared by the chunk gate and the near-dup pair gate.
    */
  private val CdcChunkCtes: String =
    """cdc_m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
      |    octet_length(encode(text)) AS len, hex(encode(text)) AS hx
      |  FROM documents WHERE octet_length(encode(text)) > 0
      |), cdc_b AS (
      |  SELECT doc_id, kind, len,
      |    list_transform(range(0, len), j ->
      |      16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
      |      + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)) AS bytes
      |  FROM cdc_m
      |), cdc_br AS (
      |  SELECT doc_id, pos,
      |    sum(bv) OVER (PARTITION BY doc_id ORDER BY pos) AS ps
      |  FROM (SELECT doc_id, unnest(bytes) AS bv,
      |          generate_subscripts(bytes, 1) AS pos FROM cdc_b)
      |), cdc_cut AS (
      |  SELECT doc_id, pos AS cut
      |  FROM (SELECT doc_id, pos, ps,
      |          lag(ps, 16) OVER (PARTITION BY doc_id ORDER BY pos) AS psw
      |        FROM cdc_br)
      |  WHERE pos >= 16 AND (ps - coalesce(psw, 0)) % 64 = 0
      |), cdc_cl AS (
      |  SELECT doc_id, list(cut ORDER BY cut) AS cuts FROM cdc_cut GROUP BY 1
      |), cdc_cf AS (
      |  SELECT b.doc_id, b.kind, b.bytes,
      |    CASE WHEN cl.cuts IS NULL THEN [b.len]
      |         WHEN cl.cuts[-1] <> b.len THEN list_append(cl.cuts, b.len)
      |         ELSE cl.cuts END AS cuts
      |  FROM cdc_b b LEFT JOIN cdc_cl cl USING (doc_id)
      |), cdc_cx AS (
      |  SELECT doc_id, kind, bytes, cuts,
      |    unnest(generate_series(1, len(cuts))) AS i
      |  FROM cdc_cf
      |), cdc_hs AS (
      |  SELECT doc_id, kind, i - 1 AS chunk_idx,
      |    CASE WHEN i = 1 THEN 0 ELSE cuts[i - 1] END AS chunk_off,
      |    cuts[i] - (CASE WHEN i = 1 THEN 0 ELSE cuts[i - 1] END) AS chunk_len,
      |    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
      |      list_transform(list_slice(bytes,
      |          (CASE WHEN i = 1 THEN 0 ELSE cuts[i - 1] END) + 1, cuts[i]),
      |        x -> CAST(x AS HUGEINT))),
      |      (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT) AS hh
      |  FROM cdc_cx
      |)""".stripMargin

  /** Winnowing CTEs ending in the selected-fingerprint relation
    * `wn(doc_id, pos, fp_hash)` — shared by the fingerprint gate and
    * the near-dup pair gate built on it.
    */
  private val WinnowCtes: String =
    """wn_t AS (
      |  SELECT doc_id,
      |    str_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
      |      AS tk
      |  FROM documents WHERE text IS NOT NULL
      |), wn_g AS (
      |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
      |    CAST(len(tk) - 2 AS INTEGER) AS nk,
      |    tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS sh
      |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
      |        FROM wn_t)
      |), wn_x AS (
      |  SELECT doc_id, pos, nk, hex(encode(sh)) AS hx,
      |    octet_length(encode(sh)) AS ln
      |  FROM wn_g
      |), wn_h AS (
      |  SELECT doc_id, pos, nk,
      |    CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
      |              THEN u - 18446744073709551616::HUGEINT ELSE u END
      |         AS BIGINT) AS h
      |  FROM (SELECT doc_id, pos, nk,
      |          list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
      |            list_transform(range(0, ln), j ->
      |              CAST(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
      |                   + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
      |                AS HUGEINT))),
      |            (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT)
      |            AS u
      |        FROM wn_x)
      |), wn_e AS (
      |  SELECT doc_id, pos, h,
      |    unnest(range(greatest(pos - 3, 0),
      |      least(pos, greatest(nk - 4, 0)) + 1)) AS j
      |  FROM wn_h
      |), wn_r AS (
      |  SELECT doc_id, pos, h, row_number() OVER (PARTITION BY doc_id, j
      |    ORDER BY h ASC, pos DESC) AS rn
      |  FROM wn_e
      |), wn AS (
      |  SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, h AS fp_hash
      |  FROM wn_r WHERE rn = 1
      |)""".stripMargin

  /** Sign-bit signature CTE: bit i set when embedding[i] > 0, or-folded
    * into relation `bsig(vec_id, sig)` — the SignBits replay shared by
    * the binary top-k and recall gates.
    */
  private val BinarySigCtes: String =
    """bsig0 AS (
      |  SELECT vec_id,
      |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
      |      list_transform(range(0, least(len(embedding), 64)), i ->
      |        CASE WHEN embedding[i + 1] > 0
      |             THEN CAST(1 AS HUGEINT) << i ELSE CAST(0 AS HUGEINT) END)),
      |      (a, b) -> a | b) AS u
      |  FROM embeddings
      |), bsig AS (
      |  SELECT vec_id,
      |    CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
      |              THEN u - 18446744073709551616::HUGEINT ELSE u END
      |         AS BIGINT) AS sig
      |  FROM bsig0
      |)""".stripMargin

  /** Bigram-LM replay — the same bigram expansion (1-based list
    * indexing), digest-side context totals, and both top-k rankings;
    * p_next is one IEEE division of exact BIGINTs. Shared verbatim by
    * the one-shot gate and the incremental-fold replay, which must
    * reproduce it bit for bit.
    */
  private val BigramLmOracleSql: String =
    """WITH t AS (
      |  SELECT string_split_regex(lower(trim(text)), '\s+') AS tk
      |  FROM documents WHERE text IS NOT NULL
      |), b AS (
      |  SELECT tk[i] AS w1, tk[i + 1] AS w2
      |  FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM t)
      |), bc AS (
      |  SELECT w1, w2, count(*) AS pair_count FROM b GROUP BY 1, 2
      |), cc AS (
      |  SELECT w1, CAST(sum(pair_count) AS BIGINT) AS ctx_count
      |  FROM bc GROUP BY 1
      |), topc AS (
      |  SELECT w1, ctx_count
      |  FROM (SELECT *, row_number() OVER
      |          (ORDER BY ctx_count DESC, w1 ASC) AS cr FROM cc)
      |  WHERE cr <= 50
      |), r AS (
      |  SELECT bc.w1, bc.w2, bc.pair_count, tc.ctx_count,
      |    row_number() OVER (PARTITION BY bc.w1
      |      ORDER BY bc.pair_count DESC, bc.w2 ASC) AS rank
      |  FROM bc JOIN topc tc ON bc.w1 = tc.w1
      |)
      |SELECT w1, w2, CAST(rank AS BIGINT) AS rank, pair_count,
      |  ctx_count,
      |  CAST(pair_count AS DOUBLE) / CAST(ctx_count AS DOUBLE) AS p_next
      |FROM r WHERE rank <= 3""".stripMargin

  /** The scene-cut CTEs (the stub frame grid's per-frame byte sums and
    * frame-difference flags), ending in relation `scc(doc_id,
    * frame_idx, frame_sum, delta, is_cut)` — shared by the scene-cut
    * gate and the keyframe-selection gate built on top of it.
    */
  private val SceneCutCtes: String =
    """scc_m AS (
      |  SELECT doc_id, octet_length(encode(text)) AS len,
      |    hex(encode(text)) AS hx
      |  FROM documents WHERE doc_id % 3 = 2
      |), scc_fr AS (
      |  SELECT doc_id, len, hx, 1 + len % 8 AS frames,
      |    len // (1 + len % 8) AS stride
      |  FROM scc_m
      |), scc_s AS (
      |  SELECT doc_id, frames, stride,
      |    list_transform(range(0, frames), i ->
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(i * stride, i * stride + stride),
      |          j -> CAST(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
      |                    + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
      |               AS BIGINT))),
      |        (a, x) -> a + x)) AS sums
      |  FROM scc_fr
      |), scc_d AS (
      |  SELECT doc_id, stride, sums, unnest(range(1, frames)) AS i
      |  FROM scc_s WHERE frames > 1
      |), scc AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
      |    sums[i + 1] AS frame_sum,
      |    abs(sums[i + 1] - sums[i]) AS delta,
      |    abs(sums[i + 1] - sums[i]) > stride * 16 AS is_cut
      |  FROM scc_d
      |)""".stripMargin

  /** The CDC near-dup pair CTEs on top of [[CdcChunkCtes]]: distinct
    * per-doc fingerprints, the df ≤ 100 cap, per-doc sizes, and the
    * (doc_a, doc_b, n_shared) pair counts — shared by the pair gate
    * and the cluster gate.
    */
  private val CdcPairCtes: String =
    """cdc_d AS (
      |  SELECT DISTINCT doc_id, hh FROM cdc_hs
      |), cdc_cap AS (
      |  SELECT hh FROM cdc_d GROUP BY hh HAVING count(*) <= 100
      |), cdc_cd AS (
      |  SELECT d.doc_id, d.hh FROM cdc_d d JOIN cdc_cap USING (hh)
      |), cdc_sz AS (
      |  SELECT doc_id, count(*) AS n FROM cdc_cd GROUP BY 1
      |), cdc_pr AS (
      |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
      |    count(*) AS n_shared
      |  FROM cdc_cd a JOIN cdc_cd b2 USING (hh)
      |  WHERE a.doc_id < b2.doc_id
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |)""".stripMargin

  /** Line-dedup replay: the chunk framing of cur_chunk_docs at
    * stride=width=8, document frequency per line, and the ordered
    * string_agg reassembly of the surviving lines. Shared verbatim by
    * the one-shot gate and the incremental-dictionary replay, which
    * must reproduce it bit for bit.
    */
  /** Shared by cur_selfrepeat_spans and stream_selfrepeat_incremental
    * (the maintained dictionary must reproduce the one-shot excision).
    */
  private val SelfRepeatOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents
      |), gp AS (
      |  SELECT doc_id,
      |    unnest(range(0, greatest(len(tk) - 7, 0))) AS p,
      |    unnest(list_transform(range(1, len(tk) - 6),
      |      i -> array_to_string(list_slice(tk, i, i + 7), ' '))) AS g
      |  FROM t
      |), rk AS (
      |  SELECT doc_id, p,
      |    row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn,
      |    count(*) OVER (PARTITION BY g) AS cnt
      |  FROM gp
      |), cov AS (
      |  SELECT DISTINCT rk.doc_id, rk.p + d.d AS pos
      |  FROM rk, (SELECT unnest(range(0, 8)) AS d) d
      |  WHERE rk.cnt > 1 AND rk.rn > 1
      |), tok AS (
      |  SELECT doc_id, unnest(range(0, len(tk))) AS pos, unnest(tk) AS w
      |  FROM t
      |)
      |SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(count(cov.pos) AS BIGINT) AS n_removed,
      |  coalesce(string_agg(CASE WHEN cov.pos IS NULL THEN tok.w END,
      |    ' ' ORDER BY tok.pos), '') AS clean_text
      |FROM tok LEFT JOIN cov
      |  ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
      |GROUP BY tok.doc_id""".stripMargin

  private val LineDedupOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents
      |), l AS (
      |  SELECT doc_id, CAST(start // 8 AS BIGINT) AS line_idx,
      |    array_to_string(list_slice(tk, start + 1, start + 8), ' ')
      |      AS line
      |  FROM (SELECT doc_id, tk, unnest(range(0, len(tk), 8)) AS start
      |        FROM t)
      |), f AS (
      |  SELECT line, 1 AS dup FROM l
      |  GROUP BY line HAVING count(DISTINCT doc_id) >= 3
      |)
      |SELECT l.doc_id, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(count(f.dup) AS BIGINT) AS n_dropped,
      |  coalesce(string_agg(CASE WHEN f.dup IS NULL THEN l.line END,
      |    ' ' ORDER BY l.line_idx), '') AS clean_text
      |FROM l LEFT JOIN f USING (line)
      |GROUP BY l.doc_id""".stripMargin

  /** Trending replay: the (type, level) digest with dyadic 1/(1<<lvl)
    * weights — exact, order-free double sums on both engines. Shared
    * verbatim by the one-shot gate and the incremental-digest replay.
    */
  private val TrendingOracleSql: String =
    """WITH d1 AS (SELECT max(CAST(ts AS DATE)) AS d1 FROM events),
      |l AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', CAST(ts AS DATE), d1.d1) // 7 AS INT)
      |      AS lvl
      |  FROM events, d1
      |), c AS (
      |  SELECT event_type, lvl, count(*) AS n FROM l GROUP BY 1, 2
      |), s AS (
      |  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
      |    sum(CAST(n AS DOUBLE) / CAST(1 << lvl AS DOUBLE)) AS hot_score
      |  FROM c GROUP BY 1
      |)
      |SELECT event_type, n_events, hot_score,
      |  CAST(row_number() OVER (ORDER BY hot_score DESC, event_type ASC)
      |    AS INT) AS rank
      |FROM s""".stripMargin

  /** SemDeDup replayed end-to-end: trained cells (the shared unrolled
    * training CTEs), max-cosine assignment, then the within-cell
    * lower-id max-cosine flag — value-exact because every cosine is
    * 6-dp-rounded pre-compare and the reduction is MAX. Shared verbatim
    * by the one-shot gate and the maintained-index report.
    */
  private val SemanticDedupOracleSql: String = {
    val (ctes, centFinal, _) = KmeansCtes(8, 2)
    s"""WITH $ctes, af AS (
       |  SELECT vec_id, emb, cell FROM (
       |    SELECT e.vec_id, e.emb, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${KmCos("e.emb", "c.centroid")} DESC, c.cell ASC) AS rn
       |    FROM e CROSS JOIN $centFinal c)
       |  WHERE rn = 1
       |), best AS (
       |  SELECT a.vec_id, max(${KmCos("a.emb", "b.emb")}) AS max_lower_cos
       |  FROM af a JOIN af b ON a.cell = b.cell AND b.vec_id < a.vec_id
       |  GROUP BY a.vec_id
       |)
       |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell, b.max_lower_cos,
       |       coalesce(b.max_lower_cos >= 0.45, false) AS is_semantic_dup
       |FROM af a LEFT JOIN best b USING (vec_id)""".stripMargin
  }

  /** Two-sample Kolmogorov-Smirnov replay: exact integer CDF-gap
    * maximum, one closing division, the sqrt-free squared threshold.
    * Shared verbatim by the one-shot gate and the maintained-digest
    * report, which must produce the identical row.
    */
  private val KsDriftOracleSql: String =
    """WITH sp AS (
      |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      |  FROM events
      |), m AS (
      |  SELECT value AS v,
      |    CAST(ts AS DATE) <
      |      d0 + CAST(date_diff('day', d0, d1) // 2 AS INT) AS is_ref
      |  FROM events, sp
      |), g AS (
      |  SELECT v,
      |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS b
      |  FROM m GROUP BY 1
      |), t AS (
      |  SELECT CAST(sum(a) AS BIGINT) AS n_ref,
      |    CAST(sum(b) AS BIGINT) AS n_cur FROM g
      |), w AS (
      |  SELECT CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS ca,
      |    CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cb
      |  FROM g
      |), dm AS (
      |  SELECT max(abs(ca * t.n_cur - cb * t.n_ref)) AS d_num
      |  FROM w, t
      |), base AS (
      |  SELECT t.n_ref, t.n_cur, dm.d_num,
      |    CAST(dm.d_num AS DOUBLE)
      |      / (CAST(t.n_ref AS DOUBLE) * CAST(t.n_cur AS DOUBLE)) AS ks_d
      |  FROM dm, t
      |)
      |SELECT n_ref, n_cur, d_num, ks_d,
      |  ks_d * ks_d * (CAST(n_ref * n_cur AS DOUBLE)
      |                 / CAST(n_ref + n_cur AS DOUBLE)) AS ks_stat,
      |  ks_d * ks_d * (CAST(n_ref * n_cur AS DOUBLE)
      |                 / CAST(n_ref + n_cur AS DOUBLE)) > 1.844164
      |    AS drift_5pct
      |FROM base""".stripMargin

  /** Two-sample Cramér-von-Mises replay, parameterized by the
    * value-shift expression (`""` for the plain gate; the alarm arm
    * adds the +20 CASE to the current half). HUGEINT numerator mirrors
    * the engine's DECIMAL(38,0) fold; both convert through the string
    * path before the one double division (the >2^53 ULP rule).
    */
  private def CvmDriftOracleSql(shiftExpr: String): String =
    s"""WITH sp AS (
       |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
       |  FROM events
       |), m AS (
       |  SELECT value$shiftExpr AS v,
       |    CAST(ts AS DATE) <
       |      d0 + CAST(date_diff('day', d0, d1) // 2 AS INT) AS is_ref
       |  FROM events, sp
       |), g AS (
       |  SELECT v,
       |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS b
       |  FROM m GROUP BY 1
       |), t AS (
       |  SELECT CAST(sum(a) AS BIGINT) AS n_ref,
       |    CAST(sum(b) AS BIGINT) AS n_cur FROM g
       |), w AS (
       |  SELECT a + b AS w,
       |    CAST(sum(a) OVER (ORDER BY v) AS BIGINT) * t.n_cur
       |      - CAST(sum(b) OVER (ORDER BY v) AS BIGINT) * t.n_ref AS dn
       |  FROM g, t
       |), s AS (
       |  SELECT sum(CAST(w AS HUGEINT) * CAST(dn AS HUGEINT)
       |             * CAST(dn AS HUGEINT)) AS s_num
       |  FROM w
       |)
       |SELECT t.n_ref, t.n_cur, CAST(s.s_num AS VARCHAR) AS s_num,
       |  CAST(CAST(s.s_num AS VARCHAR) AS DOUBLE)
       |    / (CAST(t.n_ref + t.n_cur AS DOUBLE)
       |       * CAST(t.n_ref + t.n_cur AS DOUBLE)
       |       * CAST(t.n_ref AS DOUBLE) * CAST(t.n_cur AS DOUBLE)) AS cvm_t,
       |  CAST(CAST(s.s_num AS VARCHAR) AS DOUBLE)
       |    / (CAST(t.n_ref + t.n_cur AS DOUBLE)
       |       * CAST(t.n_ref + t.n_cur AS DOUBLE)
       |       * CAST(t.n_ref AS DOUBLE) * CAST(t.n_cur AS DOUBLE)) > 0.461
       |    AS drift_5pct
       |FROM s, t""".stripMargin

  /** Drift replay: exact bucket counts, the verbatim expected-count
    * tree, and the chi2 left fold as a recursive CTE in bucket order.
    * Shared verbatim by the one-shot gate and the incremental replay.
    */
  private val DqDriftChi2OracleSql: String =
      """WITH RECURSIVE sp AS (
        |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |  FROM events
        |), b AS (
        |  SELECT CAST(least(floor(value / 50.0), 19) AS INT) AS bucket,
        |    CAST(ts AS DATE) <
        |      d0 + CAST(date_diff('day', d0, d1) // 2 AS INT) AS is_ref
        |  FROM events, sp
        |), c AS (
        |  SELECT bucket,
        |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS refc,
        |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT)
        |      AS curc
        |  FROM b GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(refc) AS BIGINT) AS n_ref,
        |    CAST(sum(curc) AS BIGINT) AS n_cur
        |  FROM c
        |), w AS (
        |  SELECT c.*, t.n_ref, t.n_cur, coalesce(
        |    (CAST(curc AS DOUBLE)
        |       - CAST(n_cur AS DOUBLE) * CAST(refc AS DOUBLE)
        |         / CAST(n_ref AS DOUBLE))
        |    * (CAST(curc AS DOUBLE)
        |       - CAST(n_cur AS DOUBLE) * CAST(refc AS DOUBLE)
        |         / CAST(n_ref AS DOUBLE))
        |    / nullif(CAST(n_cur AS DOUBLE) * CAST(refc AS DOUBLE)
        |         / CAST(n_ref AS DOUBLE), 0.0), 0.0) AS term
        |  FROM c, t
        |), o AS (
        |  SELECT row_number() OVER (ORDER BY bucket) AS rn, term
        |  FROM w WHERE refc > 0
        |), f(rn, acc) AS (
        |  SELECT 0, CAST(0.0 AS DOUBLE)
        |  UNION ALL
        |  SELECT o.rn, f.acc + o.term FROM f JOIN o ON o.rn = f.rn + 1
        |), chi AS (
        |  SELECT round(acc, 6) AS chi2
        |  FROM f ORDER BY rn DESC LIMIT 1
        |)
        |SELECT t.n_ref, t.n_cur,
        |  (SELECT CAST(count(*) AS BIGINT) FROM w WHERE refc > 0)
        |    AS n_buckets,
        |  (SELECT CAST(count(*) AS BIGINT) FROM w
        |   WHERE refc = 0 AND curc > 0) AS n_new_buckets,
        |  (SELECT chi2 FROM chi) AS chi2,
        |  (SELECT chi2 FROM chi) > 30.14
        |    OR (SELECT count(*) FROM w WHERE refc = 0 AND curc > 0) > 0
        |    AS drift
        |FROM t""".stripMargin

  /** Inline a plane set as a literal sign-dot signature expression over
    * `embExpr` — the oracle-side twin of Similarity.lshSignature.
    */
  private def lshSigSqlExprFor(planes: Seq[Seq[Double]],
      embExpr: String): String =
    planes.zipWithIndex.map { case (p, j) =>
      val arr = p.map(_.toString).mkString("[", ", ", "]")
      s"CASE WHEN list_dot_product($embExpr, $arr) > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString("(", "\n     + ", ")")

  private val LshSigSqlExpr: String = lshSigSqlExprFor(
    Similarity.planes(Similarity.DefaultNPlanes, Similarity.DefaultDim), "emb")

  /** The MIPS reduction's augmented-space signature: dim+1 planes from
    * the same LCG stream, database vectors carry sqrt(M²−‖x‖²) — through
    * an explicit FLOAT quantization, mirroring the engine's float array —
    * and queries carry 0.
    */
  private val MipsCtes: String = {
    val ps = Similarity.planes(
      Similarity.MipsNPlanes, Similarity.DefaultDim + 1)
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
       |), n AS (
       |  SELECT vec_id, emb, list_dot_product(emb, emb) AS nsq FROM e
       |), mx AS (
       |  SELECT max(nsq) AS m2 FROM n
       |), a AS (
       |  SELECT vec_id, emb,
       |    list_append(emb, CAST(CAST(sqrt(m2 - nsq) AS FLOAT) AS DOUBLE))
       |      AS aug
       |  FROM n, mx
       |), sa AS (
       |  SELECT vec_id, emb,
       |    CAST(${lshSigSqlExprFor(ps, "aug")} AS BIGINT) AS bucket
       |  FROM a
       |), ok AS (
       |  SELECT bucket FROM sa GROUP BY bucket HAVING count(*) <= 200
       |), cand AS (
       |  SELECT sa.* FROM sa JOIN ok USING (bucket)
       |), q AS (
       |  SELECT vec_id AS qid, emb AS qe,
       |    CAST(${lshSigSqlExprFor(ps,
              "list_append(emb, CAST(0.0 AS DOUBLE))")} AS BIGINT) AS bucket
       |  FROM e WHERE vec_id < 5
       |), mpairs AS (
       |  SELECT qid, c.vec_id, round(list_dot_product(qe, c.emb), 6) AS ip
       |  FROM q JOIN cand c USING (bucket) WHERE c.vec_id <> qid
       |)""".stripMargin
  }

  /** Shared CTE chain for the LSH-bucketed ANN oracles: signature per
    * vector (the literal-planes sign-dot above), buckets capped at 50
    * (mirroring Similarity.lshNearestInBucket), exact in-bucket rerank,
    * best neighbor per vector with the (cos desc, id asc) tiebreak.
    */
  private val AnnLshCtes =
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
       |), sig AS (
       |  SELECT vec_id, emb,
       |    CAST($LshSigSqlExpr AS BIGINT) AS bucket
       |  FROM e
       |), ok AS (
       |  SELECT bucket FROM sig GROUP BY bucket HAVING count(*) <= 50
       |), pr AS (
       |  SELECT s.* FROM sig s JOIN ok USING (bucket)
       |), pairs AS (
       |  SELECT a.vec_id, b.vec_id AS nb_id,
       |    round(list_dot_product(a.emb, b.emb)
       |          / sqrt(list_dot_product(a.emb, a.emb)
       |               * list_dot_product(b.emb, b.emb)), 6) AS cos_sim
       |  FROM pr a JOIN pr b USING (bucket)
       |  WHERE a.vec_id <> b.vec_id
       |), best AS (
       |  SELECT vec_id, nb_id AS nn_id, cos_sim AS nn_cos
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
       |          ORDER BY cos_sim DESC, nb_id ASC) AS rn FROM pairs)
       |  WHERE rn = 1
       |)""".stripMargin

  /** Daily OHLC bars (first/max/min/last per pair-day under the
    * (event_time, event_id) total order) — shared by the batch query and
    * the incrementally-maintained streaming table, which must converge
    * to the identical result.
    */
  private val OhlcOracleSql =
    s"""WITH $RatesCte, w AS (
       |  SELECT ccy_couple, date, rate,
       |    row_number() OVER (PARTITION BY ccy_couple, date
       |      ORDER BY event_time ASC, event_id ASC) AS rn_a,
       |    row_number() OVER (PARTITION BY ccy_couple, date
       |      ORDER BY event_time DESC, event_id DESC) AS rn_d
       |  FROM rates
       |)
       |SELECT ccy_couple, date,
       |  max(CASE WHEN rn_a = 1 THEN rate END) AS open,
       |  max(rate) AS high, min(rate) AS low,
       |  max(CASE WHEN rn_d = 1 THEN rate END) AS close,
       |  count(*) AS n_ticks
       |FROM w GROUP BY ccy_couple, date""".stripMargin

  /** SCD2 validity intervals per (pair, day) under the (ts, event_id)
    * total order — shared by the batch operator and the incrementally
    * maintained streaming history, which must converge to the identical
    * table.
    */
  private val Scd2OracleSql =
    s"""WITH $RatesCte, h AS (
       |  SELECT ccy_couple, date, rate,
       |    epoch_us("timestamp") AS valid_from_us,
       |    epoch_us(lead("timestamp") OVER (PARTITION BY ccy_couple, date
       |      ORDER BY "timestamp" ASC, event_id ASC)) AS valid_to_us
       |  FROM rates
       |)
       |SELECT ccy_couple, date, rate, valid_from_us, valid_to_us,
       |       valid_to_us IS NULL AS is_current
       |FROM h""".stripMargin

  /** DuckDB cosine with the same 6-dp pre-ranking rounding the engine
    * uses (dot products are sequential folds in double on both sides, so
    * the rounded values agree bitwise).
    */
  private def KmCos(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / sqrt(list_dot_product($a, $a)" +
      s" * list_dot_product($b, $b)), 6)"

  /** Unrolled spherical-k-means CTE chain mirroring
    * Similarity.kmeansCentroids step for step: cent0 = the k lowest-id
    * vectors; each iteration assigns to the max-cosine cell (6-dp
    * rounding, cell-asc tiebreak) then recomputes DECIMAL-exact
    * per-dimension means rounded to 6 dp and stored as FLOAT. Returns
    * (CTE SQL, final-centroid CTE name, final component CTE name).
    */
  private def KmeansCtes(k: Int, iters: Int): (String, String, String) = {
    val sb = new StringBuilder
    sb.append(
      s"""e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), cent0 AS (
         |  SELECT CAST(vec_id AS INT) AS cell, emb AS centroid
         |  FROM e WHERE vec_id < $k
         |)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(
        s""", a$i AS (
           |  SELECT vec_id, emb, cell FROM (
           |    SELECT e.vec_id, e.emb, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${KmCos("e.emb", "c.centroid")} DESC, c.cell ASC) AS rn
           |    FROM e CROSS JOIN cent${i - 1} c)
           |  WHERE rn = 1
           |), cc$i AS (
           |  SELECT cell, pos,
           |    CAST(round(CAST(sum(CAST(v AS DECIMAL(30,15))) AS DOUBLE)
           |               / count(*), 6) AS FLOAT) AS c
           |  FROM (SELECT cell, unnest(emb) AS v,
           |          generate_subscripts(emb, 1) AS pos FROM a$i)
           |  GROUP BY cell, pos
           |), cent$i AS (
           |  SELECT cell, CAST(list(c ORDER BY pos) AS DOUBLE[]) AS centroid
           |  FROM cc$i GROUP BY cell
           |)""".stripMargin)
    }
    (sb.toString, s"cent$iters", s"cc$iters")
  }

  /** IVF over the trained cells: final assignment + probe selection +
    * exact in-cell rerank, all replayed from the training CTEs. Shared
    * verbatim by the train-then-search gate and the maintained
    * streaming-index replay, which must serve the identical top-k.
    */
  /** The IVF train+search replay, parameterized by an extra rerank-side
    * predicate on the indexed vectors — `""` for the full corpus;
    * the delete gate passes the retained-set filter (training always
    * sees the full corpus: centroids are a frozen artifact, deletes
    * touch only the index entries).
    */
  private def IvfKmeansOracle(rerankAnd: String): String = {
    val (ctes, centFinal, _) = KmeansCtes(8, 2)
    s"""WITH $ctes, af AS (
       |  SELECT vec_id, emb, cell FROM (
       |    SELECT e.vec_id, e.emb, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${KmCos("e.emb", "c.centroid")} DESC, c.cell ASC) AS rn
       |    FROM e CROSS JOIN $centFinal c)
       |  WHERE rn = 1
       |), q AS (
       |  SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 5
       |), probes AS (
       |  SELECT qid, qe, cell FROM (
       |    SELECT q.qid, q.qe, c.cell,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY ${KmCos("q.qe", "c.centroid")} DESC, c.cell ASC) AS pr
       |    FROM q CROSS JOIN $centFinal c)
       |  WHERE pr <= 2
       |), scored AS (
       |  SELECT p.qid, p.cell, a.vec_id,
       |    ${KmCos("p.qe", "a.emb")} AS cos_sim
       |  FROM probes p JOIN af a USING (cell)
       |  WHERE a.vec_id <> p.qid$rerankAnd
       |)
       |SELECT qid, CAST(cell AS BIGINT) AS cell, vec_id, cos_sim, rank
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |        ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM scored)
       |WHERE rank <= 5""".stripMargin
  }

  private val IvfKmeansTopKOracleSql: String = IvfKmeansOracle("")

  /** The HNSW-style beam search replayed end to end: k-means training
    * (the shared unrolled CTEs), assignment, the bounded-degree graph
    * (in-cell m-NN symmetrized + cell-representative backbone), and
    * `hops` unrolled beam rounds — MATERIALIZED per the iterative-CTE
    * discipline (each beam CTE is referenced twice). Returns the full
    * visited-set CTE chain; the two gates rank it differently.
    */
  private def HnswCtes(m: Int, beamWidth: Int, hops: Int,
      queryCte: String = "SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 5",
      excludeSelf: Boolean = true): String = {
    val (ctes, centFinal, _) = KmeansCtes(8, 2)
    val sb = new StringBuilder
    sb.append(
      s"""$ctes, af AS MATERIALIZED (
         |  SELECT vec_id, emb, cell FROM (
         |    SELECT e.vec_id, e.emb, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${KmCos("e.emb", "c.centroid")} DESC, c.cell ASC) AS rn
         |    FROM e CROSS JOIN $centFinal c)
         |  WHERE rn = 1
         |), nn AS (
         |  SELECT src, dst FROM (
         |    SELECT a.vec_id AS src, b.vec_id AS dst,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${KmCos("a.emb", "b.emb")} DESC, b.vec_id ASC) AS rn
         |    FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id <> b.vec_id)
         |  WHERE rn <= $m
         |), reps AS (
         |  SELECT cell, min(vec_id) AS rep FROM af GROUP BY 1
         |), edges AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM nn
         |    UNION ALL SELECT dst AS src, src AS dst FROM nn
         |    UNION ALL SELECT r1.rep AS src, r2.rep AS dst
         |      FROM reps r1 JOIN reps r2 ON r1.rep <> r2.rep
         |    UNION ALL SELECT a.vec_id AS src, r.rep AS dst
         |      FROM af a JOIN reps r ON a.cell = r.cell AND a.vec_id <> r.rep)
         |), q AS (
         |  $queryCte
         |), b0 AS (
         |  SELECT q.qid, r.rep AS vec_id FROM q CROSS JOIN reps r
         |)""".stripMargin)
    for (i <- 1 to hops) {
      sb.append(
        s""", c$i AS (
           |  SELECT DISTINCT qid, vec_id FROM (
           |    SELECT qid, vec_id FROM b${i - 1}
           |    UNION ALL
           |    SELECT b.qid, g.dst AS vec_id
           |    FROM b${i - 1} b JOIN edges g ON g.src = b.vec_id)
           |), s$i AS MATERIALIZED (
           |  SELECT c.qid, c.vec_id, ${KmCos("q.qe", "a.emb")} AS sim
           |  FROM c$i c JOIN q ON q.qid = c.qid
           |  JOIN af a ON a.vec_id = c.vec_id
           |  ${if (excludeSelf) "WHERE c.vec_id <> c.qid" else ""}
           |), b$i AS MATERIALIZED (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
           |      ORDER BY sim DESC, vec_id ASC) AS rn FROM s$i)
           |  WHERE rn <= $beamWidth
           |)""".stripMargin)
    }
    sb.append(
      s""", visited AS MATERIALIZED (
         |  SELECT DISTINCT qid, vec_id, sim FROM (
         |    ${(1 to hops).map(i => s"SELECT qid, vec_id, sim FROM s$i")
              .mkString("\n    UNION ALL ")})
         |)""".stripMargin)
    sb.toString
  }

  private val HnswTopKOracleSql: String =
    s"""WITH ${HnswCtes(4, 10, 3)}
       |SELECT qid, vec_id, sim AS cos_sim, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY sim DESC, vec_id ASC) AS rank FROM visited)
       |WHERE rank <= 5""".stripMargin

  /** The delete-gate replay: the SAME full-graph beam search (soft
    * deletes leave the graph and the walk untouched), visited set
    * filtered to the retained ids BEFORE ranking.
    */
  private val HnswDeleteOracleSql: String =
    s"""WITH ${HnswCtes(4, 10, 3)}
       |SELECT qid, vec_id, sim AS cos_sim, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY sim DESC, vec_id ASC) AS rank FROM visited
       |  WHERE NOT (vec_id % 10 = 7))
       |WHERE rank <= 5""".stripMargin

  private val HnswRecallOracleSql: String =
    s"""WITH ${HnswCtes(4, 10, 3)}, hn AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, vec_id ASC) AS rank FROM visited)
       |  WHERE rank <= 5
       |), bscored AS (
       |  SELECT q.qid, x.vec_id, ${KmCos("q.qe", "x.emb")} AS sim
       |  FROM e x CROSS JOIN q WHERE x.vec_id <> q.qid
       |), brute AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, vec_id ASC) AS rn FROM bscored)
       |  WHERE rn <= 5
       |), hits AS (
       |  SELECT qid, count(*) AS n_hits
       |  FROM hn JOIN brute USING (qid, vec_id) GROUP BY 1
       |), tru AS (
       |  SELECT qid, count(*) AS n_true FROM brute GROUP BY 1
       |)
       |SELECT t.qid, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  t.n_true,
       |  CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST(t.n_true AS DOUBLE)
       |    AS recall
       |FROM tru t LEFT JOIN hits h USING (qid)""".stripMargin

  /** The delete-gate replay: search over the retained set — everything
    * except the deleted-and-not-re-added ids (vec_id % 20 = 17).
    */
  private val IvfKmeansDeleteOracleSql: String =
    IvfKmeansOracle(" AND NOT (a.vec_id % 20 = 17)")

  /** Cross-modal retrieval through the navigable graph: the media-
    * encoder replay (the mm_crossmodal_topk mv CTE) fed as the query
    * frame into the HNSW training→graph→beam CTEs — no self-exclusion
    * (doc_ids and vec_ids are different id spaces).
    */
  private val MmCrossModalHnswTopKOracleSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, octet_length(encode(text)) AS len,
       |    hex(encode(text)) AS hx
       |  FROM documents WHERE doc_id % 3 = 0
       |), mv AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 64), i ->
       |      CAST(CAST(
       |        list_reduce(
       |          list_prepend(CAST(1125899906842597 + i AS HUGEINT),
       |            list_transform(range(i, len, 64), j ->
       |              CAST(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
       |                   + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
       |                   AS HUGEINT))),
       |          (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT
       |        ) // 2048 AS DOUBLE) / 9007199254740992.0 AS FLOAT)) AS v
       |  FROM m
       |), ${HnswCtes(4, 10, 3,
          queryCte = "SELECT doc_id AS qid, CAST(v AS DOUBLE[]) AS qe FROM mv",
          excludeSelf = false)}
       |SELECT qid AS doc_id, vec_id, sim AS cos_sim, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |    ORDER BY sim DESC, vec_id ASC) AS rank FROM visited)
       |WHERE rank <= 3""".stripMargin

  /** The recursive-closure SQL, built from two shared fragments: the
    * corpus-scale edge aggregation and the bounded recursion over the
    * resulting |nations|² digest. The oracle runs the one-statement
    * composition; the engine MATERIALIZES the edge digest once
    * (localCheckpoint + temp view) and recurses over the scan — Spark's
    * UnionLoop re-evaluates the step subtree every iteration, so an
    * inlined edges CTE would re-run the 4-table aggregation per hop.
    * Anchor: nation 0 at hop 0; step: follow thresholded trade edges
    * while hop < 3; report min hop + walk count per reached nation. The
    * threshold keeps the digest graph sparse enough that the bounded
    * walk count stays far from |V|^hops.
    */
  private val RecursiveClosureEdgesSql: String =
    """SELECT c_nationkey AS src, s_nationkey AS dst
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1, 2
      |HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |       > 3000000.00""".stripMargin

  /** The closure digest with an integer edge COST inverse to trade
    * revenue: heavier trade lanes are cheaper hops. The revenue is kept
    * as an exact scaled integer (×10⁴ — the product's full 4 decimal
    * places) before the integer division, so no decimal→int cast with
    * engine-specific rounding ever happens; `div`/`//` on positive
    * BIGINTs agree across engines.
    */
  private val ShortestPathEdgesSql: String =
    """SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
      |  CAST(100000000000000 AS BIGINT) div CAST(rev * 10000 AS BIGINT)
      |    AS w
      |FROM (
      |  SELECT c_nationkey AS src, s_nationkey AS dst,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |      AS rev
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2
      |  HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |         > 3000000.00
      |)""".stripMargin

  /** Walk-enumerating oracle twin of ShortestPaths.boundedSingleSource
    * over [[ShortestPathEdgesSql]]: every ≤4-hop walk from node 0, then
    * the per-node min cost and the min hop count among cost-ties.
    */
  private val ShortestPathTradeSql: String =
    s"""WITH RECURSIVE edges AS (
       |${ShortestPathEdgesSql.replace(" div ", " // ")
            .linesIterator.map("  " + _).mkString("\n")}
       |), walks AS (
       |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS cost,
       |    0 AS hop
       |  UNION ALL
       |  SELECT e.dst, wk.cost + e.w, wk.hop + 1
       |  FROM walks wk JOIN edges e ON e.src = wk.node
       |  WHERE wk.hop < 4
       |), m AS (
       |  SELECT node, min(cost) AS min_cost FROM walks GROUP BY node
       |)
       |SELECT wk.node, m.min_cost, min(wk.hop) AS min_hops
       |FROM walks wk
       |JOIN m ON wk.node = m.node AND wk.cost = m.min_cost
       |GROUP BY wk.node, m.min_cost""".stripMargin

  private def recursiveClosureOverSql(edgesRelation: String): String =
    s"""WITH RECURSIVE reach AS (
       |  SELECT CAST(0 AS BIGINT) AS node, 0 AS hop
       |  UNION ALL
       |  SELECT e.dst AS node, r.hop + 1 AS hop
       |  FROM reach r JOIN $edgesRelation e ON e.src = r.node
       |  WHERE r.hop < 3
       |)
       |SELECT node, min(hop) AS min_hops,
       |  CAST(count(*) AS BIGINT) AS n_walks
       |FROM reach GROUP BY node""".stripMargin

  private val RecursiveClosureSql: String =
    s"""WITH RECURSIVE edges AS (
       |${RecursiveClosureEdgesSql.linesIterator.map("  " + _).mkString("\n")}
       |), reach AS (
       |  SELECT CAST(0 AS BIGINT) AS node, 0 AS hop
       |  UNION ALL
       |  SELECT e.dst AS node, r.hop + 1 AS hop
       |  FROM reach r JOIN edges e ON e.src = r.node
       |  WHERE r.hop < 3
       |)
       |SELECT node, min(hop) AS min_hops,
       |  CAST(count(*) AS BIGINT) AS n_walks
       |FROM reach GROUP BY node""".stripMargin

  /** Squared-L2 replay via three list_dot_products — the exact
    * left-associated tree Similarity.l2sq builds, 6-dp rounded at every
    * comparison site.
    */
  private def PqL2(a: String, b: String): String =
    s"round(list_dot_product($a, $a) - 2.0 * list_dot_product($a, $b)" +
      s" + list_dot_product($b, $b), 6)"

  /** Unrolled product-quantization training: per subspace, the
    * KmeansCtes recipe with Euclidean assignment (argmin 6-dp L2²,
    * cell-asc tiebreak) over the subvector slices; emits `cb` (the
    * m-subspace codebook union) and `svall` (every vector's subvector
    * per subspace) for the encode/ADC chain.
    */
  private def PqCtes(m: Int, k: Int, iters: Int, dim: Int = 64): String = {
    val d = dim / m
    val sb = new StringBuilder
    sb.append(
      "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)")
    for (sub <- 0 until m) {
      val lo = sub * d + 1; val hi = sub * d + d
      sb.append(
        s""", sv$sub AS (SELECT vec_id, emb[$lo:$hi] AS sv FROM e),
           |c${sub}_0 AS (
           |  SELECT CAST(vec_id AS INT) AS cell, sv AS centroid
           |  FROM sv$sub WHERE vec_id < $k
           |)""".stripMargin)
      for (i <- 1 to iters) {
        sb.append(
          s""", a${sub}_$i AS (
             |  SELECT vec_id, sv, cell FROM (
             |    SELECT s.vec_id, s.sv, c.cell,
             |      row_number() OVER (PARTITION BY s.vec_id
             |        ORDER BY ${PqL2("s.sv", "c.centroid")} ASC, c.cell ASC)
             |        AS rn
             |    FROM sv$sub s CROSS JOIN c${sub}_${i - 1} c)
             |  WHERE rn = 1
             |), cc${sub}_$i AS (
             |  SELECT cell, pos,
             |    CAST(round(CAST(sum(CAST(v AS DECIMAL(30,15))) AS DOUBLE)
             |               / count(*), 6) AS FLOAT) AS c
             |  FROM (SELECT cell, unnest(sv) AS v,
             |          generate_subscripts(sv, 1) AS pos FROM a${sub}_$i)
             |  GROUP BY cell, pos
             |), c${sub}_$i AS (
             |  SELECT cell, CAST(list(c ORDER BY pos) AS DOUBLE[]) AS centroid
             |  FROM cc${sub}_$i GROUP BY cell
             |)""".stripMargin)
      }
    }
    val cbUnion = (0 until m)
      .map(sub => s"SELECT $sub AS sub, cell, centroid FROM c${sub}_$iters")
      .mkString("\n  UNION ALL ")
    val svUnion = (0 until m)
      .map(sub => s"SELECT vec_id, $sub AS sub, sv FROM sv$sub")
      .mkString("\n  UNION ALL ")
    sb.append(s""", cb AS (\n  $cbUnion\n), svall AS (\n  $svUnion\n)""")
    sb.toString
  }

  /** The IVFADC replay up to the `adc` CTE (qid, label, vec_id,
    * adc_dist): PQ training + encoding (PqCtes), DECIMAL-exact
    * label-cell centroids + probe selection, candidates restricted to
    * probed cells, the micro-scaled-long ADC fold. Shared by the
    * sim_ivfpq_topk gate and the sim_ivfpq_recall gate (which joins the
    * ADC top-k against the brute cosine top-k). Also exposes `q`
    * (qid, qe) for the brute side.
    */
  private lazy val IvfPqAdcCtes: String =
    s"""${PqCtes(8, 8, 2)},
       |codes AS (
       |  SELECT vec_id, sub, cell FROM (
       |    SELECT s.vec_id, s.sub, c.cell,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub
       |        ORDER BY ${PqL2("s.sv", "c.centroid")} ASC, c.cell ASC) AS rn
       |    FROM svall s JOIN cb c ON c.sub = s.sub)
       |  WHERE rn = 1
       |), un AS (
       |  SELECT label, unnest(embedding) AS ev,
       |         generate_subscripts(embedding, 1) AS pos
       |  FROM embeddings
       |), ccl AS (
       |  SELECT label, pos,
       |    CAST(round(CAST(sum(CAST(CAST(ev AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)
       |               / count(*), 6) AS FLOAT) AS c
       |  FROM un GROUP BY label, pos
       |), cent AS (
       |  SELECT label, CAST(list(c ORDER BY pos) AS DOUBLE[]) AS centroid
       |  FROM ccl GROUP BY label
       |), q AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id < 5
       |), probes AS (
       |  SELECT qid, label FROM (
       |    SELECT qid, label,
       |      row_number() OVER (PARTITION BY qid ORDER BY
       |        round(list_dot_product(qe, centroid)
       |              / sqrt(list_dot_product(qe, qe)
       |                   * list_dot_product(centroid, centroid)), 6) DESC,
       |        label ASC) AS pr
       |    FROM q CROSS JOIN cent)
       |  WHERE pr <= 2
       |), cand AS (
       |  SELECT p.qid, p.label, e.vec_id
       |  FROM probes p JOIN embeddings e USING (label)
       |  WHERE e.vec_id <> p.qid
       |), qsv AS (
       |  SELECT vec_id AS qid, sub, sv AS qv FROM svall WHERE vec_id < 5
       |), parts AS (
       |  SELECT c.qid, c.label, c.vec_id,
       |    CAST(floor(${PqL2("qs.qv", "b.centroid")} * 1000000 + 0.5)
       |         AS BIGINT) AS pdm
       |  FROM cand c
       |  JOIN codes x ON x.vec_id = c.vec_id
       |  JOIN cb b ON b.sub = x.sub AND b.cell = x.cell
       |  JOIN qsv qs ON qs.qid = c.qid AND qs.sub = x.sub
       |), adc AS (
       |  SELECT qid, label, vec_id,
       |    CAST(sum(pdm) AS DOUBLE) / 1000000 AS adc_dist
       |  FROM parts GROUP BY 1, 2, 3
       |)""".stripMargin

  /** Unrolled BPE-training CTE chain mirroring Bpe.trainMerges step for
    * step: word-type table (same tokenizer + filter + deterministic
    * top cut), then per merge step adjacent-pair integer counts, the
    * (cnt desc, l asc, r asc) argmax, and the left-to-right
    * non-overlapping merge fold. DuckDB's list_reduce wants accumulator
    * and element types equal, so symbols fold as singleton lists.
    */
  /** Benford audit oracle over any 1-column (`amt`) relation: the nine
    * hardcoded log10(1+1/d) literals repeated verbatim so the
    * expectation/contribution double trees are operand-identical with
    * the engine — shared by the non-conforming (lineitem prices) and
    * conforming (squared event values) exemplars.
    */
  private def BenfordOracleSql(amtRelation: String): String = {
    val pcase =
      """(CASE digit
        |    WHEN 1 THEN 0.3010299956639812
        |    WHEN 2 THEN 0.17609125905568124
        |    WHEN 3 THEN 0.12493873660829992
        |    WHEN 4 THEN 0.09691001300805642
        |    WHEN 5 THEN 0.07918124604762482
        |    WHEN 6 THEN 0.06694678963061322
        |    WHEN 7 THEN 0.05799194697768673
        |    WHEN 8 THEN 0.05115252244738129
        |    ELSE 0.04575749056067514 END)""".stripMargin
    val expected = s"CAST(n_total AS DOUBLE) * $pcase"
    val dev = s"(CAST(n_obs AS DOUBLE) - $expected)"
    s"""WITH o AS (
       |  SELECT CAST(substr(CAST(amt AS VARCHAR), 1, 1) AS INTEGER)
       |    AS digit, count(*) AS n_obs
       |  FROM ($amtRelation)
       |  WHERE CAST(substr(CAST(amt AS VARCHAR), 1, 1) AS INTEGER)
       |    BETWEEN 1 AND 9
       |  GROUP BY 1
       |), t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM o)
       |SELECT digit, n_obs,
       |  $expected AS expected,
       |  $dev * $dev / ($expected) AS chi2_term
       |FROM o CROSS JOIN t""".stripMargin
  }

  private def BpeCtes(iters: Int, maxWords: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""wt AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
         |    FROM documents)
         |  WHERE regexp_matches(word, '^[a-z]+$$')
         |  GROUP BY word ORDER BY freq DESC, word ASC LIMIT $maxWords
         |), st0 AS (
         |  SELECT word, freq, regexp_extract_all(word, '.') AS syms FROM wt
         |)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(
        s""", pc$i AS (
           |  SELECT p.l, p.r, sum(p.freq) AS cnt FROM (
           |    SELECT freq, unnest(syms[1:len(syms) - 1]) AS l,
           |           unnest(syms[2:len(syms)]) AS r
           |    FROM st${i - 1}) p
           |  GROUP BY 1, 2
           |), b$i AS (
           |  SELECT l, r, cnt FROM pc$i ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
           |), st$i AS (
           |  SELECT word, freq,
           |    list_reduce(list_transform(syms, x -> [x]), (acc, x) ->
           |      CASE WHEN acc[-1] = b.l AND x[1] = b.r
           |           THEN list_append(array_pop_back(acc), b.l || b.r)
           |           ELSE list_append(acc, x[1]) END) AS syms
           |  FROM st${i - 1}, b$i b
           |)""".stripMargin)
    }
    sb.toString
  }

  /** The WordPiece training replay: BPE's fold with the likelihood
    * selection — per step, pair counts AND symbol counts, then the
    * NOT EXISTS cross-multiplication tournament (exact BIGINT products;
    * DuckDB errors on overflow rather than wrapping, so a too-large
    * corpus is loud, not wrong).
    */
  private def WpCtes(iters: Int, maxWords: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""wt AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
         |    FROM documents)
         |  WHERE regexp_matches(word, '^[a-z]+$$')
         |  GROUP BY word ORDER BY freq DESC, word ASC LIMIT $maxWords
         |), wst0 AS (
         |  SELECT word, freq, regexp_extract_all(word, '.') AS syms FROM wt
         |)""".stripMargin)
    for (i <- 1 to iters) {
      sb.append(
        s""", wpc$i AS (
           |  SELECT p.l, p.r, sum(p.freq) AS cnt FROM (
           |    SELECT freq, unnest(syms[1:len(syms) - 1]) AS l,
           |           unnest(syms[2:len(syms)]) AS r
           |    FROM wst${i - 1}) p
           |  GROUP BY 1, 2
           |), wuc$i AS (
           |  SELECT s, sum(freq) AS ucnt FROM (
           |    SELECT freq, unnest(syms) AS s FROM wst${i - 1})
           |  GROUP BY 1
           |), wcd$i AS MATERIALIZED (
           |  SELECT p.l, p.r, p.cnt, a.ucnt AS ul, b.ucnt AS ur
           |  FROM wpc$i p
           |  JOIN wuc$i a ON a.s = p.l JOIN wuc$i b ON b.s = p.r
           |), wb$i AS (
           |  SELECT l, r, cnt, ul, ur FROM wcd$i x
           |  WHERE NOT EXISTS (
           |    SELECT 1 FROM wcd$i y
           |    WHERE y.cnt * x.ul * x.ur > x.cnt * y.ul * y.ur
           |       OR (y.cnt * x.ul * x.ur = x.cnt * y.ul * y.ur
           |           AND (y.l < x.l OR (y.l = x.l AND y.r < x.r))))
           |), wst$i AS (
           |  SELECT word, freq,
           |    list_reduce(list_transform(syms, x -> [x]), (acc, x) ->
           |      CASE WHEN acc[-1] = b.l AND x[1] = b.r
           |           THEN list_append(array_pop_back(acc), b.l || b.r)
           |           ELSE list_append(acc, x[1]) END) AS syms
           |  FROM wst${i - 1}, wb$i b
           |)""".stripMargin)
    }
    sb.toString
  }

  private val WordPieceMergesOracleSql: String = {
    val iters = 8
    val steps = (1 to iters).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, l AS merge_left, " +
        s"r AS merge_right, CAST(cnt AS BIGINT) AS pair_count, " +
        s"CAST(ul AS BIGINT) AS left_count, CAST(ur AS BIGINT) AS right_count " +
        s"FROM wb$i").mkString(" UNION ALL ")
    s"""WITH ${WpCtes(iters, 2000)}
       |$steps""".stripMargin
  }

  /** The full BPE training replay (8 merges over the top-2000 word
    * types) — shared by the batch query and the incrementally-maintained
    * retrain, which must learn the identical merge table.
    */
  private val BpeMergesOracleSql: String = {
    val iters = 8
    val steps = (1 to iters).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, l AS merge_left, " +
        s"r AS merge_right, CAST(cnt AS BIGINT) AS pair_count FROM b$i")
      .mkString("\n|  UNION ALL ")
    s"""WITH ${BpeCtes(iters, 2000)}
       |SELECT * FROM (
       |  $steps
       |)""".stripMargin
  }

  /** The PageRank iteration unrolled (the k-means/BPE replay pattern):
    * p0 = 1/N, then per step a source-ordered list_reduce fold of the
    * in-neighbor contributions — the same left fold (init 0.0, then
    * + in src order) as the Spark side's sorted aggregate-HOF, so the
    * double rounding sequence matches bit for bit.
    */
  /** The nation-level revenue-weighted trade edges — the graph both
    * PageRank gates run on (exact DECIMAL weights; the corpus-scale
    * aggregation, shuffled once on the nation pair).
    */
  private def tradeRevenueEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
      col("l_suppkey"),
      (col("l_extendedprice").cast("decimal(18,2)")
        * (lit(1.0).cast("decimal(4,2)")
          - col("l_discount").cast("decimal(4,2)"))).as("rev"))
    li
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(sum(col("rev")).as("w"))
  }

  /** The MUTUAL top-N trade partner graph: keep each nation's top-N
    * counterparties by revenue (ties broken by dst — a total order on
    * exact DECIMAL weights), then an edge survives only when BOTH
    * directions kept it. Mutual-kNN sparsification turns the
    * near-complete revenue digest into a graph with real core
    * structure; the output is symmetric by construction (if (a,b) and
    * (b,a) are both top-ranked, the semi-join keeps both rows), which
    * is exactly the edge-list shape [[graft.operators.KCore]] expects.
    * The window runs on the ≤|nations|² digest, never the corpus.
    */
  private def mutualTopTradeEdges(s: SparkSession, dir: String,
      topN: Int): DataFrame =
    graft.operators.GraphStats.mutualTopK(tradeRevenueEdges(s, dir), topN)

  /** The personalized variant's oracle: the PagerankTradeOracleSql
    * CTE chain with seeded initial mass and seeded per-step teleport
    * (literal fractions written as the same divisions Scala computes).
    */
  private val PprTradeOracleSql: String = {
    val iters = 5
    val tp = "CASE WHEN nodes.node IN (0, 1) THEN 0.15 / 2 ELSE 0.0 END"
    val steps = (1 to iters).map { i =>
      val prev = s"p${i - 1}"
      s"""c$i AS (
         |  SELECT r.dst,
         |    list_reduce(list_prepend(0.0, list(p.pr * r.ratio ORDER BY r.src)),
         |                (a, b) -> a + b) AS m
         |  FROM r JOIN $prev p ON p.node = r.src GROUP BY r.dst
         |), p$i AS (
         |  SELECT nodes.node, $tp + 0.85 * coalesce(c$i.m, 0.0) AS pr
         |  FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
       |    sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
       |        * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
       |      AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2
       |), wo AS (SELECT src, sum(w) AS wout FROM e GROUP BY 1),
       |r AS (
       |  SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(wo.wout AS DOUBLE) AS ratio
       |  FROM e JOIN wo ON e.src = wo.src
       |),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |p0 AS (
       |  SELECT node,
       |    CASE WHEN node IN (0, 1) THEN 1.0 / 2 ELSE 0.0 END AS pr
       |  FROM nodes
       |),
       |$steps
       |SELECT n_name AS nation, pr
       |FROM p$iters JOIN nation ON n_nationkey = p$iters.node""".stripMargin
  }

  /** Clustering coefficient + assortativity, with triangles counted
    * DEFINITIONALLY (ordered triple join over u<v canonical edges) —
    * the textbook cross-check of the engine's oriented-wedge closure.
    * cc uses the halving-free integer identity 6T / Σd(d−1); the corr
    * tree casts the exact integer moments to double in the same order
    * as the engine.
    */
  private val GraphStatsTradeOracleSql: String =
    """WITH e0 AS MATERIALIZED (
      |  SELECT c_nationkey AS src, s_nationkey AS dst,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |      AS w
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE c_nationkey <> s_nationkey
      |  GROUP BY 1, 2
      |), top AS MATERIALIZED (
      |  SELECT src, dst FROM (
      |    SELECT src, dst,
      |      row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC)
      |        AS rn
      |    FROM e0)
      |  WHERE rn <= 7
      |), mut AS MATERIALIZED (
      |  SELECT a.src, a.dst FROM top a
      |  JOIN top b ON a.src = b.dst AND a.dst = b.src
      |), canon AS MATERIALIZED (
      |  SELECT DISTINCT src AS u, dst AS v FROM mut WHERE src < dst
      |), deg AS MATERIALIZED (
      |  SELECT node, count(*) AS d FROM (
      |    SELECT u AS node FROM canon UNION ALL SELECT v FROM canon)
      |  GROUP BY 1
      |), dstats AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
      |    CAST(sum(d * (d - 1)) AS BIGINT) AS w2
      |  FROM deg
      |), ecnt AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_edges FROM canon
      |), tri AS (
      |  SELECT CAST(count(*) AS BIGINT) AS t
      |  FROM canon e1
      |  JOIN canon e2 ON e2.u = e1.v
      |  JOIN canon e3 ON e3.u = e1.u AND e3.v = e2.v
      |), mo AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM (
      |    SELECT du.d AS x, dv.d AS y
      |    FROM mut JOIN deg du ON du.node = mut.src
      |    JOIN deg dv ON dv.node = mut.dst)
      |)
      |SELECT n_nodes, n_edges, t AS n_triangles, w2 // 2 AS n_wedges,
      |  CAST(t * 6 AS DOUBLE) / nullif(CAST(w2 AS DOUBLE), 0.0)
      |    AS clustering_coeff,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / sqrt(nullif(greatest(
      |        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0), 0.0))
      |    AS assortativity
      |FROM dstats, ecnt, tri, mo""".stripMargin

  /** The k-core peel unrolled as chained CTEs (the PageRank-steps
    * pattern): rN keeps the edges of r(N-1) whose BOTH endpoints still
    * have degree ≥ k. 26 rounds ≥ |nations|+1 guarantees the fixpoint
    * at any scale factor — peeling deletes at least one vertex per
    * non-fixpoint round, so extra rounds are no-ops. The engine
    * iterates to the same fixpoint with an edge-count early exit; the
    * results agree because the peel is monotone.
    */
  /** The trade-graph k-truss (k = 5) as 29 unrolled edge-peel rounds —
    * the |E|-bound (28 canonical mutual-top-7 edges at sf0.01, each
    * non-final round deletes ≥ 1): adj is the surviving symmetric
    * closure, support the wedge-join count, and a converged round is a
    * no-op so extra rounds are harmless. MATERIALIZED everywhere — the
    * k-core lesson: un-materialized round CTEs inline exponentially.
    */
  private val KtrussTradeOracleSql: String = {
    val k = 5
    val rounds = (1 to 29).map { i =>
      val p = s"c${i - 1}"
      s"""adj${i - 1} AS MATERIALIZED (
         |  SELECT u AS x, v AS w FROM $p UNION ALL SELECT v, u FROM $p
         |), sup$i AS MATERIALIZED (
         |  SELECT e.u, e.v, count(*) AS support
         |  FROM $p e
         |  JOIN adj${i - 1} a1 ON a1.x = e.u
         |  JOIN adj${i - 1} a2 ON a2.x = e.v AND a2.w = a1.w
         |  GROUP BY 1, 2
         |), c$i AS MATERIALIZED (
         |  SELECT e.u, e.v FROM $p e LEFT JOIN sup$i s ON s.u = e.u AND s.v = e.v
         |  WHERE coalesce(s.support, 0) >= ${k - 2}
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT c_nationkey AS src, s_nationkey AS dst,
       |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
       |        * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
       |      AS w
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  WHERE c_nationkey <> s_nationkey
       |  GROUP BY 1, 2
       |), top AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC)
       |        AS rn
       |    FROM e0)
       |  WHERE rn <= 7
       |), r0 AS MATERIALIZED (
       |  SELECT a.src, a.dst FROM top a
       |  JOIN top b ON a.src = b.dst AND a.dst = b.src
       |), c0 AS MATERIALIZED (
       |  SELECT src AS u, dst AS v FROM r0 WHERE src < dst
       |), $rounds
       |SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
       |  CAST(s.support AS BIGINT) AS support
       |FROM c29 e JOIN sup29 s ON s.u = e.u AND s.v = e.v
       |JOIN nation na ON na.n_nationkey = e.u
       |JOIN nation nb ON nb.n_nationkey = e.v""".stripMargin
  }

  /** HITS replay: 5 synchronous iterations as chained CTEs — each
    * auth/hub update an ORDERED list_reduce left fold (the PageRank
    * oracle discipline, matching Spark's sort_array + aggregate HOF),
    * each normalization a 1-row max cross-joined back.
    */
  private val HitsTradeOracleSql: String = {
    val iters = 5
    val steps = (1 to iters).map { i =>
      s"""ac$i AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    list_reduce(list_prepend(0.0, list(h.s ORDER BY e.src)),
         |                (x, y) -> x + y) AS m
         |  FROM e JOIN h${i - 1} h ON h.node = e.src GROUP BY e.dst
         |), am$i AS MATERIALIZED (SELECT max(m) AS mx FROM ac$i),
         |a$i AS MATERIALIZED (
         |  SELECT nodes.node, coalesce(ac$i.m, 0.0) / am$i.mx AS s
         |  FROM nodes LEFT JOIN ac$i ON ac$i.node = nodes.node
         |  CROSS JOIN am$i
         |), hc$i AS MATERIALIZED (
         |  SELECT e.src AS node,
         |    list_reduce(list_prepend(0.0, list(a.s ORDER BY e.dst)),
         |                (x, y) -> x + y) AS m
         |  FROM e JOIN a$i a ON a.node = e.dst GROUP BY e.src
         |), hm$i AS MATERIALIZED (SELECT max(m) AS mx FROM hc$i),
         |h$i AS MATERIALIZED (
         |  SELECT nodes.node, coalesce(hc$i.m, 0.0) / hm$i.mx AS s
         |  FROM nodes LEFT JOIN hc$i ON hc$i.node = nodes.node
         |  CROSS JOIN hm$i
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  WHERE c_nationkey <> s_nationkey
       |), nodes AS MATERIALIZED (
       |  SELECT src AS node FROM e UNION SELECT dst FROM e),
       |h0 AS MATERIALIZED (
       |  SELECT node, CAST(1.0 AS DOUBLE) AS s FROM nodes),
       |$steps
       |SELECT n_name AS nation, a$iters.s AS authority, h$iters.s AS hub
       |FROM nodes
       |JOIN a$iters ON a$iters.node = nodes.node
       |JOIN h$iters ON h$iters.node = nodes.node
       |JOIN nation ON n_nationkey = nodes.node""".stripMargin
  }

  /** PCA power-iteration replay: the milli-quantized covariance digest
    * by moment identity (all-HUGEINT, cast to BIGINT), then 8 matvec
    * steps as MATERIALIZED CTEs — ordered list_reduce folds and 1-row
    * L∞ normalizers, operand-identical to the engine's HOF folds.
    */
  private val PcaPowerOracleSql: String =
    s"""WITH $PcaPowerCtes
       |SELECT CAST(v8.j AS BIGINT) AS dim,
       |  v8.s AS loading, n8.mx AS lambda_inf
       |FROM v8 CROSS JOIN n8""".stripMargin

  /** The trained component applied back to the corpus: per-vector
    * ordered dim fold q·v, global top-10 by (\|score\| DESC, vec_id). */
  private val PcaProjectOracleSql: String =
    s"""WITH $PcaPowerCtes, sc AS MATERIALIZED (
       |  SELECT q.vec_id,
       |    list_reduce(list_prepend(0.0,
       |        list(CAST(q.x AS DOUBLE) * v8.s ORDER BY q.i)),
       |      (x, y) -> x + y) AS score
       |  FROM q JOIN v8 ON v8.j = q.i GROUP BY q.vec_id
       |)
       |SELECT vec_id, score FROM (
       |  SELECT vec_id, score,
       |    row_number() OVER (ORDER BY abs(score) DESC, vec_id ASC) AS rn
       |  FROM sc)
       |WHERE rn <= 10""".stripMargin

  private lazy val PcaPowerCtes: String = {
    val iters = 8
    val steps = (1 to iters).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT m.j,
         |    list_reduce(list_prepend(0.0,
         |        list(CAST(m.c AS DOUBLE) * v.s ORDER BY m.k)),
         |      (x, y) -> x + y) AS w
         |  FROM cm m JOIN v${i - 1} v ON v.j = m.k GROUP BY m.j
         |), n$i AS MATERIALIZED (SELECT max(abs(w)) AS mx FROM p$i),
         |v$i AS MATERIALIZED (
         |  SELECT p$i.j, p$i.w / n$i.mx AS s FROM p$i CROSS JOIN n$i
         |)""".stripMargin
    }.mkString(", ")
    s"""q AS MATERIALIZED (
       |  SELECT vec_id, t.i,
       |    CAST(trunc(CAST(embedding[t.i] AS DOUBLE) * 1000.0) AS BIGINT)
       |      AS x
       |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) t
       |), mo AS MATERIALIZED (
       |  SELECT i, sum(x) AS s1, count(*) AS n FROM q GROUP BY 1
       |), cr AS MATERIALIZED (
       |  SELECT a.i AS j, b.i AS k, sum(a.x * b.x) AS sjk
       |  FROM q a JOIN q b ON a.vec_id = b.vec_id
       |  GROUP BY 1, 2
       |), cm AS MATERIALIZED (
       |  SELECT j, k, CAST(ma.n * cr.sjk - ma.s1 * mb.s1 AS BIGINT) AS c
       |  FROM cr JOIN mo ma ON ma.i = cr.j JOIN mo mb ON mb.i = cr.k
       |), v0 AS MATERIALIZED (
       |  SELECT unnest(range(1, 65)) AS j, CAST(1.0 AS DOUBLE) AS s
       |), $steps""".stripMargin
  }

  /** Link-prediction replay: the mutual-top-7 edge chain, a wedge join
    * on the centre with a < b, integer floor-divided RA weights summed
    * per candidate pair, then the anti-join against existing edges —
    * every score exact integer arithmetic (`//` mirrors Spark's `div`).
    */
  private val LinkpredTradeOracleSql: String =
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT c_nationkey AS src, s_nationkey AS dst,
       |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
       |        * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
       |      AS w
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  WHERE c_nationkey <> s_nationkey
       |  GROUP BY 1, 2
       |), top AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC)
       |        AS rn
       |    FROM e0)
       |  WHERE rn <= 7
       |), r0 AS MATERIALIZED (
       |  SELECT a.src, a.dst FROM top a
       |  JOIN top b ON a.src = b.dst AND a.dst = b.src
       |), deg AS (
       |  SELECT src, count(*) AS deg FROM r0 GROUP BY 1
       |), sc AS (
       |  SELECT e1.src AS a, e2.dst AS b,
       |    count(*) AS common_neighbors,
       |    CAST(sum(1000000000000 // d.deg) AS BIGINT) AS ra_scaled
       |  FROM r0 e1
       |  JOIN r0 e2 ON e1.dst = e2.src
       |  JOIN deg d ON d.src = e1.dst
       |  WHERE e1.src < e2.dst
       |  GROUP BY 1, 2
       |), pred AS (
       |  SELECT sc.a, sc.b, sc.common_neighbors, sc.ra_scaled
       |  FROM sc LEFT JOIN r0 e ON e.src = sc.a AND e.dst = sc.b
       |  WHERE e.src IS NULL
       |)
       |SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
       |  common_neighbors, ra_scaled
       |FROM pred
       |JOIN nation na ON na.n_nationkey = a
       |JOIN nation nb ON nb.n_nationkey = b""".stripMargin

  private val KcoreTradeOracleSql: String = {
    val k = 4
    val rounds = (1 to 26).map { i =>
      val prev = s"r${i - 1}"
      s"""s$i AS MATERIALIZED (
         |  SELECT src AS node FROM $prev GROUP BY src HAVING count(*) >= $k
         |), r$i AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM $prev e
         |  WHERE e.src IN (SELECT node FROM s$i)
         |    AND e.dst IN (SELECT node FROM s$i)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT c_nationkey AS src, s_nationkey AS dst,
       |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
       |        * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
       |      AS w
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  WHERE c_nationkey <> s_nationkey
       |  GROUP BY 1, 2
       |), top AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC)
       |        AS rn
       |    FROM e0)
       |  WHERE rn <= 7
       |), r0 AS MATERIALIZED (
       |  SELECT a.src, a.dst FROM top a
       |  JOIN top b ON a.src = b.dst AND a.dst = b.src
       |), $rounds
       |SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS core_degree
       |FROM r26 JOIN nation ON n_nationkey = src
       |GROUP BY 1""".stripMargin
  }

  /** The LPA replay: the same mutual-top-7 edge chain as the k-core
    * oracle, then 4 unrolled synchronous rounds — neighbor votes UNION
    * ALL one self-vote, argmax by (count DESC, label ASC). Every step
    * is integer counting over a 25-node digest; nothing to round.
    */
  /** Kaplan-Meier replay: per-user spans, censor rule, at-risk reverse
    * cumsum, then the product ITERATION-SHAPED (one recursive row per
    * duration; 1.0·x = x in IEEE so the first row skips the multiply).
    * Shared verbatim by the one-shot gate and the incremental fold,
    * which must converge to it.
    */
  /** The GARCH recurrence replay — shared by the one-shot gate and
    * the order-dependent incremental, which must equal it.
    */
  private val GarchVolOracleSql: String =
    s"""WITH RECURSIVE $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), chn AS (
         |  SELECT ccy_couple, date, CAST(chg * 1000 AS BIGINT) AS chg_u
         |  FROM ch WHERE chg IS NOT NULL
         |), g AS (
         |  SELECT ccy_couple, date, chg_u,
         |    row_number() OVER (PARTITION BY ccy_couple ORDER BY date) AS rn
         |  FROM chn
         |), nn AS (
         |  SELECT ccy_couple, CAST(max(rn) AS BIGINT) AS n FROM g GROUP BY 1
         |), rec AS (
         |  SELECT ccy_couple, 0 AS rn, CAST(20000.0 AS DOUBLE) AS s,
         |    CAST(NULL AS DOUBLE) AS pk, CAST(NULL AS DATE) AS pd
         |  FROM nn
         |  UNION ALL
         |  SELECT ccy_couple, rn, s2 AS s,
         |    CASE WHEN pk IS NULL OR s2 > pk THEN s2 ELSE pk END AS pk,
         |    CASE WHEN pk IS NULL OR s2 > pk THEN date ELSE pd END AS pd
         |  FROM (
         |    SELECT rec.ccy_couple, g.rn, g.date, rec.pk, rec.pd,
         |      1000.0 + 0.1 * (CAST(g.chg_u AS DOUBLE)
         |                      * CAST(g.chg_u AS DOUBLE))
         |        + 0.85 * rec.s AS s2
         |    FROM rec JOIN g ON g.ccy_couple = rec.ccy_couple
         |                   AND g.rn = rec.rn + 1
         |  )
         |)
         |SELECT r.ccy_couple, nn.n AS n_days, r.s AS sigma2_forecast,
         |  r.pk AS sigma2_peak, r.pd AS peak_date
         |FROM rec r JOIN nn ON nn.ccy_couple = r.ccy_couple
         |WHERE r.rn = nn.n""".stripMargin

  private val SurvivalKmOracleSql: String =
    """WITH RECURSIVE u AS (
      |  SELECT user_id, CAST(min(ts) AS DATE) AS f,
      |         CAST(max(ts) AS DATE) AS l
      |  FROM events GROUP BY 1
      |), g AS (SELECT max(l) AS mx FROM u),
      |du AS (
      |  SELECT date_diff('day', f, l) AS t,
      |    CASE WHEN l <= mx - 1 THEN 1 ELSE 0 END AS ev
      |  FROM u, g
      |), ag AS (
      |  SELECT t, CAST(sum(ev) AS BIGINT) AS d,
      |    CAST(count(*) - sum(ev) AS BIGINT) AS c
      |  FROM du GROUP BY t
      |), rk AS (
      |  SELECT t, d, c,
      |    CAST(sum(d + c) OVER (ORDER BY t DESC) AS BIGINT) AS n,
      |    row_number() OVER (ORDER BY t ASC) AS rn
      |  FROM ag
      |), km AS (
      |  SELECT rn, t, d, c, n,
      |    CASE WHEN d > 0
      |         THEN 1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
      |         ELSE CAST(1.0 AS DOUBLE) END AS s
      |  FROM rk WHERE rn = 1
      |  UNION ALL
      |  SELECT rk.rn, rk.t, rk.d, rk.c, rk.n,
      |    CASE WHEN rk.d > 0
      |         THEN km.s * (1.0 - CAST(rk.d AS DOUBLE)
      |                          / CAST(rk.n AS DOUBLE))
      |         ELSE km.s END
      |  FROM km JOIN rk ON rk.rn = km.rn + 1
      |)
      |SELECT CAST(t AS BIGINT) AS duration_days, n AS n_risk,
      |  d AS n_events, c AS n_censored, s AS survival
      |FROM km""".stripMargin

  /** TextRank replay: chunk lists, banded overlap edges, per-doc
    * teleport, five unrolled rounds with the ordered list_reduce fold —
    * the PagerankTradeOracleSql devices keyed by (doc_id, node).
    */
  private val TextRankOracleSql: String = {
    val iters = 5
    val steps = (1 to iters).map { i =>
      val prev = s"p${i - 1}"
      s"""c$i AS (
         |  SELECT r.doc_id, r.dst,
         |    list_reduce(list_prepend(0.0, list(p.pr * r.ratio ORDER BY r.src)),
         |                (a, b) -> a + b) AS m
         |  FROM r JOIN $prev p ON p.doc_id = r.doc_id AND p.node = r.src
         |  GROUP BY 1, 2
         |), p$i AS MATERIALIZED (
         |  SELECT nodes.doc_id, nodes.node,
         |    0.15 / nodes.n + 0.85 * coalesce(c$i.m, 0.0) AS pr
         |  FROM nodes LEFT JOIN c$i
         |    ON c$i.doc_id = nodes.doc_id AND c$i.dst = nodes.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH wd AS (
       |  SELECT doc_id, unnest(ws) AS w, unnest(range(len(ws))) AS p
       |  FROM (SELECT doc_id,
       |          string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
       |            AS ws
       |        FROM documents)
       |), ch AS MATERIALIZED (
       |  SELECT doc_id, CAST(p // 8 AS INT) AS idx,
       |    list_sort(list_distinct(list(w))) AS ws
       |  FROM wd GROUP BY 1, 2
       |), ed AS MATERIALIZED (
       |  SELECT a.doc_id, a.idx AS src, b.idx AS dst,
       |    CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS w
       |  FROM ch a JOIN ch b ON a.doc_id = b.doc_id AND a.idx <> b.idx
       |    AND abs(a.idx - b.idx) <= 3
       |  WHERE len(list_intersect(a.ws, b.ws)) > 0
       |), nd AS (
       |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS n FROM ch GROUP BY 1
       |), nodes AS MATERIALIZED (
       |  SELECT ch.doc_id, ch.idx AS node, nd.n FROM ch JOIN nd USING (doc_id)
       |), wo AS (
       |  SELECT doc_id, src, sum(w) AS wout FROM ed GROUP BY 1, 2
       |), r AS MATERIALIZED (
       |  SELECT ed.doc_id, ed.src, ed.dst,
       |    CAST(ed.w AS DOUBLE) / CAST(wo.wout AS DOUBLE) AS ratio
       |  FROM ed JOIN wo ON wo.doc_id = ed.doc_id AND wo.src = ed.src
       |), p0 AS (
       |  SELECT doc_id, node, 1.0 / n AS pr FROM nodes
       |), $steps
       |SELECT doc_id, CAST(node AS BIGINT) AS chunk_idx,
       |  CAST(rn AS BIGINT) AS rank, pr
       |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |        ORDER BY round(pr, 6) DESC, node ASC) AS rn
       |      FROM p$iters)
       |WHERE rn <= 2""".stripMargin
  }

  private val LpaTradeOracleSql: String = {
    val rounds = (1 to 4).map { i =>
      val prev = s"l${i - 1}"
      s"""v$i AS (
         |  SELECT node, lbl, count(*) AS c FROM (
         |    SELECT e.dst AS node, l.lbl FROM r0 e JOIN $prev l
         |      ON l.node = e.src
         |    UNION ALL SELECT node, lbl FROM $prev
         |  ) GROUP BY node, lbl
         |), l$i AS MATERIALIZED (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl, row_number() OVER (
         |      PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
         |    FROM v$i)
         |  WHERE rn = 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT c_nationkey AS src, s_nationkey AS dst,
       |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
       |        * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
       |      AS w
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  WHERE c_nationkey <> s_nationkey
       |  GROUP BY 1, 2
       |), top AS MATERIALIZED (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY w DESC, dst ASC)
       |        AS rn
       |    FROM e0)
       |  WHERE rn <= 7
       |), r0 AS MATERIALIZED (
       |  SELECT a.src, a.dst FROM top a
       |  JOIN top b ON a.src = b.dst AND a.dst = b.src
       |), l0 AS (
       |  SELECT DISTINCT src AS node, src AS lbl FROM r0
       |), $rounds
       |SELECT na.n_name AS nation, nb.n_name AS community_leader
       |FROM l4
       |JOIN nation na ON na.n_nationkey = l4.node
       |JOIN nation nb ON nb.n_nationkey = l4.lbl""".stripMargin
  }

  /** The unrolled MMR greedy rounds over CTEs `cands` (vec_id, rel)
    * and `pr` (a, b, sim): sel0 is the typed empty relation, each round
    * excludes the picked set, scores remaining candidates by
    * λ·rel − (1−λ)·max-sim-to-selected (empty-set term 0), and picks
    * the (mmr DESC, vec_id ASC) argmax — identical operands to the
    * engine's round, so the doubles agree bitwise. Shared by the
    * cosine-relevance gate and the RAG composition.
    */
  private def MmrRoundsSql(k: Int): String = {
    val steps = (1 to k).map { i =>
      val prev = s"sel${i - 1}"
      s"""m$i AS (
         |  SELECT c.vec_id,
         |    CAST(0.5 AS DOUBLE) * c.rel - CAST(0.5 AS DOUBLE) * coalesce(
         |      (SELECT max(p.sim) FROM pr p JOIN $prev s ON p.b = s.vec_id
         |       WHERE p.a = c.vec_id), CAST(0.0 AS DOUBLE)) AS mmr
         |  FROM cands c
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM $prev)
         |), p$i AS (
         |  SELECT vec_id, mmr FROM m$i ORDER BY mmr DESC, vec_id ASC LIMIT 1
         |), sel$i AS MATERIALIZED (
         |  SELECT * FROM $prev
         |  UNION ALL SELECT vec_id, CAST($i AS BIGINT) AS step, mmr FROM p$i
         |)""".stripMargin
    }.mkString(", ")
    s"""sel0 AS (
       |  SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS BIGINT) AS step,
       |    CAST(NULL AS DOUBLE) AS mmr WHERE 1 = 0
       |), $steps""".stripMargin
  }

  /** Pairwise candidate cosines CTE (`pr`) over whatever `cands` holds. */
  private val MmrPairCtes: String =
    """cv AS MATERIALIZED (
      |  SELECT c.vec_id, CAST(e.embedding AS DOUBLE[]) AS ee
      |  FROM cands c JOIN embeddings e USING (vec_id)
      |), pr AS MATERIALIZED (
      |  SELECT x.vec_id AS a, y.vec_id AS b,
      |    round(list_dot_product(x.ee, y.ee)
      |          / sqrt(list_dot_product(x.ee, x.ee)
      |                 * list_dot_product(y.ee, y.ee)), 6) AS sim
      |  FROM cv x, cv y WHERE x.vec_id <> y.vec_id
      |)""".stripMargin

  private val SimMmrOracleSql: String =
    s"""WITH q AS (
       |  SELECT CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id = 0
       |), cands AS MATERIALIZED (
       |  SELECT vec_id, cos_sim AS rel FROM (
       |    SELECT vec_id, cos_sim,
       |      row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank
       |    FROM (
       |      SELECT vec_id,
       |        round(list_dot_product(qe, ee)
       |              / sqrt(list_dot_product(qe, qe)
       |                     * list_dot_product(ee, ee)), 6) AS cos_sim
       |      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee
       |            FROM embeddings WHERE vec_id <> 0), q))
       |  WHERE rank <= 50
       |), $MmrPairCtes, ${MmrRoundsSql(10)}
       |SELECT step, vec_id, mmr FROM sel10""".stripMargin

  /** The hybrid-fusion CTE chain ending in `fused` (doc_id, lex_rank,
    * dense_rank, rrf, rnk) — shared by the fusion gate and the RAG
    * composition.
    */
  private val HybridRrfCtes: String =
    """tok AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, token, count(*) AS tf
      |  FROM tok WHERE length(token) > 0 GROUP BY doc_id, token
      |), dfq AS (
      |  SELECT token, count(*) AS df FROM tf
      |  WHERE token IN ('hash', 'join', 'stream') GROUP BY token
      |), dl AS (
      |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
      |), tot AS (
      |  SELECT CAST(sum(tf) AS DOUBLE) / CAST(count(DISTINCT doc_id) AS DOUBLE)
      |    AS avgdl, count(DISTINCT doc_id) AS n_docs FROM tf
      |), scored AS (
      |  SELECT t.doc_id, t.token,
      |    ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
      |       / (CAST(df AS DOUBLE) + 0.5))
      |      * (CAST(t.tf AS DOUBLE) * 2.2)
      |      / (CAST(t.tf AS DOUBLE)
      |         + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl))
      |      AS contrib
      |  FROM tf t JOIN dfq USING (token) JOIN dl ON t.doc_id = dl.doc_id, tot
      |), agged AS (
      |  SELECT doc_id,
      |    max(contrib) FILTER (WHERE token = 'hash') AS c0,
      |    max(contrib) FILTER (WHERE token = 'join') AS c1,
      |    max(contrib) FILTER (WHERE token = 'stream') AS c2
      |  FROM scored GROUP BY doc_id
      |), lex AS (
      |  SELECT doc_id, CAST(rn AS BIGINT) AS lex_rank FROM (
      |    SELECT doc_id, row_number() OVER (ORDER BY
      |      round(coalesce(c0, 0.0) + coalesce(c1, 0.0) + coalesce(c2, 0.0), 6)
      |        DESC, doc_id ASC) AS rn
      |    FROM agged)
      |  WHERE rn <= 50
      |), q AS (
      |  SELECT CAST(embedding AS DOUBLE[]) AS qe
      |  FROM embeddings WHERE vec_id = 0
      |), den AS (
      |  SELECT doc_id, CAST(rn AS BIGINT) AS dense_rank FROM (
      |    SELECT vec_id AS doc_id, row_number() OVER (ORDER BY
      |      round(list_dot_product(qe, ee)
      |            / sqrt(list_dot_product(qe, qe) * list_dot_product(ee, ee)),
      |            6) DESC, vec_id ASC) AS rn
      |    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee
      |          FROM embeddings WHERE vec_id <> 0), q)
      |  WHERE rn <= 50
      |), fused AS MATERIALIZED (
      |  SELECT doc_id, lex_rank, dense_rank, rrf,
      |    row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rnk
      |  FROM (
      |    SELECT doc_id, lex_rank, dense_rank,
      |      coalesce(CAST(1.0 AS DOUBLE) / (60 + lex_rank),
      |               CAST(0.0 AS DOUBLE))
      |        + coalesce(CAST(1.0 AS DOUBLE) / (60 + dense_rank),
      |                   CAST(0.0 AS DOUBLE)) AS rrf
      |    FROM lex FULL OUTER JOIN den USING (doc_id))
      |)""".stripMargin

  /** The composed RAG oracle: fusion CTEs → MMR rounds over the fused
    * top-20 (relevance = rrf, so no extra rounding is needed — the
    * fusion score is already two exact divisions) → running token sum
    * in pick order with the inclusion cut.
    */
  private val CurRagContextOracleSql: String =
    s"""WITH $HybridRrfCtes, cands AS MATERIALIZED (
       |  SELECT doc_id AS vec_id, rrf AS rel FROM fused WHERE rnk <= 20
       |), $MmrPairCtes, ${MmrRoundsSql(8)},
       |tokc AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents
       |)
       |SELECT s.vec_id AS doc_id, s.step, s.mmr, tokc.n_tokens,
       |  CAST(sum(tokc.n_tokens) OVER (ORDER BY s.step) AS BIGINT)
       |    AS cum_tokens,
       |  CAST(sum(tokc.n_tokens) OVER (ORDER BY s.step) AS BIGINT) <= 512
       |    AS included
       |FROM sel8 s JOIN tokc ON tokc.doc_id = s.vec_id""".stripMargin

  private val PagerankTradeOracleSql: String = {
    val iters = 5
    val steps = (1 to iters).map { i =>
      val prev = s"p${i - 1}"
      s"""c$i AS (
         |  SELECT r.dst,
         |    list_reduce(list_prepend(0.0, list(p.pr * r.ratio ORDER BY r.src)),
         |                (a, b) -> a + b) AS m
         |  FROM r JOIN $prev p ON p.node = r.src GROUP BY r.dst
         |), p$i AS (
         |  SELECT nodes.node, 0.15 / n + 0.85 * coalesce(c$i.m, 0.0) AS pr
         |  FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.node, nn
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e AS (
       |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
       |    sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
       |        * (CAST(1.0 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
       |      AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2
       |), wo AS (SELECT src, sum(w) AS wout FROM e GROUP BY 1),
       |r AS (
       |  SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(wo.wout AS DOUBLE) AS ratio
       |  FROM e JOIN wo ON e.src = wo.src
       |),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |p0 AS (SELECT node, 1.0 / n AS pr FROM nodes, nn),
       |$steps
       |SELECT n_name AS nation, pr
       |FROM p$iters JOIN nation ON n_nationkey = p$iters.node""".stripMargin
  }

  /** The exact trigram-Jaccard >= 0.8 pair relation (a < b) the recall
    * oracles anchor on — spliced into XxhOracleSql's candidate replays,
    * which recompute the TRUE missed-pair count rather than asserting a
    * literal zero: bucket collision is probabilistic (a Jaccard-0.8 pair
    * can sit at simhash Hamming 9 and share no 16-bit chunk — observed
    * at sf0.1), so the gate MEASURES recall identically on both engines
    * at any scale. The zero-violation property itself stays pinned at
    * spec scale in NearDupScaleSpec.
    */
  private val ExactPairsSelect =
    """SELECT a.doc_id AS a, b.doc_id AS b
      |FROM db a JOIN db b ON a.lang = b.lang AND a.source = b.source
      |                   AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.8""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = checkedMap(

    "fx_active_rates" ->
      s"""WITH $RatesCte, $ActiveCte
         |SELECT event_id, ccy_couple, rate, event_time FROM active""".stripMargin,

    "fx_latest_per_pair" ->
      s"""WITH $RatesCte, $ActiveCte, $LatestCte
         |SELECT ccy_couple, current_rate, current_event_time FROM latest""".stripMargin,

    "fx_grouped_max" ->
      s"""WITH $RatesCte
         |SELECT ccy_couple, max(event_time) AS max_event_time,
         |       max_by(rate, event_time) AS rate_at_max
         |FROM rates WHERE date <= $CutoffSql GROUP BY ccy_couple""".stripMargin,

    "fx_previous_rates" ->
      s"""WITH $RatesCte, $PrevCte
         |SELECT ccy_couple, previous_rate, previous_event_time FROM prev""".stripMargin,

    "fx_previous_rates_subq" ->
      s"""WITH $RatesCte, lr AS (
         |  SELECT ccy_couple, MAX(event_time) AS max_event_time
         |  FROM rates WHERE date <= $CutoffSql GROUP BY ccy_couple
         |)
         |SELECT e1.ccy_couple, e1.rate AS previous_rate,
         |       e1.event_time AS previous_event_time
         |FROM rates e1
         |JOIN lr ON e1.ccy_couple = lr.ccy_couple
         |       AND e1.event_time < lr.max_event_time
         |WHERE e1.event_time = (
         |  SELECT MAX(e2.event_time) FROM rates e2
         |  WHERE e2.ccy_couple = e1.ccy_couple
         |    AND e2.event_time < lr.max_event_time)""".stripMargin,

    "fx_report_b" ->
      s"""WITH $RatesCte, $ActiveCte, $LatestCte, $PrevCte
         |SELECT l.ccy_couple, l.current_rate, $PctSql AS rate_change
         |FROM latest l JOIN prev p USING (ccy_couple)""".stripMargin,

    "fx_report_b_sql" ->
      s"""WITH $RatesCte, $ActiveCte, $LatestCte, $PrevCte
         |SELECT l.ccy_couple, l.current_rate, $PctSql AS rate_change
         |FROM latest l JOIN prev p USING (ccy_couple)""".stripMargin,

    "fx_report_a" ->
      s"""WITH $RatesCte, $ActiveCte, $LatestCte, $PrevCte,
         |latest2 AS (
         |  SELECT ccy_couple, max(current_rate) AS current_rate,
         |         max(current_event_time) AS current_event_time
         |  FROM latest GROUP BY ccy_couple
         |),
         |prev2 AS (
         |  SELECT ccy_couple, max(previous_rate) AS previous_rate,
         |         max(previous_event_time) AS previous_event_time
         |  FROM prev GROUP BY ccy_couple
         |)
         |SELECT l.ccy_couple, l.current_rate, $PctSql AS rate_change
         |FROM latest2 l LEFT JOIN prev2 p USING (ccy_couple)""".stripMargin,

    "fx_report_a_sql" ->
      s"""WITH $RatesCte, $ActiveCte, $LatestCte, $PrevCte,
         |latest2 AS (
         |  SELECT ccy_couple, max(current_rate) AS current_rate,
         |         max(current_event_time) AS current_event_time
         |  FROM latest GROUP BY ccy_couple
         |),
         |prev2 AS (
         |  SELECT ccy_couple, max(previous_rate) AS previous_rate,
         |         max(previous_event_time) AS previous_event_time
         |  FROM prev GROUP BY ccy_couple
         |)
         |SELECT l.ccy_couple, l.current_rate, $PctSql AS rate_change
         |FROM latest2 l LEFT JOIN prev2 p USING (ccy_couple)""".stripMargin,

    // the Task B report CTE, then the byte-exact fixed-width render
    "fx_report_golden" -> goldenLinesSql(
      s"""WITH $RatesCte, $ActiveCte, $LatestCte, $PrevCte,
         |rep AS (
         |  SELECT l.ccy_couple, l.current_rate, $PctSql AS rate_change
         |  FROM latest l JOIN prev p USING (ccy_couple)
         |)""".stripMargin),

    "fx_report_golden_a" -> goldenLinesSql(
      s"""WITH $RatesCte, $ActiveCte, $LatestCte, $PrevCte,
         |latest2 AS (
         |  SELECT ccy_couple, max(current_rate) AS current_rate,
         |         max(current_event_time) AS current_event_time
         |  FROM latest GROUP BY ccy_couple
         |),
         |prev2 AS (
         |  SELECT ccy_couple, max(previous_rate) AS previous_rate,
         |         max(previous_event_time) AS previous_event_time
         |  FROM prev GROUP BY ccy_couple
         |),
         |rep AS (
         |  SELECT l.ccy_couple, l.current_rate, $PctSql AS rate_change
         |  FROM latest2 l LEFT JOIN prev2 p USING (ccy_couple)
         |)""".stripMargin),

    "fx_upsert_latest" ->
      s"""WITH $RatesCte
         |SELECT ccy_couple, date, rate, event_time
         |FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |        ORDER BY "timestamp" DESC, event_id DESC) AS rn FROM rates)
         |WHERE rn = 1""".stripMargin,

    "fx_ohlc_bars" -> OhlcOracleSql,

    // last-per-slot replay: integer slot division + rn=1 desc keeper
    "fx_conflate" ->
      s"""WITH $RatesCte, w AS (
         |  SELECT ccy_couple, event_time // 21600000000 AS slot, event_id,
         |    event_time, rate,
         |    row_number() OVER (PARTITION BY ccy_couple,
         |        event_time // 21600000000
         |      ORDER BY event_time DESC, event_id DESC) AS rn
         |  FROM rates
         |)
         |SELECT ccy_couple, slot, event_id, event_time, rate
         |FROM w WHERE rn = 1""".stripMargin,

    // the OHLC digest + lag window, then the identical comparison trees
    "fx_candle_patterns" ->
      s"""WITH $RatesCte, w AS (
         |  SELECT ccy_couple, date, rate,
         |    row_number() OVER (PARTITION BY ccy_couple, date
         |      ORDER BY event_time ASC, event_id ASC) AS rn_a,
         |    row_number() OVER (PARTITION BY ccy_couple, date
         |      ORDER BY event_time DESC, event_id DESC) AS rn_d
         |  FROM rates
         |), ohlc AS (
         |  SELECT ccy_couple, date,
         |    max(CASE WHEN rn_a = 1 THEN rate END) AS open,
         |    max(rate) AS high, min(rate) AS low,
         |    max(CASE WHEN rn_d = 1 THEN rate END) AS close
         |  FROM w GROUP BY ccy_couple, date
         |), p AS (
         |  SELECT *,
         |    lag(open) OVER (PARTITION BY ccy_couple ORDER BY date)
         |      AS prev_open,
         |    lag(close) OVER (PARTITION BY ccy_couple ORDER BY date)
         |      AS prev_close
         |  FROM ohlc
         |)
         |SELECT ccy_couple, date, open, high, low, close,
         |  abs(close - open) <= 0.1 * (high - low) AS is_doji,
         |  coalesce(prev_close < prev_open AND close > open
         |    AND open <= prev_close AND close >= prev_open, false)
         |    AS bull_engulf,
         |  coalesce(prev_close > prev_open AND close < open
         |    AND open >= prev_close AND close <= prev_open, false)
         |    AS bear_engulf
         |FROM p""".stripMargin,

    // value-based RANGE frame replayed verbatim; the mean divides two
    // exactly-converted doubles (decimal frame sum < 2^53 in 6-dp units)
    "fx_rolling_7d" ->
      s"""WITH $RatesCte
         |SELECT ccy_couple, event_id,
         |  count(*) OVER w AS n_7d,
         |  CAST(sum(CAST(rate AS DECIMAL(18,6))) OVER w AS DOUBLE)
         |    / CAST(count(*) OVER w AS DOUBLE) AS avg_7d,
         |  max(rate) OVER w AS max_7d
         |FROM rates
         |WINDOW w AS (PARTITION BY ccy_couple ORDER BY event_time
         |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    // one IEEE division of two stored doubles — no representation risk
    "fx_cross_rates" ->
      s"""WITH $RatesCte, $ActiveCte, $LatestCte
         |SELECT a.ccy_couple AS base_ccy, b.ccy_couple AS quote_ccy,
         |  a.current_rate AS base_rate, b.current_rate AS quote_rate,
         |  a.current_rate / b.current_rate AS cross_rate
         |FROM latest a JOIN latest b ON a.ccy_couple <> b.ccy_couple""".stripMargin,

    // dwell weights replayed with the same lead window + day-end
    // close-out; decimal-exact weighted sum, double only at the boundary
    "fx_twap" ->
      s"""WITH $RatesCte, d AS (
         |  SELECT ccy_couple, date, rate,
         |    coalesce(lead(event_time) OVER (PARTITION BY ccy_couple, date
         |        ORDER BY event_time, event_id),
         |      epoch_us(CAST(date + INTERVAL 1 DAY AS TIMESTAMP)))
         |      - event_time AS dwell_us
         |  FROM rates
         |)
         |SELECT ccy_couple, date, count(*) AS n_ticks,
         |  CAST(CAST(sum(CAST(rate AS DECIMAL(18,6))
         |           * CAST(dwell_us AS DECIMAL(20,0))) AS DECIMAL(38,2))
         |       AS DOUBLE)
         |    / CAST(sum(dwell_us) AS DOUBLE) AS twap
         |FROM d GROUP BY ccy_couple, date""".stripMargin,

    // the five moments accumulate as exact UNSCALED-×1000 BIGINTs (chg
    // pinned to DECIMAL(12,3) first — half-up rescale — then ×1000 is an
    // exact integer; correlation is scale-invariant so the ×1000 series
    // has the same corr, and every moment stays below 2^53 so the
    // bigint->double casts are exact on both engines); the textbook
    // formula runs in double with the same operation tree as the Spark
    // side; zero-variance pairs -> NULL
    "fx_change_corr" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), chn AS (
         |  SELECT ccy_couple, date, CAST(chg * 1000 AS BIGINT) AS chg_u
         |  FROM ch WHERE chg IS NOT NULL
         |), m AS (
         |  SELECT a.ccy_couple AS ccy_a, b.ccy_couple AS ccy_b,
         |    count(*) AS n_days,
         |    CAST(sum(a.chg_u) AS DOUBLE) AS sx,
         |    CAST(sum(b.chg_u) AS DOUBLE) AS sy,
         |    CAST(sum(a.chg_u * b.chg_u) AS DOUBLE) AS sxy,
         |    CAST(sum(a.chg_u * a.chg_u) AS DOUBLE) AS sxx,
         |    CAST(sum(b.chg_u * b.chg_u) AS DOUBLE) AS syy
         |  FROM chn a JOIN chn b
         |    ON a.date = b.date AND a.ccy_couple < b.ccy_couple
         |  GROUP BY 1, 2
         |)
         |SELECT ccy_a, ccy_b, n_days,
         |  (CAST(n_days AS DOUBLE) * sxy - sx * sy)
         |    / sqrt(nullif(greatest(
         |        (CAST(n_days AS DOUBLE) * sxx - sx * sx)
         |        * (CAST(n_days AS DOUBLE) * syy - sy * sy), 0.0), 0.0))
         |    AS corr_chg
         |FROM m""".stripMargin,

    // OLS on exact unscaled-×1000 integer moments; the closed-form
    // solution runs on identical double operands in the same operation
    // tree as the Spark side (slope computed once, reused by intercept);
    // single-day pairs -> NULL slope/intercept, flat series -> NULL r2
    "fx_trend_ols" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), d0 AS (SELECT min(date) AS d0 FROM cl),
         |pts AS (
         |  SELECT ccy_couple,
         |    CAST(date_diff('day', d0.d0, cl.date) AS BIGINT) AS x,
         |    CAST(close * 1000 AS BIGINT) AS y
         |  FROM cl, d0
         |), m AS (
         |  SELECT ccy_couple, count(*) AS n_days,
         |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |    CAST(sum(x * y) AS DOUBLE) AS sxy,
         |    CAST(sum(x * x) AS DOUBLE) AS sxx,
         |    CAST(sum(y * y) AS DOUBLE) AS syy
         |  FROM pts GROUP BY 1
         |), s AS (
         |  SELECT ccy_couple, n_days, sx, sy,
         |    CAST(n_days AS DOUBLE) AS nd,
         |    CAST(n_days AS DOUBLE) * sxy - sx * sy AS num,
         |    CAST(n_days AS DOUBLE) * sxx - sx * sx AS den,
         |    CAST(n_days AS DOUBLE) * syy - sy * sy AS vy
         |  FROM m
         |), t AS (
         |  SELECT ccy_couple, n_days, nd, num, den, vy, sx, sy,
         |    num / nullif(den, 0.0) AS slope_milli
         |  FROM s
         |)
         |SELECT ccy_couple, n_days, slope_milli,
         |  (sy - slope_milli * sx) / nd AS intercept_milli,
         |  (num * num) / nullif(greatest(den * vy, 0.0), 0.0) AS r2
         |FROM t""".stripMargin,

    // the same close digest self-joined on common dates; the identical
    // double formula tree (beta → mean → clamped variance → z) over the
    // exact integer moments, so every rounded output is bit-equal
    "fx_pairs_spread" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), y AS (
         |  SELECT ccy_couple, date, CAST(close * 1000 AS BIGINT) AS y
         |  FROM cl
         |), m AS (
         |  SELECT a.ccy_couple AS couple_a, b.ccy_couple AS couple_b,
         |    count(*) AS n_days,
         |    CAST(count(*) AS DOUBLE) AS nd,
         |    CAST(sum(a.y) AS DOUBLE) AS sa,
         |    CAST(sum(b.y) AS DOUBLE) AS sb,
         |    CAST(sum(a.y * b.y) AS DOUBLE) AS sab,
         |    CAST(sum(a.y * a.y) AS DOUBLE) AS saa,
         |    CAST(sum(b.y * b.y) AS DOUBLE) AS sbb,
         |    CAST(arg_max(a.y, a.date) AS DOUBLE) AS ya_last,
         |    CAST(arg_max(b.y, b.date) AS DOUBLE) AS yb_last
         |  FROM y a JOIN y b ON a.date = b.date
         |  WHERE a.ccy_couple < b.ccy_couple
         |  GROUP BY 1, 2
         |), s1 AS (
         |  SELECT *,
         |    (nd * sab - sa * sb) / nullif(nd * sbb - sb * sb, 0.0) AS beta
         |  FROM m
         |), s2 AS (
         |  SELECT *, (sa - beta * sb) / nd AS mean_s FROM s1
         |), s3 AS (
         |  SELECT *,
         |    sqrt(greatest((saa - 2.0 * beta * sab + beta * beta * sbb) / nd
         |      - mean_s * mean_s, 0.0)) AS sd,
         |    ya_last - beta * yb_last AS spread_last
         |  FROM s2
         |), s4 AS (
         |  SELECT *, (spread_last - mean_s) / nullif(sd, 0.0) AS z FROM s3
         |)
         |SELECT couple_a, couple_b, n_days, round(beta, 6) AS beta,
         |  round(spread_last, 6) AS spread_last, round(z, 6) AS z_last,
         |  CASE WHEN z IS NULL THEN 'na' WHEN z > 2.0 THEN 'short_a'
         |       WHEN z < -2.0 THEN 'long_a' ELSE 'flat' END AS signal
         |FROM s4""".stripMargin,

    // lower-median BY SELECTION under the (slope, d1, d2) total order;
    // each slope one division of exact scaled integers
    "fx_theilsen" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) * 1000 AS y
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), sl AS (
         |  SELECT a.ccy_couple, a.date AS d1, b.date AS d2,
         |    CAST(b.y - a.y AS DOUBLE) / CAST(b.date - a.date AS DOUBLE)
         |      AS slope
         |  FROM cl a JOIN cl b
         |    ON a.ccy_couple = b.ccy_couple AND a.date < b.date
         |), rk AS (
         |  SELECT ccy_couple, slope,
         |    row_number() OVER (PARTITION BY ccy_couple
         |      ORDER BY slope ASC, d1 ASC, d2 ASC) AS rn,
         |    count(*) OVER (PARTITION BY ccy_couple) AS np
         |  FROM sl
         |)
         |SELECT ccy_couple, CAST(np AS BIGINT) AS n_pairs,
         |  slope AS theilsen_milli_per_day
         |FROM rk WHERE rn = (np + 1) // 2""".stripMargin,

    // median and MAD both lower-median selections over exact longs;
    // the outlier flag is pure integer comparison
    "fx_outliers_mad" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) * 1000
         |      AS BIGINT) AS y
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), med AS (
         |  SELECT ccy_couple, y AS med, CAST(nd AS BIGINT) AS n_days FROM (
         |    SELECT ccy_couple, y,
         |      row_number() OVER (PARTITION BY ccy_couple
         |        ORDER BY y ASC, date ASC) AS rn,
         |      count(*) OVER (PARTITION BY ccy_couple) AS nd
         |    FROM cl)
         |  WHERE rn = (nd + 1) // 2
         |), dev AS (
         |  SELECT cl.ccy_couple, cl.date, med.n_days, med.med,
         |    abs(cl.y - med.med) AS ad
         |  FROM cl JOIN med ON cl.ccy_couple = med.ccy_couple
         |), mad AS (
         |  SELECT ccy_couple, ad AS mad FROM (
         |    SELECT ccy_couple, ad, n_days,
         |      row_number() OVER (PARTITION BY ccy_couple
         |        ORDER BY ad ASC, date ASC) AS rn
         |    FROM dev)
         |  WHERE rn = (n_days + 1) // 2
         |)
         |SELECT dev.ccy_couple, CAST(dev.n_days AS BIGINT) AS n_days,
         |  CAST(dev.med AS BIGINT) AS med_milli,
         |  CAST(mad.mad AS BIGINT) AS mad_milli,
         |  CAST(sum(CASE WHEN dev.ad > 3 * mad.mad THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_outliers
         |FROM dev JOIN mad ON dev.ccy_couple = mad.ccy_couple
         |GROUP BY 1, 2, 3, 4""".stripMargin,

    // the DTW recurrence replayed with nested list folds (prepend-init
    // trick: the fold's first element is the init row / empty row, each
    // later element a one-int list carrying the loop index) — pure
    // BIGINT arithmetic, so any evaluation order is exact
    "fx_dtw_pairs" ->
      s"""WITH $RatesCte, $DtwSeqCtes, anc AS (
         |  SELECT ccy_couple AS anchor_ccy, v AS a
         |  FROM seq ORDER BY ccy_couple LIMIT 1
         |), base AS (
         |  SELECT s.ccy_couple, anc.anchor_ccy, s.v AS v, anc.a AS a
         |  FROM seq s, anc
         |), ${dtwDpCte("ccy_couple, anchor_ccy, v")}
         |SELECT ccy_couple, anchor_ccy, CAST(len(v) AS BIGINT) AS n_changes,
         |  $DtwFinalSql AS dtw_milli
         |FROM dp""".stripMargin,

    // the same DP replay per SURVIVING EDGE of the mutual-top-3
    // co-sign-agreement graph (the k-core sparsification recipe) — the
    // weight join runs on the |pairs|×|days| change digest
    "fx_dtw_graph" ->
      s"""WITH $RatesCte, $DtwSeqCtes, $CoSignGraphCtes, mut AS (
         |  SELECT src, dst FROM mutall WHERE src < dst
         |), base AS (
         |  SELECT m.src, m.dst, sa.v AS a, sv.v AS v
         |  FROM mut m JOIN seq sa ON sa.ccy_couple = m.src
         |             JOIN seq sv ON sv.ccy_couple = m.dst
         |), ${dtwDpCte("src, dst, a, v")}
         |SELECT src AS src_ccy, dst AS dst_ccy,
         |  CAST(len(a) AS BIGINT) AS n_src, CAST(len(v) AS BIGINT) AS n_dst,
         |  $DtwFinalSql AS dtw_milli
         |FROM dp""".stripMargin,

    // the ten lag-1 moments DEFINITIONALLY (triple join on date and
    // date−1, HUGEINT sums cast back to BIGINT), then the engine's exact
    // RSS/Cramer double trees — operand order mirrored term for term
    "fx_granger_pairs" ->
      s"""WITH $RatesCte, $DtwSeqCtes, $CoSignGraphCtes, g AS (
         |  SELECT m.src, m.dst, yt.chg_u AS u, yl.chg_u AS v, xl.chg_u AS w
         |  FROM mutall m
         |  JOIN chn yt ON yt.ccy_couple = m.dst
         |  JOIN chn yl ON yl.ccy_couple = m.dst AND yl.date = yt.date - 1
         |  JOIN chn xl ON xl.ccy_couple = m.src AND xl.date = yt.date - 1
         |), mo AS (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(u) AS BIGINT) AS su, CAST(sum(v) AS BIGINT) AS sv,
         |    CAST(sum(w) AS BIGINT) AS sw,
         |    CAST(sum(u * u) AS BIGINT) AS suu,
         |    CAST(sum(v * v) AS BIGINT) AS svv,
         |    CAST(sum(w * w) AS BIGINT) AS sww,
         |    CAST(sum(u * v) AS BIGINT) AS suv,
         |    CAST(sum(u * w) AS BIGINT) AS suw,
         |    CAST(sum(v * w) AS BIGINT) AS svw
         |  FROM g GROUP BY 1, 2
         |), cc AS (
         |  SELECT src, dst, n,
         |    CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
         |      - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) AS cuu,
         |    CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
         |      - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) AS cvv,
         |    CAST(n AS DOUBLE) * CAST(sww AS DOUBLE)
         |      - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) AS cww,
         |    CAST(n AS DOUBLE) * CAST(suv AS DOUBLE)
         |      - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE) AS cuv,
         |    CAST(n AS DOUBLE) * CAST(suw AS DOUBLE)
         |      - CAST(su AS DOUBLE) * CAST(sw AS DOUBLE) AS cuw,
         |    CAST(n AS DOUBLE) * CAST(svw AS DOUBLE)
         |      - CAST(sv AS DOUBLE) * CAST(sw AS DOUBLE) AS cvw
         |  FROM mo
         |), rr AS (
         |  SELECT *, cuu - cuv * cuv / cvv AS rss_r,
         |    cvv * cww - cvw * cvw AS det
         |  FROM cc
         |), ru AS (
         |  SELECT *, cuu - (cww * cuv * cuv - 2.0 * cvw * cuv * cuw
         |    + cvv * cuw * cuw) / det AS rss_f
         |  FROM rr
         |)
         |SELECT src AS src_ccy, dst AS dst_ccy, n AS n_obs,
         |  CASE WHEN n < 4 OR cvv <= 0 OR det <= 0 OR rss_f <= 0 THEN NULL
         |       ELSE (rss_r - rss_f) * (CAST(n AS DOUBLE) - 3.0) / rss_f
         |  END AS f_stat
         |FROM ru""".stripMargin,

    // per-lag date-offset joins (the shifted-vector replay), the
    // fx_change_corr tree, then the round-to-6dp |corr| argmax
    "fx_leadlag_pairs" ->
      s"""WITH $RatesCte, $DtwSeqCtes, $CoSignGraphCtes, lagged AS (
         |  SELECT m.src, m.dst, l.lag, count(*) AS n,
         |    CAST(sum(y.chg_u) AS DOUBLE) AS sx,
         |    CAST(sum(x.chg_u) AS DOUBLE) AS sy,
         |    CAST(sum(y.chg_u * x.chg_u) AS DOUBLE) AS sxy,
         |    CAST(sum(y.chg_u * y.chg_u) AS DOUBLE) AS sxx,
         |    CAST(sum(x.chg_u * x.chg_u) AS DOUBLE) AS syy
         |  FROM mutall m
         |  CROSS JOIN (SELECT unnest(range(0, 4)) AS lag) l
         |  JOIN chn y ON y.ccy_couple = m.dst
         |  JOIN chn x ON x.ccy_couple = m.src
         |    AND x.date = y.date - CAST(l.lag AS INTEGER)
         |  GROUP BY 1, 2, 3
         |), cr AS (
         |  SELECT src, dst, lag, n,
         |    (CAST(n AS DOUBLE) * sxy - sx * sy)
         |      / sqrt(nullif(greatest(
         |          (CAST(n AS DOUBLE) * sxx - sx * sx)
         |          * (CAST(n AS DOUBLE) * syy - sy * sy), 0.0), 0.0)) AS corr
         |  FROM lagged
         |), rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY src, dst
         |    ORDER BY round(abs(corr), 6) DESC NULLS LAST, lag ASC) AS rn
         |  FROM cr
         |)
         |SELECT src AS src_ccy, dst AS dst_ccy,
         |  CAST(lag AS BIGINT) AS best_lag, CAST(n AS BIGINT) AS n_obs,
         |  corr AS corr_best
         |FROM rk WHERE rn = 1""".stripMargin,

    // the zigzag leg fold replayed as a RECURSIVE CTE: one state row per
    // (pair, step), each recursion row carrying AT MOST ONE emitted
    // pivot — a list-valued accumulator inside DuckDB list_reduce
    // segfaults at ~80 pairs, so the fold-with-collection shape is
    // replayed as iteration-with-emission instead
    "fx_zigzag" -> ZigzagOracleSql,

    // the maintained frontier report must reproduce the one-shot fold
    "stream_zigzag_incremental" -> ZigzagOracleSql,

    // isodow(date)=1 mirrors weekday(date)=0; identical conditional
    // HUGEINT moments and the one Welch double tree
    "fx_monday_effect" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), chn AS (
         |  SELECT ccy_couple, CAST(chg * 1000 AS BIGINT) AS x,
         |    isodow(date) = 1 AS is_mon
         |  FROM ch WHERE chg IS NOT NULL
         |), mo AS (
         |  SELECT ccy_couple,
         |    CAST(sum(CASE WHEN is_mon THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN is_mon THEN x ELSE 0 END) AS BIGINT) AS s1,
         |    CAST(sum(CASE WHEN is_mon THEN x * x ELSE 0 END) AS BIGINT)
         |      AS q1,
         |    CAST(sum(CASE WHEN is_mon THEN 0 ELSE 1 END) AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN is_mon THEN 0 ELSE x END) AS BIGINT) AS s2,
         |    CAST(sum(CASE WHEN is_mon THEN 0 ELSE x * x END) AS BIGINT)
         |      AS q2
         |  FROM chn GROUP BY 1
         |  HAVING n1 >= 3 AND n2 >= 10
         |), z AS (
         |  SELECT ccy_couple, n1, n2,
         |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
         |      - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS md,
         |    (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
         |       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
         |      / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
         |      / CAST(n1 AS DOUBLE)
         |    + (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE)
         |       - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
         |      / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
         |      / CAST(n2 AS DOUBLE) AS se2
         |  FROM mo
         |)
         |SELECT ccy_couple, n1 AS n_monday, n2 AS n_rest,
         |  md AS mean_diff_milli,
         |  CASE WHEN se2 = 0.0 THEN NULL ELSE md * md / se2 END AS t_sq,
         |  CASE WHEN se2 = 0.0 THEN NULL
         |       ELSE md * md / se2 > 3.8416 END AS monday_differs
         |FROM z""".stripMargin,

    // the same close digest, date-offset self-joins, per-day tercile
    // windows and exact basket sums; spread = the two divisions
    "fx_xs_momentum" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), cu AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(close AS DECIMAL(12,3)) * 1000 AS BIGINT) AS cu
         |  FROM cl
         |), sg AS (
         |  SELECT a.ccy_couple, a.date, a.cu - b.cu AS sig
         |  FROM cu a JOIN cu b ON b.ccy_couple = a.ccy_couple
         |    AND b.date = a.date - INTERVAL 5 DAY
         |), nx AS (
         |  SELECT a.ccy_couple, a.date, c.cu - a.cu AS r
         |  FROM cu a JOIN cu c ON c.ccy_couple = a.ccy_couple
         |    AND c.date = a.date + INTERVAL 1 DAY
         |), j AS (
         |  SELECT s.ccy_couple, s.date, s.sig, n.r
         |  FROM sg s JOIN nx n
         |    ON n.ccy_couple = s.ccy_couple AND n.date = s.date
         |), rk AS (
         |  SELECT date, r,
         |    row_number() OVER (PARTITION BY date
         |      ORDER BY sig DESC, ccy_couple ASC) AS rn,
         |    count(*) OVER (PARTITION BY date) AS n,
         |    count(*) OVER (PARTITION BY date) // 3 AS k
         |  FROM j
         |), agg AS (
         |  SELECT date, CAST(max(n) AS BIGINT) AS n_pairs,
         |    CAST(max(k) AS BIGINT) AS k_basket,
         |    CAST(sum(CASE WHEN rn <= k THEN r END) AS BIGINT) AS long_sum,
         |    CAST(sum(CASE WHEN rn > n - k THEN r END) AS BIGINT)
         |      AS short_sum
         |  FROM rk WHERE n >= 6 GROUP BY 1
         |)
         |SELECT date, n_pairs, k_basket, long_sum, short_sum,
         |  CAST(long_sum AS DOUBLE) / CAST(k_basket AS DOUBLE)
         |    - CAST(short_sum AS DOUBLE) / CAST(k_basket AS DOUBLE)
         |    AS ls_spread_milli
         |FROM agg""".stripMargin,

    // HUGEINT power sums + the identical central-moment identities;
    // only the closing ratios are doubles, operand-identical
    "fx_higher_moments" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), chn AS (
         |  SELECT ccy_couple, CAST(CAST(chg * 1000 AS BIGINT) AS HUGEINT) AS x
         |  FROM ch WHERE chg IS NOT NULL
         |), mo AS (
         |  SELECT ccy_couple, count(*) AS n, sum(x) AS s1,
         |    sum(x * x) AS s2, sum(x * x * x) AS s3,
         |    sum(x * x * x * x) AS s4
         |  FROM chn GROUP BY 1 HAVING count(*) >= 3
         |), cm AS (
         |  SELECT ccy_couple, n,
         |    n * s2 - s1 * s1 AS m2,
         |    n * (n * s3) - 3 * (n * s2) * s1 + 2 * (s1 * s1 * s1) AS m3,
         |    n * (n * (n * s4)) - 4 * (n * (n * s3)) * s1
         |      + 6 * ((n * s2) * (s1 * s1)) - 3 * (s1 * s1 * s1 * s1) AS m4
         |  FROM mo
         |)
         |SELECT ccy_couple, CAST(n AS BIGINT) AS n_days,
         |  CASE WHEN m2 = 0 THEN NULL ELSE
         |    (CASE WHEN m3 < 0 THEN -1.0 ELSE 1.0 END)
         |      * (CAST(CAST(m3 AS VARCHAR) AS DOUBLE)
         |         * CAST(CAST(m3 AS VARCHAR) AS DOUBLE))
         |      / (CAST(CAST(m2 AS VARCHAR) AS DOUBLE)
         |         * CAST(CAST(m2 AS VARCHAR) AS DOUBLE)
         |         * CAST(CAST(m2 AS VARCHAR) AS DOUBLE))
         |    END AS skew_g1sq_signed,
         |  CASE WHEN m2 = 0 THEN NULL ELSE
         |    CAST(CAST(m4 AS VARCHAR) AS DOUBLE)
         |      / (CAST(CAST(m2 AS VARCHAR) AS DOUBLE)
         |         * CAST(CAST(m2 AS VARCHAR) AS DOUBLE))
         |      - 3.0 END AS kurt_excess
         |FROM cm""".stripMargin,

    // identical rank/threshold windows and integer tail counts; the
    // k-th-largest threshold is tiebreak-invariant (multiset position)
    "fx_tail_dependence" ->
      s"""WITH $RatesCte, $DtwSeqCtes, $CoSignGraphCtes, mutc AS (
         |  SELECT src, dst FROM mutall WHERE src < dst
         |), ob AS (
         |  SELECT c.src, c.dst, a.date, a.chg_u AS xa, b.chg_u AS xb
         |  FROM mutc c
         |  JOIN chn a ON a.ccy_couple = c.src
         |  JOIN chn b ON b.ccy_couple = c.dst AND b.date = a.date
         |), rk AS (
         |  SELECT src, dst, xa, xb,
         |    count(*) OVER (PARTITION BY src, dst) AS n,
         |    (count(*) OVER (PARTITION BY src, dst) + 19) // 20 AS k,
         |    row_number() OVER (PARTITION BY src, dst
         |      ORDER BY xa DESC, date ASC) AS rna,
         |    row_number() OVER (PARTITION BY src, dst
         |      ORDER BY xb DESC, date ASC) AS rnb
         |  FROM ob
         |), q AS (
         |  SELECT src, dst, xa, xb, n, k,
         |    max(CASE WHEN rna = k THEN xa END)
         |      OVER (PARTITION BY src, dst) AS qa,
         |    max(CASE WHEN rnb = k THEN xb END)
         |      OVER (PARTITION BY src, dst) AS qb
         |  FROM rk
         |), agg AS (
         |  SELECT src, dst, CAST(max(n) AS BIGINT) AS n_days,
         |    CAST(max(k) AS BIGINT) AS k_tail,
         |    CAST(sum(CASE WHEN xa >= qa THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |    CAST(sum(CASE WHEN xb >= qb THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         |    CAST(sum(CASE WHEN xa >= qa AND xb >= qb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS joint
         |  FROM q GROUP BY 1, 2
         |)
         |SELECT src AS src_ccy, dst AS dst_ccy, n_days, k_tail, na, nb,
         |  joint, CAST(joint AS DOUBLE) / CAST(na AS DOUBLE) AS lambda_u
         |FROM agg""".stripMargin,

    // tie-aware doubled ranks via rank() + per-value count windows,
    // exact BIGINT rank moments, the fx_autocorr closing tree
    "fx_spearman_pairs" ->
      s"""WITH $RatesCte, $DtwSeqCtes, $CoSignGraphCtes, mutc AS (
         |  SELECT src, dst FROM mutall WHERE src < dst
         |), ob AS (
         |  SELECT c.src, c.dst, a.chg_u AS xa, b.chg_u AS xb
         |  FROM mutc c
         |  JOIN chn a ON a.ccy_couple = c.src
         |  JOIN chn b ON b.ccy_couple = c.dst AND b.date = a.date
         |), rk AS (
         |  SELECT src, dst,
         |    2 * rank() OVER (PARTITION BY src, dst ORDER BY xa)
         |      + count(*) OVER (PARTITION BY src, dst, xa) - 1 AS ra,
         |    2 * rank() OVER (PARTITION BY src, dst ORDER BY xb)
         |      + count(*) OVER (PARTITION BY src, dst, xb) - 1 AS rb
         |  FROM ob
         |), mo AS (
         |  SELECT src, dst, count(*) AS n,
         |    CAST(sum(ra) AS DOUBLE) AS sx, CAST(sum(rb) AS DOUBLE) AS sy,
         |    CAST(sum(ra * rb) AS DOUBLE) AS sxy,
         |    CAST(sum(ra * ra) AS DOUBLE) AS sxx,
         |    CAST(sum(rb * rb) AS DOUBLE) AS syy
         |  FROM rk GROUP BY 1, 2
         |)
         |SELECT src AS src_ccy, dst AS dst_ccy, CAST(n AS BIGINT) AS n_days,
         |  (CAST(n AS DOUBLE) * sxy - sx * sy)
         |    / sqrt(nullif(greatest(
         |        (CAST(n AS DOUBLE) * sxx - sx * sx)
         |        * (CAST(n AS DOUBLE) * syy - sy * sy), 0.0), 0.0))
         |    AS spearman_rho
         |FROM mo WHERE n >= 2""".stripMargin,

    // the same centered moments, then the closed-form hedge ratio with
    // a non-positive-denominator NULL guard
    "fx_minvar_pairs" ->
      s"""WITH $RatesCte, $DtwSeqCtes, $CoSignGraphCtes, mutc AS (
         |  SELECT src, dst FROM mutall WHERE src < dst
         |), mm AS (
         |  SELECT c.src, c.dst, count(*) AS n,
         |    CAST(sum(a.chg_u) AS DOUBLE) AS sx,
         |    CAST(sum(b.chg_u) AS DOUBLE) AS sy,
         |    CAST(sum(a.chg_u * b.chg_u) AS DOUBLE) AS sxy,
         |    CAST(sum(a.chg_u * a.chg_u) AS DOUBLE) AS sxx,
         |    CAST(sum(b.chg_u * b.chg_u) AS DOUBLE) AS syy
         |  FROM mutc c
         |  JOIN chn a ON a.ccy_couple = c.src
         |  JOIN chn b ON b.ccy_couple = c.dst AND b.date = a.date
         |  GROUP BY 1, 2
         |), vv AS (
         |  SELECT src, dst, n,
         |    CAST(n AS DOUBLE) * sxx - sx * sx AS va,
         |    CAST(n AS DOUBLE) * syy - sy * sy AS vb,
         |    CAST(n AS DOUBLE) * sxy - sx * sy AS cov
         |  FROM mm
         |)
         |SELECT src AS src_ccy, dst AS dst_ccy, CAST(n AS BIGINT) AS n_obs,
         |  CASE WHEN (va + vb - 2.0 * cov) <= 0 THEN NULL
         |       ELSE (vb - cov) / (va + vb - 2.0 * cov) END AS w_src
         |FROM vv""".stripMargin,

    // AR(1) β on the cumulative common-day spread via windowed integer
    // cumsum + lag (order-independent: all moments are exact BIGINT
    // sums), then the half-life power chain as a recursive CTE whose
    // running product multiplies left-to-right exactly like the
    // engine's fold — identical IEEE sequence, identical first k
    "fx_ou_halflife" ->
      s"""WITH RECURSIVE $RatesCte, $DtwSeqCtes, $CoSignGraphCtes, mutc AS (
         |  SELECT src, dst FROM mutall WHERE src < dst
         |), sd AS (
         |  SELECT c.src, c.dst, a.date, a.chg_u - b.chg_u AS d
         |  FROM mutc c
         |  JOIN chn a ON a.ccy_couple = c.src
         |  JOIN chn b ON b.ccy_couple = c.dst AND b.date = a.date
         |), cum AS (
         |  SELECT src, dst, date, d,
         |    CAST(sum(d) OVER (PARTITION BY src, dst ORDER BY date
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s,
         |    row_number() OVER (PARTITION BY src, dst ORDER BY date) AS rn
         |  FROM sd
         |), mo AS (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM (SELECT src, dst, d AS y,
         |          lag(s) OVER (PARTITION BY src, dst ORDER BY date) AS x,
         |          rn
         |        FROM cum) t
         |  WHERE rn >= 2
         |  GROUP BY 1, 2
         |), bb AS (
         |  SELECT src, dst, n,
         |    CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0
         |         THEN CAST(n * sxy - sx * sy AS DOUBLE)
         |              / CAST(n * sxx - sx * sx AS DOUBLE)
         |    END AS beta
         |  FROM mo
         |), pw AS (
         |  SELECT src, dst, 1 AS k, (1.0 + beta) AS phi, (1.0 + beta) AS p
         |  FROM bb WHERE beta < 0 AND beta > -1
         |  UNION ALL
         |  SELECT src, dst, k + 1, phi, p * phi FROM pw WHERE k < 64
         |), hl AS (
         |  SELECT src, dst, CAST(min(k) AS BIGINT) AS halflife_days
         |  FROM pw WHERE p <= 0.5 GROUP BY 1, 2
         |)
         |SELECT b.src AS src_ccy, b.dst AS dst_ccy, b.n AS n_obs, b.beta,
         |  h.halflife_days
         |FROM bb b
         |LEFT JOIN hl h ON h.src = b.src AND h.dst = b.dst""".stripMargin,

    // the DF replay: the OU moment chain + Σy², then the identical
    // double trees (num² in DOUBLE on both engines — BIGINT would wrap)
    "fx_adf_spread" ->
      s"""WITH $RatesCte, $DtwSeqCtes, $CoSignGraphCtes, mutc AS (
         |  SELECT src, dst FROM mutall WHERE src < dst
         |), sd AS (
         |  SELECT c.src, c.dst, a.date, a.chg_u - b.chg_u AS d
         |  FROM mutc c
         |  JOIN chn a ON a.ccy_couple = c.src
         |  JOIN chn b ON b.ccy_couple = c.dst AND b.date = a.date
         |), cum AS (
         |  SELECT src, dst, date, d,
         |    CAST(sum(d) OVER (PARTITION BY src, dst ORDER BY date
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s,
         |    row_number() OVER (PARTITION BY src, dst ORDER BY date) AS rn
         |  FROM sd
         |), mo AS (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM (SELECT src, dst, d AS y,
         |          lag(s) OVER (PARTITION BY src, dst ORDER BY date) AS x,
         |          rn
         |        FROM cum) t
         |  WHERE rn >= 2
         |  GROUP BY 1, 2
         |), tt AS (
         |  SELECT src, dst, n,
         |    n * sxy - sx * sy AS num,
         |    n * sxx - sx * sx AS den,
         |    n * syy - sy * sy AS deny
         |  FROM mo
         |), ts AS (
         |  SELECT src, dst, n,
         |    CASE WHEN n >= 2 AND den > 0
         |         THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS beta,
         |    CASE WHEN n >= 3 AND den > 0
         |          AND CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)
         |              - CAST(num AS DOUBLE) * CAST(num AS DOUBLE) > 0.0
         |         THEN CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
         |              * CAST(n - 2 AS DOUBLE)
         |              / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)
         |                 - CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
         |    END AS t_sq
         |  FROM tt
         |)
         |SELECT src AS src_ccy, dst AS dst_ccy, n AS n_obs, beta, t_sq,
         |  (beta < 0.0 AND t_sq >= 8.1796) AS stationary_5pct
         |FROM ts""".stripMargin,

    // the Viterbi DP replayed one state row per day — pure integer
    // minimization and string appends, nothing to round
    "fx_regime_viterbi" ->
      s"""WITH RECURSIVE $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), chn AS (
         |  SELECT ccy_couple, date, CAST(chg * 1000 AS BIGINT) AS chg_u
         |  FROM ch WHERE chg IS NOT NULL
         |), g AS (
         |  SELECT ccy_couple, date,
         |    CASE WHEN chg_u > 0 THEN 1 WHEN chg_u < 0 THEN -1 ELSE 0 END
         |      AS sg,
         |    row_number() OVER (PARTITION BY ccy_couple ORDER BY date) AS rn
         |  FROM chn
         |), nn AS (
         |  SELECT ccy_couple, CAST(max(rn) AS BIGINT) AS n FROM g GROUP BY 1
         |), rec AS (
         |  SELECT ccy_couple, 0 AS rn, CAST(0 AS BIGINT) AS cu,
         |    CAST(0 AS BIGINT) AS cd, CAST('' AS VARCHAR) AS pu,
         |    CAST('' AS VARCHAR) AS pd, CAST(0 AS BIGINT) AS su,
         |    CAST(0 AS BIGINT) AS sd
         |  FROM nn
         |  UNION ALL
         |  SELECT ccy_couple, rn,
         |    eu + CASE WHEN stayu THEN cu ELSE cd + 3 END,
         |    ed + CASE WHEN stayd THEN cd ELSE cu + 3 END,
         |    (CASE WHEN stayu THEN pu ELSE pd END) || 'U',
         |    (CASE WHEN stayd THEN pd ELSE pu END) || 'D',
         |    CASE WHEN stayu OR pu = '' THEN su ELSE sd + 1 END,
         |    CASE WHEN stayd OR pu = '' THEN sd ELSE su + 1 END
         |  FROM (
         |    SELECT r.ccy_couple, g.rn, r.cu, r.cd, r.pu, r.pd, r.su, r.sd,
         |      CAST(CASE WHEN g.sg = 1 THEN 0 WHEN g.sg = -1 THEN 2
         |                ELSE 1 END AS BIGINT) AS eu,
         |      CAST(CASE WHEN g.sg = -1 THEN 0 WHEN g.sg = 1 THEN 2
         |                ELSE 1 END AS BIGINT) AS ed,
         |      r.cu <= r.cd + 3 AS stayu,
         |      r.cd <= r.cu + 3 AS stayd
         |    FROM rec r JOIN g ON g.ccy_couple = r.ccy_couple
         |                     AND g.rn = r.rn + 1
         |  )
         |)
         |SELECT r.ccy_couple, nn.n AS n_days,
         |  CASE WHEN r.cu <= r.cd THEN r.cu ELSE r.cd END AS bit_cost,
         |  CAST(length(r.p) - length(replace(r.p, 'U', '')) AS BIGINT)
         |    AS n_up_days,
         |  CASE WHEN r.cu <= r.cd THEN r.su ELSE r.sd END AS n_switches,
         |  md5(r.p) AS path_fp
         |FROM (SELECT *, CASE WHEN cu <= cd THEN pu ELSE pd END AS p
         |      FROM rec) r
         |JOIN nn ON nn.ccy_couple = r.ccy_couple
         |WHERE r.rn = nn.n""".stripMargin,

    // the GARCH recurrence replayed one state row per day; the peak
    // CASE repeats the s2 subexpression via a wrapping subquery so the
    // doubles are the identical operands
    "fx_garch_vol" -> GarchVolOracleSql,

    // the incrementally-maintained report must equal the one-shot
    // recurrence bit for bit — identical oracle
    "stream_garch_incremental" -> GarchVolOracleSql,

    // lag-1 self-join on consecutive calendar days; same clamped corr
    // formula tree as fx_change_corr on exact integer moments
    // VR(5): the chg_u chain, window row-number + q-sum over 5 rows,
    // exact integer moments (DuckDB HUGEINT sums cast to DOUBLE only in
    // the closing tree, which mirrors varianceRatio's operand order)
    "fx_variance_ratio" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), chn AS (
         |  SELECT ccy_couple, date, CAST(chg * 1000 AS BIGINT) AS chg_u
         |  FROM ch WHERE chg IS NOT NULL
         |), ord AS (
         |  SELECT ccy_couple, chg_u,
         |    row_number() OVER (PARTITION BY ccy_couple ORDER BY date) AS t,
         |    count(*) OVER (PARTITION BY ccy_couple) AS n
         |  FROM chn
         |), qs AS (
         |  SELECT ccy_couple, n, t,
         |    sum(chg_u) OVER (PARTITION BY ccy_couple ORDER BY t
         |      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS s
         |  FROM ord
         |), mo AS (
         |  SELECT ccy_couple, max(n) AS n,
         |    sum(chg_u) AS s1, sum(chg_u * chg_u) AS s2
         |  FROM ord GROUP BY 1
         |), mq AS (
         |  SELECT ccy_couple, count(*) AS nq, sum(s) AS t1, sum(s * s) AS t2
         |  FROM qs WHERE t <= n - 4 GROUP BY 1
         |), z AS (
         |  SELECT mo.ccy_couple, CAST(mo.n AS BIGINT) AS n_days,
         |    CAST(mq.nq AS BIGINT) AS nq,
         |    CASE WHEN CAST(mo.n AS DOUBLE) * CAST(s2 AS DOUBLE)
         |              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) = 0.0
         |      THEN NULL
         |      ELSE ((CAST(mq.nq AS DOUBLE) * CAST(t2 AS DOUBLE)
         |             - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE))
         |            * CAST(mo.n AS DOUBLE) * CAST(mo.n AS DOUBLE))
         |           / (5.0 * (CAST(mo.n AS DOUBLE) * CAST(s2 AS DOUBLE)
         |                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
         |              * CAST(mq.nq AS DOUBLE) * CAST(mq.nq AS DOUBLE))
         |      END AS vr,
         |    CAST(mo.n AS DOUBLE) AS nd
         |  FROM mo JOIN mq USING (ccy_couple)
         |  WHERE mo.n > 5
         |)
         |SELECT ccy_couple, n_days, nq, vr,
         |  (vr - 1.0) * (vr - 1.0) / (72.0 / (15.0 * nd)) AS z_sq,
         |  (vr - 1.0) * (vr - 1.0) / (72.0 / (15.0 * nd)) > 3.8416
         |    AS walk_rejected
         |FROM z""".stripMargin,

    "fx_autocorr" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), chn AS (
         |  SELECT ccy_couple, date, CAST(chg * 1000 AS BIGINT) AS chg_u
         |  FROM ch WHERE chg IS NOT NULL
         |), m AS (
         |  SELECT a.ccy_couple, count(*) AS n_days,
         |    CAST(sum(a.chg_u) AS DOUBLE) AS sx,
         |    CAST(sum(b.chg_u) AS DOUBLE) AS sy,
         |    CAST(sum(a.chg_u * b.chg_u) AS DOUBLE) AS sxy,
         |    CAST(sum(a.chg_u * a.chg_u) AS DOUBLE) AS sxx,
         |    CAST(sum(b.chg_u * b.chg_u) AS DOUBLE) AS syy
         |  FROM chn a JOIN chn b
         |    ON a.ccy_couple = b.ccy_couple
         |    AND b.date = a.date + INTERVAL 1 DAY
         |  GROUP BY 1
         |)
         |SELECT ccy_couple, n_days,
         |  (CAST(n_days AS DOUBLE) * sxy - sx * sy)
         |    / sqrt(nullif(greatest(
         |        (CAST(n_days AS DOUBLE) * sxx - sx * sx)
         |        * (CAST(n_days AS DOUBLE) * syy - sy * sy), 0.0), 0.0))
         |    AS autocorr_1d
         |FROM m""".stripMargin,

    // sample stddev from exact integer Σ and Σ²; single-change -> NULL
    "fx_volatility" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), chn AS (
         |  SELECT ccy_couple, CAST(chg * 1000 AS BIGINT) AS chg_u
         |  FROM ch WHERE chg IS NOT NULL
         |), m AS (
         |  SELECT ccy_couple, count(*) AS n_days,
         |    CAST(sum(chg_u) AS DOUBLE) AS s,
         |    CAST(sum(chg_u * chg_u) AS DOUBLE) AS ss
         |  FROM chn GROUP BY 1
         |)
         |SELECT ccy_couple, n_days,
         |  sqrt(greatest(CAST(n_days AS DOUBLE) * ss - s * s, 0.0)
         |    / nullif(CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0),
         |             0.0)) AS vol_milli
         |FROM m""".stripMargin,

    // the same two ROWS frames + lagged signal + long P&L — pure
    // integer comparisons, exact by construction
    "fx_backtest_ma" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) * 1000
         |         AS BIGINT) AS close_u
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), f AS (
         |  SELECT ccy_couple, date, close_u,
         |    close_u - lag(close_u) OVER wd AS chg_u,
         |    sum(close_u) OVER (wd ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         |      AS sumF,
         |    count(*) OVER (wd ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         |      AS cntS,
         |    sum(close_u) OVER (wd ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         |      AS sumS
         |  FROM cl
         |  WINDOW wd AS (PARTITION BY ccy_couple ORDER BY date)
         |), g AS (
         |  SELECT ccy_couple, date, chg_u,
         |    CASE WHEN cntS = 20 AND sumF * 20 > sumS * 5
         |         THEN 1 ELSE 0 END AS signal
         |  FROM f
         |), h AS (
         |  SELECT ccy_couple, date, chg_u, signal,
         |    coalesce(lag(signal) OVER wd, 0) AS pos,
         |    abs(signal - coalesce(lag(signal) OVER wd, 0)) AS flip
         |  FROM g
         |  WINDOW wd AS (PARTITION BY ccy_couple ORDER BY date)
         |)
         |SELECT ccy_couple, count(*) AS n_days,
         |  CAST(sum(flip) AS BIGINT) AS n_trades,
         |  CAST(sum(pos * coalesce(chg_u, 0)) AS BIGINT) AS pnl_milli,
         |  CAST(arg_max(pos, date) AS BIGINT) AS final_pos
         |FROM h GROUP BY ccy_couple""".stripMargin,

    // the integer five-state fold as a recursive CTE — every state
    // column BIGINT, so equality is exact by construction
    "fx_cusum" ->
      s"""WITH RECURSIVE $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), p AS (
         |  SELECT ccy_couple,
         |    list(CAST(chg * 1000 AS BIGINT) ORDER BY date) AS xs
         |  FROM ch WHERE chg IS NOT NULL GROUP BY 1
         |), st AS (
         |  SELECT ccy_couple, xs, 0 AS i, CAST(0 AS BIGINT) AS sp,
         |    CAST(0 AS BIGINT) AS sn, CAST(0 AS BIGINT) AS mp,
         |    CAST(0 AS BIGINT) AS mn, CAST(0 AS BIGINT) AS al
         |  FROM p
         |  UNION ALL
         |  SELECT ccy_couple, xs, i + 1,
         |    greatest(0, sp + xs[i + 1] - 5),
         |    greatest(0, sn - xs[i + 1] - 5),
         |    greatest(mp, greatest(0, sp + xs[i + 1] - 5)),
         |    greatest(mn, greatest(0, sn - xs[i + 1] - 5)),
         |    al + CASE WHEN greatest(0, sp + xs[i + 1] - 5) > 50
         |               OR greatest(0, sn - xs[i + 1] - 5) > 50
         |              THEN 1 ELSE 0 END
         |  FROM st WHERE i < length(xs)
         |)
         |SELECT ccy_couple, CAST(length(xs) AS BIGINT) AS n_changes,
         |  sp AS cusum_pos, sn AS cusum_neg, mp AS max_pos, mn AS max_neg,
         |  al AS n_alarm_days
         |FROM st WHERE i = length(xs)""".stripMargin,

    // VaR via quantile_cont (the percentile↔quantile_cont precedent);
    // ES over the rank-defined tail — ratio of exact longs; argmin worst
    // day under the (chg, date) total order
    "fx_var_es" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), chn AS (
         |  SELECT ccy_couple, date, CAST(chg * 1000 AS BIGINT) AS chg_u
         |  FROM ch WHERE chg IS NOT NULL
         |), st AS (
         |  SELECT ccy_couple, count(*) AS n_changes,
         |    quantile_cont(chg_u, 0.05) AS var_milli,
         |    (count(*) + 19) // 20 AS k
         |  FROM chn GROUP BY 1
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY ccy_couple
         |    ORDER BY chg_u ASC, date ASC) AS rn FROM chn
         |), es AS (
         |  SELECT r.ccy_couple,
         |    CAST(sum(r.chg_u) AS DOUBLE) / CAST(max(st.k) AS DOUBLE)
         |      AS es_milli
         |  FROM r JOIN st USING (ccy_couple) WHERE rn <= k GROUP BY 1
         |), w AS (
         |  SELECT ccy_couple, date AS worst_day, chg_u AS worst_chg_milli
         |  FROM r WHERE rn = 1
         |)
         |SELECT st.ccy_couple, st.n_changes, st.var_milli, es.es_milli,
         |  w.worst_day, w.worst_chg_milli
         |FROM st JOIN es USING (ccy_couple) JOIN w USING (ccy_couple)""".stripMargin,

    // running-peak drawdown entirely in DECIMAL, exact integer result
    "fx_drawdown" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), dd AS (
         |  SELECT ccy_couple,
         |    max(close) OVER (PARTITION BY ccy_couple ORDER BY date
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - close
         |      AS dd
         |  FROM cl
         |)
         |SELECT ccy_couple, count(*) AS n_days,
         |  CAST(max(dd) * 1000 AS BIGINT) AS max_drawdown_milli
         |FROM dd GROUP BY 1""".stripMargin,

    // gap bounds and lengths are pure date arithmetic — exact replay
    "fx_gaps" ->
      s"""WITH $RatesCte, d AS (
         |  SELECT DISTINCT ccy_couple, date FROM rates
         |), g AS (
         |  SELECT ccy_couple, date,
         |    lag(date) OVER (PARTITION BY ccy_couple ORDER BY date) AS pd
         |  FROM d
         |)
         |SELECT ccy_couple, pd + 1 AS gap_start, date - 1 AS gap_end,
         |  CAST(datediff('day', pd, date) - 1 AS BIGINT) AS gap_days
         |FROM g
         |WHERE pd IS NOT NULL AND datediff('day', pd, date) > 1""".stripMargin,

    // the five metric replays over ONE shared close/change digest,
    // stitched with the same LEFT joins
    "fx_market_report" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), cl3 AS (
         |  SELECT ccy_couple, date, CAST(close AS DECIMAL(12,3)) AS close3,
         |    CAST(CAST(close AS DECIMAL(12,3)) * 1000 AS BIGINT) AS close_u
         |  FROM cl
         |), ep AS (
         |  SELECT ccy_couple,
         |    list(CAST(close_u AS DOUBLE) ORDER BY date) AS xs
         |  FROM cl3 GROUP BY 1
         |), e AS (
         |  SELECT ccy_couple, length(xs) AS n_days,
         |    xs[length(xs)] AS last_close_milli,
         |    list_reduce(xs, (acc, x) -> 0.25 * x + 0.75 * acc) AS ema_milli
         |  FROM ep
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), chn AS (
         |  SELECT ccy_couple, date, CAST(chg * 1000 AS BIGINT) AS chg_u
         |  FROM ch WHERE chg IS NOT NULL
         |), vm AS (
         |  SELECT ccy_couple, count(*) AS n,
         |    CAST(sum(chg_u) AS DOUBLE) AS s,
         |    CAST(sum(chg_u * chg_u) AS DOUBLE) AS ss
         |  FROM chn GROUP BY 1
         |), v AS (
         |  SELECT ccy_couple,
         |    sqrt(greatest(CAST(n AS DOUBLE) * ss - s * s, 0.0)
         |      / nullif(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0), 0.0))
         |      AS vol_milli
         |  FROM vm
         |), ddw AS (
         |  SELECT ccy_couple,
         |    max(close3) OVER (PARTITION BY ccy_couple ORDER BY date
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - close3
         |      AS dd
         |  FROM cl3
         |), d AS (
         |  SELECT ccy_couple, CAST(max(dd) * 1000 AS BIGINT)
         |    AS max_drawdown_milli
         |  FROM ddw GROUP BY 1
         |), rp AS (
         |  SELECT ccy_couple,
         |    list(greatest(CAST(chg_u AS DOUBLE), 0.0) ORDER BY date) AS gs,
         |    list(greatest(-CAST(chg_u AS DOUBLE), 0.0) ORDER BY date) AS ls
         |  FROM chn GROUP BY 1
         |), rf AS (
         |  SELECT ccy_couple,
         |    list_reduce(gs, (acc, x) -> 0.0625 * x + 0.9375 * acc) AS ag,
         |    list_reduce(ls, (acc, x) -> 0.0625 * x + 0.9375 * acc) AS al
         |  FROM rp
         |), r AS (
         |  SELECT ccy_couple,
         |    CASE WHEN al = 0.0 THEN 100.0
         |         ELSE 100.0 - 100.0 / (1.0 + ag / al) END AS rsi
         |  FROM rf
         |), d0 AS (SELECT min(date) AS d0 FROM cl3),
         |pts AS (
         |  SELECT ccy_couple,
         |    CAST(date_diff('day', d0.d0, cl3.date) AS BIGINT) AS x,
         |    close_u AS y
         |  FROM cl3, d0
         |), tm AS (
         |  SELECT ccy_couple, count(*) AS n_days,
         |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |    CAST(sum(x * y) AS DOUBLE) AS sxy,
         |    CAST(sum(x * x) AS DOUBLE) AS sxx
         |  FROM pts GROUP BY 1
         |), t AS (
         |  SELECT ccy_couple,
         |    (CAST(n_days AS DOUBLE) * sxy - sx * sy)
         |      / nullif(CAST(n_days AS DOUBLE) * sxx - sx * sx, 0.0)
         |      AS slope_milli
         |  FROM tm
         |)
         |SELECT e.ccy_couple, e.n_days, e.last_close_milli, e.ema_milli,
         |  v.vol_milli, d.max_drawdown_milli, r.rsi, t.slope_milli
         |FROM e
         |LEFT JOIN v ON v.ccy_couple = e.ccy_couple
         |LEFT JOIN d ON d.ccy_couple = e.ccy_couple
         |LEFT JOIN r ON r.ccy_couple = e.ccy_couple
         |LEFT JOIN t ON t.ccy_couple = e.ccy_couple""".stripMargin,

    // both Wilder folds replayed via date-ordered list_reduce (the EMA
    // replay), then the identical RSI expression tree
    "fx_rsi" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), chn AS (
         |  SELECT ccy_couple, date, CAST(chg * 1000 AS BIGINT) AS chg_u
         |  FROM ch WHERE chg IS NOT NULL
         |), p AS (
         |  SELECT ccy_couple, count(*) AS n_changes,
         |    list(greatest(CAST(chg_u AS DOUBLE), 0.0) ORDER BY date) AS gs,
         |    list(greatest(-CAST(chg_u AS DOUBLE), 0.0) ORDER BY date) AS ls
         |  FROM chn GROUP BY 1
         |), f AS (
         |  SELECT ccy_couple, n_changes,
         |    list_reduce(gs, (acc, x) -> 0.0625 * x + 0.9375 * acc)
         |      AS avg_gain_milli,
         |    list_reduce(ls, (acc, x) -> 0.0625 * x + 0.9375 * acc)
         |      AS avg_loss_milli
         |  FROM p
         |)
         |SELECT ccy_couple, CAST(n_changes AS BIGINT) AS n_changes,
         |  avg_gain_milli, avg_loss_milli,
         |  CASE WHEN avg_loss_milli = 0.0 THEN 100.0
         |       ELSE 100.0 - 100.0 / (1.0 + avg_gain_milli / avg_loss_milli)
         |  END AS rsi
         |FROM f""".stripMargin,

    // the EMA fold replayed operation-for-operation: DuckDB list_reduce
    // over a date-ordered list is the same left fold (first element =
    // initial accumulator) as Spark's aggregate-HOF over the sorted
    // array, and α = 0.25 is binary-exact, so the double rounding
    // sequence is identical
    "fx_ema" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) * 1000
         |         AS BIGINT) AS close_u
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), p AS (
         |  SELECT ccy_couple,
         |    list(CAST(close_u AS DOUBLE) ORDER BY date) AS xs
         |  FROM cl GROUP BY 1
         |)
         |SELECT ccy_couple, length(xs) AS n_days,
         |  xs[length(xs)] AS last_close_milli,
         |  list_reduce(xs, (acc, x) -> 0.25 * x + 0.75 * acc) AS ema_milli
         |FROM p""".stripMargin,

    // the same row_number-difference island identity in SQL
    "fx_streaks" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date, CAST(rate AS DECIMAL(18,6)) AS close
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), ch AS (
         |  SELECT ccy_couple, date,
         |    CAST(close - lag(close) OVER (PARTITION BY ccy_couple
         |        ORDER BY date) AS DECIMAL(12,3)) AS chg
         |  FROM cl
         |), sg AS (
         |  SELECT ccy_couple, date,
         |    CASE WHEN chg > 0 THEN 1 ELSE -1 END AS direction
         |  FROM ch WHERE chg IS NOT NULL AND chg <> 0
         |), isl AS (
         |  SELECT ccy_couple, direction,
         |    row_number() OVER (PARTITION BY ccy_couple ORDER BY date)
         |    - row_number() OVER (PARTITION BY ccy_couple, direction
         |        ORDER BY date) AS grp,
         |    date
         |  FROM sg
         |), agg AS (
         |  SELECT ccy_couple, direction, grp, count(*) AS streak_days,
         |    min(date) AS start_date
         |  FROM isl GROUP BY 1, 2, 3
         |)
         |SELECT ccy_couple, direction, streak_days, start_date
         |FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, direction
         |        ORDER BY streak_days DESC, start_date ASC) AS rn FROM agg)
         |WHERE rn = 1""".stripMargin,

    // the two-state Holt fold as a recursive CTE; l_t recomputed inside
    // the b_t expression is bit-identical (deterministic IEEE ops)
    "fx_holt_forecast" ->
      s"""WITH RECURSIVE $RatesCte, cl AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) * 1000
         |         AS BIGINT) AS close_u
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), p AS (
         |  SELECT ccy_couple,
         |    list(CAST(close_u AS DOUBLE) ORDER BY date) AS xs
         |  FROM cl GROUP BY 1
         |), steps AS (
         |  SELECT ccy_couple, xs, 1 AS i,
         |    xs[1] AS l, CAST(0.0 AS DOUBLE) AS b
         |  FROM p
         |  UNION ALL
         |  SELECT ccy_couple, xs, i + 1,
         |    0.25 * xs[i + 1] + 0.75 * (l + b),
         |    0.125 * ((0.25 * xs[i + 1] + 0.75 * (l + b)) - l) + 0.875 * b
         |  FROM steps WHERE i < length(xs)
         |)
         |SELECT ccy_couple, CAST(length(xs) AS BIGINT) AS n_days,
         |  l AS level_milli, b AS trend_milli,
         |  l + b AS forecast_1d_milli, l + b * 5.0 AS forecast_5d_milli
         |FROM steps WHERE i = length(xs)""".stripMargin,

    // the Kalman recursion replayed: (xh, pv) per step, the gain
    // expression recomputed inside both state columns — deterministic
    // IEEE division makes the re-evaluated subtree bit-identical
    "fx_kalman" ->
      s"""WITH RECURSIVE $RatesCte, cl AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) * 1000
         |         AS BIGINT) AS close_u
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), p AS (
         |  SELECT ccy_couple,
         |    list(CAST(close_u AS DOUBLE) ORDER BY date) AS xs
         |  FROM cl GROUP BY 1
         |), steps AS (
         |  SELECT ccy_couple, xs, 1 AS i,
         |    xs[1] AS xh, CAST(1.0 AS DOUBLE) AS pv
         |  FROM p
         |  UNION ALL
         |  SELECT ccy_couple, xs, i + 1,
         |    xh + ((pv + 1.0) / ((pv + 1.0) + 4.0)) * (xs[i + 1] - xh),
         |    (1.0 - ((pv + 1.0) / ((pv + 1.0) + 4.0))) * (pv + 1.0)
         |  FROM steps WHERE i < length(xs)
         |)
         |SELECT ccy_couple, CAST(length(xs) AS BIGINT) AS n_days,
         |  xh AS estimate_milli, pv AS variance_milli2,
         |  xs[length(xs)] - xh AS resid_milli
         |FROM steps WHERE i = length(xs)""".stripMargin,

    // the three-state fold replayed as a recursive CTE: one step per
    // day carrying (f, s, sig); the signal expression recomputes the
    // f/s subtrees — deterministic double ops make that bit-identical
    "fx_macd" ->
      s"""WITH RECURSIVE $RatesCte, cl AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) * 1000
         |         AS BIGINT) AS close_u
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), p AS (
         |  SELECT ccy_couple,
         |    list(CAST(close_u AS DOUBLE) ORDER BY date) AS xs
         |  FROM cl GROUP BY 1
         |), steps AS (
         |  SELECT ccy_couple, xs, 1 AS i,
         |    xs[1] AS f, xs[1] AS s, CAST(0.0 AS DOUBLE) AS sig
         |  FROM p
         |  UNION ALL
         |  SELECT ccy_couple, xs, i + 1,
         |    0.25 * xs[i + 1] + 0.75 * f,
         |    0.0625 * xs[i + 1] + 0.9375 * s,
         |    0.125 * ((0.25 * xs[i + 1] + 0.75 * f)
         |             - (0.0625 * xs[i + 1] + 0.9375 * s)) + 0.875 * sig
         |  FROM steps WHERE i < length(xs)
         |)
         |SELECT ccy_couple, CAST(length(xs) AS BIGINT) AS n_days,
         |  f - s AS macd_milli, sig AS signal_milli,
         |  (f - s) - sig AS hist_milli
         |FROM steps WHERE i = length(xs)""".stripMargin,

    // Bollinger: the trailing frame reduced to exact integer moments,
    // then the identical double expression tree (s/n, sqrt of the
    // clamped sample variance, ±2σ) once per row
    "fx_bollinger" ->
      s"""WITH $RatesCte, cl AS (
         |  SELECT ccy_couple, date,
         |    CAST(CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) * 1000
         |         AS BIGINT) AS close_u
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |  WHERE rn = 1
         |), f AS (
         |  SELECT ccy_couple, date, close_u,
         |    CAST(count(*) OVER w AS DOUBLE) AS n,
         |    CAST(sum(close_u) OVER w AS DOUBLE) AS s,
         |    CAST(sum(close_u * close_u) OVER w AS DOUBLE) AS ss
         |  FROM cl
         |  WINDOW w AS (PARTITION BY ccy_couple ORDER BY date
         |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         |)
         |SELECT ccy_couple, date, CAST(close_u AS DOUBLE) AS close_milli,
         |  s / n AS mid_milli,
         |  s / n - 2.0 * sqrt(greatest(n * ss - s * s, 0.0)
         |    / nullif(n * (n - 1.0), 0.0)) AS lower_milli,
         |  s / n + 2.0 * sqrt(greatest(n * ss - s * s, 0.0)
         |    / nullif(n * (n - 1.0), 0.0)) AS upper_milli
         |FROM f""".stripMargin,

    // z-ordering must be row-identity: the output is simply the table
    "maint_zorder_events" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |FROM events""".stripMargin,

    // hilbert clustering must also be row-identity
    "maint_hilbert_events" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |FROM events""".stripMargin,

    // the bloom contract: pruned point scan ≡ full-table equality filter
    "maint_bloom_lookup" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM events WHERE user_id = 37""".stripMargin,

    // the skipping contract: pruned scan ≡ full-table range filter
    "maint_skipping_scan" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM events WHERE user_id BETWEEN 30 AND 44""".stripMargin,

    // compaction must be row-identity: the output is simply the table
    "maint_compact_rates" ->
      s"""WITH $RatesCte
         |SELECT event_id, ccy_couple, rate, date, event_time FROM rates""".stripMargin,

    // the diff of the two LWW snapshots, null-safe per value column;
    // unchanged keys drop out (IS NOT DISTINCT FROM mirrors Spark's <=>)
    "fx_cdc_snapshot_diff" ->
      s"""WITH $RatesCte, o AS (
         |  SELECT ccy_couple, date, rate AS old_rate,
         |         event_time AS old_event_time, true AS in_old
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY "timestamp" DESC, event_id DESC) AS rn
         |        FROM rates WHERE "timestamp" <= $CutoffSql)
         |  WHERE rn = 1
         |), nw AS (
         |  SELECT ccy_couple, date, rate AS new_rate,
         |         event_time AS new_event_time, true AS in_new
         |  FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |          ORDER BY "timestamp" DESC, event_id DESC) AS rn
         |        FROM rates)
         |  WHERE rn = 1
         |)
         |SELECT ccy_couple, date, old_rate, old_event_time,
         |       new_rate, new_event_time,
         |       CASE WHEN in_old IS NULL THEN 'insert'
         |            WHEN in_new IS NULL THEN 'delete'
         |            ELSE 'update' END AS change_type
         |FROM o FULL OUTER JOIN nw USING (ccy_couple, date)
         |WHERE in_old IS NULL OR in_new IS NULL
         |   OR NOT (old_rate IS NOT DISTINCT FROM new_rate
         |           AND old_event_time IS NOT DISTINCT FROM new_event_time)""".stripMargin,

    // every observed version with [valid_from, valid_to) bounds; the
    // open interval marks the current row (= the upsert table)
    "fx_scd2_history" -> Scd2OracleSql,

    // the incrementally-maintained history must equal the one-shot batch
    // SCD2 — identical oracle to fx_scd2_history
    "stream_scd2_incremental" -> Scd2OracleSql,

    // AS OF = the interval containing the cutoff instant
    "fx_scd2_asof" ->
      s"""WITH $RatesCte, h AS (
         |  SELECT ccy_couple, date, rate,
         |    epoch_us("timestamp") AS valid_from_us,
         |    epoch_us(lead("timestamp") OVER (PARTITION BY ccy_couple, date
         |      ORDER BY "timestamp" ASC, event_id ASC)) AS valid_to_us
         |  FROM rates
         |)
         |SELECT ccy_couple, date, rate, valid_from_us
         |FROM h
         |WHERE valid_from_us <= 1705300000000000
         |  AND (valid_to_us IS NULL OR valid_to_us > 1705300000000000)""".stripMargin,

    // per-fact AS OF = the version interval containing each fact's own
    // instant (open current interval included)
    "fx_scd2_temporal_join" ->
      s"""WITH $RatesCte, h AS (
         |  SELECT ccy_couple, date, rate, "timestamp" AS valid_from,
         |    lead("timestamp") OVER (PARTITION BY ccy_couple, date
         |      ORDER BY "timestamp" ASC, event_id ASC) AS valid_to
         |  FROM rates
         |), f AS (
         |  SELECT event_id AS fact_id, CAST(user_id AS VARCHAR) AS ccy_couple,
         |    CAST(ts AS DATE) AS date, ts AS fact_ts
         |  FROM events WHERE event_type = 'purchase'
         |)
         |SELECT fact_id, f.ccy_couple, epoch_us(fact_ts) AS fact_ts_us,
         |  rate AS rate_then, epoch_us(valid_from) AS valid_from_us
         |FROM f JOIN h ON f.ccy_couple = h.ccy_couple AND f.date = h.date
         |WHERE valid_from <= fact_ts
         |  AND (valid_to IS NULL OR fact_ts < valid_to)""".stripMargin,

    // streamed enrichment emissions = the batch dimension join,
    // aggregated per segment (decimal sum for cross-engine determinism)
    "stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    // the streamed join's emitted pairs = the batch interval join
    // (integer-µs bounds so ns-precision timestamps cannot shift them)
    "stream_interval_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS p_id,
        |       c.value AS click_value
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000""".stripMargin,

    // LEFT OUTER: the inner pairs plus a null row per unmatched click
    // whose state expired. Expiry replays Spark's exact rule: the global
    // watermark is min(per-side max event time, FLOORED TO MILLISECONDS)
    // − 60 s delay, and a click is evicted when click_ts < wm − 30 min
    // − 1 µs (the −1 compensates the non-strict `p_ts <= click_ts +
    // window` bound; pinned empirically in StreamingSpec's boundary
    // test). Tail clicks whose window is still open are withheld — that
    // withholding IS the semantics under check.
    "stream_outer_join" ->
      """WITH wm AS (
        |  SELECT ((least(
        |      epoch_us(max(ts) FILTER (WHERE event_type = 'click')) // 1000,
        |      epoch_us(max(ts) FILTER (WHERE event_type = 'purchase')) // 1000)
        |    - 60000) * 1000 - 1800000001) AS boundary_us
        |  FROM events
        |), m AS (
        |  SELECT c.user_id, c.event_id AS click_id, p.event_id AS p_id,
        |         c.value AS click_value
        |  FROM events c JOIN events p
        |    ON c.user_id = p.user_id
        |   AND c.event_type = 'click' AND p.event_type = 'purchase'
        |   AND epoch_us(p.ts) >= epoch_us(c.ts)
        |   AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
        |), u AS (
        |  SELECT c.user_id, c.event_id AS click_id,
        |         CAST(NULL AS BIGINT) AS p_id, c.value AS click_value
        |  FROM events c, wm
        |  WHERE c.event_type = 'click'
        |    AND c.event_id NOT IN (SELECT click_id FROM m)
        |    AND epoch_us(c.ts) < wm.boundary_us
        |)
        |SELECT * FROM m UNION ALL SELECT * FROM u""".stripMargin,

    // the incrementally-maintained bars table must equal the one-shot
    // batch aggregation — identical oracle to fx_ohlc_bars
    "stream_ohlc_incremental" -> OhlcOracleSql,

    // identical target state to fx_upsert_latest: the streaming replay
    // must converge to the one-shot LWW upsert
    "stream_replay_upsert" ->
      s"""WITH $RatesCte
         |SELECT ccy_couple, date, rate, event_time
         |FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |        ORDER BY "timestamp" DESC, event_id DESC) AS rn FROM rates)
         |WHERE rn = 1""".stripMargin,

    // the stateful stream's converged state = the batch per-pair argmax
    // under the (event_time, event_id) total order
    "stream_latest_per_pair" ->
      s"""WITH $RatesCte
         |SELECT ccy_couple, event_time, rate, event_id
         |FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple
         |        ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |WHERE rn = 1""".stripMargin,

    // identical oracle: API version must not change the converged state
    "stream_latest_tws" ->
      s"""WITH $RatesCte
         |SELECT ccy_couple, event_time, rate, event_id
         |FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple
         |        ORDER BY event_time DESC, event_id DESC) AS rn FROM rates)
         |WHERE rn = 1""".stripMargin,

    // the streamed window set = batch time_bucket aggregation restricted
    // to windows closed by the final watermark (integer-µs arithmetic on
    // both sides so the ns-vs-µs storage difference cannot shift the cut);
    // last_rate replays the total (µs ts, event_id) argmax with a
    // descending row_number (DuckDB's arg_max has no composite-key form)
    "stream_window_stats" ->
      s"""WITH $RatesCte,
         |wmk AS (
         |  SELECT epoch_us(max("timestamp")) - 60000000 AS w FROM rates
         |), r AS (
         |  SELECT time_bucket(INTERVAL 6 HOUR, "timestamp") AS ws, ccy_couple, rate,
         |    row_number() OVER (
         |      PARTITION BY time_bucket(INTERVAL 6 HOUR, "timestamp"), ccy_couple
         |      ORDER BY epoch_us("timestamp") DESC, event_id DESC) AS rn_d
         |  FROM rates
         |), b AS (
         |  SELECT ws, ccy_couple,
         |    count(*) AS n_quotes, max(rate) AS max_rate, min(rate) AS min_rate,
         |    max(CASE WHEN rn_d = 1 THEN rate END) AS last_rate
         |  FROM r GROUP BY 1, 2
         |)
         |SELECT epoch_us(ws) AS window_start,
         |       epoch_us(ws + INTERVAL 6 HOUR) AS window_end,
         |       ccy_couple, n_quotes, max_rate, min_rate, last_rate
         |FROM b, wmk WHERE epoch_us(ws + INTERVAL 6 HOUR) <= wmk.w""".stripMargin,

    // streamed sessions = lag/cumsum gap sessionization per pair
    // (new-session predicate diff >= gap: Spark sessions are half-open
    // [first, last+gap)), restricted to sessions the watermark closed;
    // last_rate = the total (µs ts, event_id) argmax within the session
    "stream_session_stats" ->
      s"""WITH $RatesCte, x AS (
         |  SELECT ccy_couple, "timestamp" AS ts, event_id, rate,
         |    lag("timestamp") OVER (PARTITION BY ccy_couple
         |      ORDER BY "timestamp", event_id) AS prev_ts
         |  FROM rates
         |), y AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |                   OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
         |                 THEN 1 ELSE 0 END AS news
         |  FROM x
         |), z AS (
         |  SELECT *, CAST(sum(news) OVER (PARTITION BY ccy_couple
         |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |  FROM y
         |), zr AS (
         |  SELECT *, row_number() OVER (PARTITION BY ccy_couple, sid
         |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
         |  FROM z
         |), ses AS (
         |  SELECT ccy_couple, sid, count(*) AS n_events,
         |    epoch_us(min(ts)) AS session_start,
         |    epoch_us(max(ts)) + 1800000000 AS session_end,
         |    max(CASE WHEN rn_d = 1 THEN rate END) AS last_rate
         |  FROM zr GROUP BY ccy_couple, sid
         |), wmk AS (
         |  SELECT epoch_us(max("timestamp")) - 60000000 AS w FROM rates
         |)
         |SELECT session_start, session_end, ccy_couple, n_events, last_rate
         |FROM ses, wmk WHERE session_end <= wmk.w""".stripMargin,

    // timer sessionization: non-final sessions close INLINE on the gap
    // (watermark-free — lag/cumsum replays them all); each key's FINAL
    // session closes iff its ms-floored end ≤ the final watermark
    // (max event ms − 60 s) — the timer-firing rule the replay probe
    // pinned (14/15 finals at sf0.001, exact predictor match)
    "stream_session_timers" ->
      s"""WITH $RatesCte, x AS (
         |  SELECT ccy_couple, "timestamp" AS ts, event_id,
         |    lag("timestamp") OVER (PARTITION BY ccy_couple
         |      ORDER BY "timestamp", event_id) AS prev_ts
         |  FROM rates
         |), y AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |                   OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
         |                 THEN 1 ELSE 0 END AS news
         |  FROM x
         |), z AS (
         |  SELECT *, CAST(sum(news) OVER (PARTITION BY ccy_couple
         |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |  FROM y
         |), ses AS (
         |  SELECT ccy_couple, sid, CAST(count(*) AS BIGINT) AS n_events,
         |    epoch_us(min(ts)) AS session_start,
         |    epoch_us(max(ts)) + 1800000000 AS session_end
         |  FROM z GROUP BY ccy_couple, sid
         |), lasts AS (
         |  SELECT ccy_couple, max(sid) AS last_sid FROM ses GROUP BY 1
         |), wmk AS (
         |  SELECT epoch_us(max("timestamp")) // 1000 - 60000 AS w FROM rates
         |)
         |SELECT s.ccy_couple, s.session_start, s.session_end, s.n_events
         |FROM ses s JOIN lasts l USING (ccy_couple), wmk
         |WHERE s.sid < l.last_sid OR s.session_end // 1000 <= wmk.w""".stripMargin,

    // the boundary gate: the same session/timer chain over the rates
    // relation augmented with the two injected boundary keys —
    // ZZZBOUND's end == watermark must emit (non-strict ≤), ZZZOPEN's
    // end == watermark + 1 ms must not
    "stream_session_timers_boundary" ->
      s"""WITH $RatesCte, aug AS (
         |  SELECT ccy_couple, "timestamp", event_id FROM rates
         |  UNION ALL
         |  SELECT 'ZZZBOUND', max("timestamp") - INTERVAL 1860 SECOND, -1
         |  FROM rates
         |  UNION ALL
         |  SELECT 'ZZZOPEN',
         |    max("timestamp") - INTERVAL 1860 SECOND + INTERVAL 1 MILLISECOND,
         |    -2
         |  FROM rates
         |), x AS (
         |  SELECT ccy_couple, "timestamp" AS ts, event_id,
         |    lag("timestamp") OVER (PARTITION BY ccy_couple
         |      ORDER BY "timestamp", event_id) AS prev_ts
         |  FROM aug
         |), y AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |                   OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
         |                 THEN 1 ELSE 0 END AS news
         |  FROM x
         |), z AS (
         |  SELECT *, CAST(sum(news) OVER (PARTITION BY ccy_couple
         |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |  FROM y
         |), ses AS (
         |  SELECT ccy_couple, sid, CAST(count(*) AS BIGINT) AS n_events,
         |    epoch_us(min(ts)) AS session_start,
         |    epoch_us(max(ts)) + 1800000000 AS session_end
         |  FROM z GROUP BY ccy_couple, sid
         |), lasts AS (
         |  SELECT ccy_couple, max(sid) AS last_sid FROM ses GROUP BY 1
         |), wmk AS (
         |  SELECT epoch_us(max("timestamp")) // 1000 - 60000 AS w FROM aug
         |)
         |SELECT s.ccy_couple, s.session_start, s.session_end, s.n_events
         |FROM ses s JOIN lasts l USING (ccy_couple), wmk
         |WHERE s.sid < l.last_sid OR s.session_end // 1000 <= wmk.w""".stripMargin,

    // the list-state buffer's final digest per pair = the batch top-5
    // under (event_time, event_id), with the exact half-up micro sum
    "stream_trailingk_tws" ->
      s"""WITH $RatesCte, r AS (
         |  SELECT ccy_couple, event_time, event_id,
         |    CAST(floor(rate * 1000000 + 0.5) AS BIGINT) AS micro,
         |    row_number() OVER (PARTITION BY ccy_couple
         |      ORDER BY event_time DESC, event_id DESC) AS rn
         |  FROM rates
         |)
         |SELECT ccy_couple,
         |  max(CASE WHEN rn = 1 THEN event_time END) AS last_event_time,
         |  max(CASE WHEN rn = 1 THEN event_id END) AS last_event_id,
         |  CAST(count(*) AS BIGINT) AS n_window,
         |  CAST(sum(micro) AS BIGINT) AS sum_micro
         |FROM r WHERE rn <= 5
         |GROUP BY ccy_couple""".stripMargin,

    // the map-state daily counts' final digest per pair = the batch
    // per-day aggregate: distinct days, total, busiest day (argmax
    // count, earliest-day tiebreak), day as epoch-days BIGINT
    "stream_daycounts_tws" ->
      s"""WITH $RatesCte, c AS (
         |  SELECT ccy_couple, date, CAST(count(*) AS BIGINT) AS cnt
         |  FROM rates GROUP BY 1, 2
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY ccy_couple
         |    ORDER BY cnt DESC, date ASC) AS rn
         |  FROM c
         |)
         |SELECT ccy_couple, CAST(count(*) AS BIGINT) AS n_days,
         |  CAST(sum(cnt) AS BIGINT) AS total_ticks,
         |  max(CASE WHEN rn = 1 THEN date - DATE '1970-01-01' END) AS busiest_day,
         |  max(CASE WHEN rn = 1 THEN cnt END) AS busiest_count
         |FROM r GROUP BY ccy_couple""".stripMargin,

    // the streamed dedup key set = the batch DISTINCT fingerprint set
    "stream_dedup_docs" ->
      """SELECT DISTINCT
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin,

    // bounded-state dedup replayed batch-by-batch: every first delivery
    // emits; a re-delivery emits iff its key's state was REMOVED in an
    // earlier batch. Under Trigger.AvailableNow no intermediate no-data
    // batches run, so removal at the end of batch j uses the PRE-batch
    // watermark (max event time of batches < j, minus the 600 s delay)
    // — the binding condition for a re-delivery in batch m is therefore
    // the watermark derived from batches ≤ m−2 reaching first-ts +
    // 600 s (non-strict; the whole rule is pinned empirically by the
    // replay itself and the expiry boundary by StreamingSpec). Batch
    // assignment = the feed writer's ntile(10) over (ts, event_id);
    // fixture times are whole seconds so the engine's ms flooring is a
    // no-op
    "stream_dedup_bounded" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |r AS (
        |  SELECT doc_id, 1700000000 + doc_id AS t, doc_id * 2 AS event_id,
        |         true AS is_first FROM d
        |  UNION ALL
        |  SELECT doc_id, 1700000000 + doc_id +
        |           CASE WHEN doc_id % 2 = 0 THEN 30 ELSE 3000 END,
        |         doc_id * 2 + 1, false FROM d
        |), b AS (
        |  SELECT *, ntile(10) OVER (ORDER BY t, event_id) AS batch FROM r
        |), bm AS (
        |  SELECT batch, max(t) AS mx FROM b GROUP BY batch
        |), wmb AS (
        |  SELECT cur.batch, max(prev.mx) - 600 AS wm_t
        |  FROM (SELECT DISTINCT batch FROM b) cur
        |  LEFT JOIN bm prev ON prev.batch <= cur.batch - 2
        |  GROUP BY cur.batch
        |)
        |SELECT doc_id, t * 1000000 AS ts_us FROM b WHERE is_first
        |UNION ALL
        |SELECT d2.doc_id, d2.t * 1000000 AS ts_us
        |FROM b d2
        |JOIN b d1 ON d1.doc_id = d2.doc_id AND d1.is_first
        |JOIN wmb ON wmb.batch = d2.batch
        |WHERE NOT d2.is_first AND wmb.wm_t >= d1.t + 600""".stripMargin,

    // the composed ingest pipeline's merged table = the per-(pair, date)
    // argmax over delivery order, recomputed from the SAME fixture
    // constant the replay writes as payload files (exact re-deliveries
    // carry the same value, so delivery-order argmax equals what the
    // dedup+LWW pipeline converges to). The rate crosses the output
    // boundary as DOUBLE on BOTH sides — the repo-wide convention every
    // hash-green query follows; the 6-dp-exact fixture rates convert
    // identically on both engines.
    "stream_ingest_pipeline" ->
      s"""WITH quotes(ccy_couple, quote_date, rate, v) AS (VALUES
         |  $IngestFeedValuesSql
         |)
         |SELECT ccy_couple, quote_date,
         |       CAST(arg_max(rate, v) AS DOUBLE) AS rate
         |FROM quotes GROUP BY ccy_couple, quote_date""".stripMargin,

    // the changelog = per-batch diffs of consecutive LWW states over the
    // same fixture. dd keeps each exact (key, value)'s FIRST delivery
    // (the stream suppresses later exact re-deliveries); batch = delivery
    // index / 2 (maxFilesPerTrigger=2 over the mtime-ordered feed); state
    // after batch b = argmax over deliveries in batches <= b; a key whose
    // rate changed is an update, a key absent before is an insert,
    // unchanged keys emit nothing. Rates cross the output boundary as
    // DOUBLE on both sides (internal arithmetic stays decimal).
    // the table as of batch 1 = the delivery-order argmax restricted to
    // deliveries in batches <= 1 (same VALUES + exact-redelivery dedup
    // as the changelog oracle below)
    "stream_cdc_timetravel" ->
      s"""WITH quotes(ccy_couple, quote_date, rate, v) AS (VALUES
         |  $IngestFeedValuesSql
         |), dd AS (
         |  SELECT ccy_couple, quote_date, rate, min(v) AS v
         |  FROM quotes GROUP BY ccy_couple, quote_date, rate
         |), db AS (
         |  SELECT *, v // 2 AS b FROM dd
         |)
         |SELECT ccy_couple, quote_date,
         |  CAST(arg_max(rate, v) AS DOUBLE) AS rate
         |FROM db WHERE b <= 1 GROUP BY ccy_couple, quote_date""".stripMargin,

    "stream_cdc_changelog" -> {
      s"""WITH quotes(ccy_couple, quote_date, rate, v) AS (VALUES
         |  $IngestFeedValuesSql
         |), dd AS (
         |  SELECT ccy_couple, quote_date, rate, min(v) AS v
         |  FROM quotes GROUP BY ccy_couple, quote_date, rate
         |), db AS (
         |  SELECT *, v // 2 AS b FROM dd
         |), bs AS (
         |  SELECT DISTINCT v // 2 AS b FROM quotes
         |), st AS (
         |  SELECT bs.b, d.ccy_couple, d.quote_date, arg_max(d.rate, d.v) AS rate
         |  FROM bs JOIN db d ON d.b <= bs.b
         |  GROUP BY bs.b, d.ccy_couple, d.quote_date
         |)
         |SELECT c.ccy_couple, c.quote_date,
         |  CASE WHEN p.rate IS NULL THEN 'insert' ELSE 'update' END AS change_type,
         |  CAST(p.rate AS DOUBLE) AS old_rate,
         |  CAST(c.rate AS DOUBLE) AS new_rate,
         |  CAST(c.b AS BIGINT) AS cdc_batch
         |FROM st c LEFT JOIN st p
         |  ON p.b = c.b - 1 AND p.ccy_couple = c.ccy_couple
         | AND p.quote_date = c.quote_date
         |WHERE p.rate IS NULL OR p.rate <> c.rate""".stripMargin
    },

    // the delete-bearing changelog = the insert/update feed above UNION
    // the retention sweep's deletes: every FINAL-state key dated ≤ the
    // cutoff, old image = its final rate, new image NULL, stamped with
    // the next batch id after the feed's last (max delivery // 2 + 1)
    "stream_cdc_delete_changelog" ->
      s"""WITH quotes(ccy_couple, quote_date, rate, v) AS (VALUES
         |  $IngestFeedValuesSql
         |), dd AS (
         |  SELECT ccy_couple, quote_date, rate, min(v) AS v
         |  FROM quotes GROUP BY ccy_couple, quote_date, rate
         |), db AS (
         |  SELECT *, v // 2 AS b FROM dd
         |), bs AS (
         |  SELECT DISTINCT v // 2 AS b FROM quotes
         |), st AS (
         |  SELECT bs.b, d.ccy_couple, d.quote_date, arg_max(d.rate, d.v) AS rate
         |  FROM bs JOIN db d ON d.b <= bs.b
         |  GROUP BY bs.b, d.ccy_couple, d.quote_date
         |)
         |SELECT c.ccy_couple, c.quote_date,
         |  CASE WHEN p.rate IS NULL THEN 'insert' ELSE 'update' END AS change_type,
         |  CAST(p.rate AS DOUBLE) AS old_rate,
         |  CAST(c.rate AS DOUBLE) AS new_rate,
         |  CAST(c.b AS BIGINT) AS cdc_batch
         |FROM st c LEFT JOIN st p
         |  ON p.b = c.b - 1 AND p.ccy_couple = c.ccy_couple
         | AND p.quote_date = c.quote_date
         |WHERE p.rate IS NULL OR p.rate <> c.rate
         |UNION ALL
         |SELECT ccy_couple, quote_date, 'delete' AS change_type,
         |  CAST(arg_max(rate, v) AS DOUBLE) AS old_rate,
         |  CAST(NULL AS DOUBLE) AS new_rate,
         |  CAST((SELECT max(v) // 2 + 1 FROM quotes) AS BIGINT) AS cdc_batch
         |FROM quotes
         |WHERE quote_date <= DATE '$RetentionCutoffSql'
         |GROUP BY ccy_couple, quote_date""".stripMargin,

    // time travel to the changelog's head after the retention sweep:
    // the delivery-order argmax minus the retired (≤ cutoff) keys
    "stream_cdc_delete_timetravel" ->
      s"""WITH quotes(ccy_couple, quote_date, rate, v) AS (VALUES
         |  $IngestFeedValuesSql
         |)
         |SELECT ccy_couple, quote_date,
         |       CAST(arg_max(rate, v) AS DOUBLE) AS rate
         |FROM quotes
         |WHERE quote_date > DATE '$RetentionCutoffSql'
         |GROUP BY ccy_couple, quote_date""".stripMargin,

    // the partition-pruned cutoff must agree with the row-filtered form:
    // `date` is day-granular, so date <= cutoff == p_date <= cutoff_day
    "fx_partitioned_cutoff" ->
      s"""WITH $RatesCte
         |SELECT ccy_couple, count(*) AS n_ticks, max(rate) AS max_rate,
         |       max(event_time) AS max_event_time
         |FROM rates WHERE date <= $CutoffSql GROUP BY ccy_couple""".stripMargin,

    // the dim join over distinct filtered days is semantically the
    // row filter day(date) <= 3 — pruning must not change the answer
    "fx_dpp_days" ->
      s"""WITH $RatesCte
         |SELECT date AS p_date, count(*) AS n_ticks,
         |       max(rate) AS max_rate, min(rate) AS min_rate
         |FROM rates WHERE day(date) <= 3 GROUP BY date""".stripMargin,

    "fx_insert_if_absent" ->
      """WITH existing AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS date
        |  FROM events WHERE event_type <> 'click'
        |), inc AS (
        |  SELECT event_id, user_id, CAST(ts AS DATE) AS date, value
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT i.* FROM inc i WHERE NOT EXISTS (
        |  SELECT 1 FROM existing e
        |  WHERE e.user_id = i.user_id AND e.date = i.date)""".stripMargin,

    "fx_json_extract" ->
      """SELECT event_id,
        |       CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS INT) AS k
        |FROM events""".stripMargin,

    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.0 - l_discount)
        |                AS DECIMAL(24,8))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    // the damped iteration unrolled step for step (see the builder)
    "q_pagerank_trade" -> PagerankTradeOracleSql,
    "q_ppr_trade" -> PprTradeOracleSql,
    "q_kcore_trade" -> KcoreTradeOracleSql,
    "q_linkpred_trade" -> LinkpredTradeOracleSql,
    "q_hits_trade" -> HitsTradeOracleSql,
    // the maintained digest must converge to the one-shot fixpoint
    "stream_hits_incremental" -> HitsTradeOracleSql,

    // edge-support peel unrolled to the |E|-bound round count (a
    // converged round is a no-op, so the fixed unroll is exact); each
    // round recomputes supports definitionally on the surviving graph
    "q_ktruss_trade" -> KtrussTradeOracleSql,
    "q_lpa_communities" -> LpaTradeOracleSql,
    "q_graph_stats_trade" -> GraphStatsTradeOracleSql,
    // the maintained digest must reproduce the one-shot topology
    // summary bit for bit — the oracle IS q_graph_stats_trade
    "stream_graphstats_incremental" -> GraphStatsTradeOracleSql,

    // the textbook dominance definition — the engine's chunked
    // two-pass plan must reproduce it exactly
    "q_skyline_orders" -> SkylineOrdersOracleSql,

    // the maintained frontier must converge to the one-shot skyline —
    // same oracle verbatim
    "stream_skyline_incremental" -> SkylineOrdersOracleSql,

    // the maintained top-k must converge to the one-shot ranking —
    // the q_top_orders oracle verbatim
    "stream_topk_incremental" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    // the same degree-ordered wedge closure in SQL: orientation key
    // d*2^32+id, wedges joined on the shared low vertex, closed against
    // the oriented edge set — pure integers throughout
    "q_triangle_count" ->
      """WITH e0 AS (
        |  SELECT DISTINCT
        |    least(CAST(c_nationkey AS BIGINT), CAST(s_nationkey AS BIGINT)) AS u,
        |    greatest(CAST(c_nationkey AS BIGINT), CAST(s_nationkey AS BIGINT)) AS v
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE c_nationkey <> s_nationkey
        |), deg AS (
        |  SELECT node, count(*) AS d FROM (
        |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY 1
        |), ky AS (
        |  SELECT node, d * 4294967296 + node AS k FROM deg
        |), o AS (
        |  SELECT CASE WHEN ku.k < kv.k THEN e0.u ELSE e0.v END AS src,
        |         CASE WHEN ku.k < kv.k THEN e0.v ELSE e0.u END AS dst,
        |         CASE WHEN ku.k < kv.k THEN kv.k ELSE ku.k END AS kdst
        |  FROM e0 JOIN ky ku ON e0.u = ku.node JOIN ky kv ON e0.v = kv.node
        |), w AS (
        |  SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
        |  FROM o o1 JOIN o o2
        |    ON o1.src = o2.src AND o1.kdst < o2.kdst
        |), t AS (
        |  SELECT a, b, c FROM w JOIN o ON w.b = o.src AND w.c = o.dst
        |)
        |SELECT node, count(*) AS n_triangles
        |FROM (SELECT unnest([a, b, c]) AS node FROM t)
        |GROUP BY node""".stripMargin,

    // the SAME statement text, verbatim — dialect-common SQL is its own
    // oracle
    "q_recursive_closure" -> RecursiveClosureSql,
    "q_shortest_path_trade" -> ShortestPathTradeSql,

    // the maintained edge relation must reproduce the one-shot ranks
    // exactly (exact decimal edge merge), so the oracle IS the batch one
    "stream_pagerank_incremental" -> PagerankTradeOracleSql,

    "q_revenue_by_segment" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_revenue_by_nation" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    // exact cent sums, integer cross-multiplied class bands, one
    // double division for the reported share
    "q_pareto_customers" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS rev_cents
        |  FROM orders GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(rev_cents) AS BIGINT) AS total_cents FROM rev
        |), top AS (
        |  SELECT o_custkey, rev_cents FROM rev
        |  ORDER BY rev_cents DESC, o_custkey ASC LIMIT 100
        |), rk AS (
        |  SELECT o_custkey, rev_cents,
        |    CAST(row_number() OVER
        |      (ORDER BY rev_cents DESC, o_custkey ASC) AS BIGINT) AS rank,
        |    CAST(sum(rev_cents) OVER
        |      (ORDER BY rev_cents DESC, o_custkey ASC) AS BIGINT)
        |      AS cum_cents
        |  FROM top
        |)
        |SELECT rank, o_custkey, rev_cents, cum_cents,
        |  CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
        |    AS cum_share,
        |  CASE WHEN cum_cents * 10 <= total_cents * 7 THEN 'A'
        |       WHEN cum_cents * 10 <= total_cents * 9 THEN 'B'
        |       ELSE 'C' END AS abc
        |FROM rk, tot""".stripMargin,

    "q_customer_order_analytics" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  row_number() OVER w AS order_seq,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q_window_breadth" ->
      """SELECT o_orderkey, o_custkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(o_totalprice, 2) OVER w AS second_price,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS sum3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    "q_distinct_users_by_type" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,

    "q_set_ops_users" ->
      """(SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'click'
        | INTERSECT
        | SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase')
        |EXCEPT
        |SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'error'""".stripMargin,

    "q_rollup_balance" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(grouping(event_type) AS INT) AS g_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)),
        |                        (CAST(ts AS DATE)))""".stripMargin,

    "q_cube_events" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(grouping(event_type) AS INT) AS g_type,
        |  CAST(grouping(CAST(ts AS DATE)) AS INT) AS g_day,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY CUBE (event_type, CAST(ts AS DATE))""".stripMargin,

    "q_shipped_within_90d" ->
      """SELECT o_orderpriority, count(*) AS n_lineitems,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS shipped_value
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderpriority""".stripMargin,

    // KM replay: per-user spans, censor rule, at-risk reverse cumsum,
    // then the product ITERATION-SHAPED (one recursive row per
    // duration; 1.0·x = x in IEEE so the first row skips the multiply)
    "q_survival_km" -> SurvivalKmOracleSql,

    // the curve from incrementally-maintained span partials must equal
    // the one-shot curve — identical oracle
    "stream_survival_incremental" -> SurvivalKmOracleSql,

    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), y AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |                 THEN 1 ELSE 0 END AS news
        |  FROM x
        |), z AS (
        |  SELECT *, CAST(sum(news) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM y
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  epoch_us(min(ts)) AS session_start, epoch_us(max(ts)) AS session_end,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM z GROUP BY user_id, session_id""".stripMargin,

    // the same session ids; per-session paths via the ordered
    // string_agg prefix, then the count ranking
    "q_session_paths" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), y AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |                 THEN 1 ELSE 0 END AS news
        |  FROM x
        |), z0 AS (
        |  SELECT *, sum(news) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                            ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM y
        |), z AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, session_id
        |                               ORDER BY ts, event_id) AS step
        |  FROM z0
        |), p AS (
        |  SELECT user_id, session_id,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM z WHERE step <= 5 GROUP BY 1, 2
        |), c AS (
        |  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |  FROM p GROUP BY 1
        |)
        |SELECT path, n_sessions,
        |  CAST(row_number() OVER (ORDER BY n_sessions DESC, path ASC)
        |    AS INT) AS rank
        |FROM c
        |QUALIFY rank <= 10""".stripMargin,

    "q_exact_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90
        |FROM events GROUP BY event_type""".stripMargin,

    // approx aggregates: the oracle recomputes the exact anchors and
    // asserts the engine's bound-check booleans as TRUE literals — the
    // approximation internals stay engine-specific, the CLAIMS about
    // them are hash-gated
    "q_approx_stats" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users_exact,
        |  quantile_cont(value, 0.5) AS p50_exact,
        |  quantile_cont(value, 0.99) AS p99_exact,
        |  TRUE AS users_ok, TRUE AS p50_ok, TRUE AS p99_ok
        |FROM events GROUP BY event_type""".stripMargin,

    // conditional-min stage chain; equal-ts pairs compare strictly on ts
    // alone (same rule as the Spark side)
    // the same (type, level) digest; weights are 1/(1<<level) — dyadic,
    // so the double sum is exact and order-free on both engines
    "q_trending_events" -> TrendingOracleSql,

    // the batch-maintained daily digest must reproduce the one-shot
    // decayed ranking bit for bit — the oracle IS q_trending_events
    "stream_trending_incremental" -> TrendingOracleSql,

    // CUPED replay: per-user cent-exact pre/post sums, the pooled
    // moment row, per-arm means, the identical theta/rho_sq/adjustment
    // double trees
    "q_cuped_readout" ->
      """WITH sp AS (
        |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |  FROM events
        |), per AS (
        |  SELECT user_id,
        |    CAST(coalesce(sum(CASE WHEN CAST(ts AS DATE) <
        |          d0 + CAST(date_diff('day', d0, d1) // 2 AS INT)
        |        THEN CAST(value AS DECIMAL(18,2)) END), 0.00) * 100
        |      AS BIGINT) AS x,
        |    CAST(coalesce(sum(CASE WHEN NOT (CAST(ts AS DATE) <
        |          d0 + CAST(date_diff('day', d0, d1) // 2 AS INT))
        |        THEN CAST(value AS DECIMAL(18,2)) END), 0.00) * 100
        |      AS BIGINT) AS y
        |  FROM events, sp GROUP BY user_id
        |), pa AS (
        |  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |              <= '7' THEN 0 ELSE 1 END AS arm, x, y
        |  FROM per
        |), mo AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM pa
        |), th AS (
        |  SELECT
        |    CASE WHEN n * sxx - sx * sx > 0
        |         THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |              / CAST(n * sxx - sx * sx AS DOUBLE) END AS theta,
        |    CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |         THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |              * CAST(n * sxy - sx * sy AS DOUBLE)
        |              / (CAST(n * sxx - sx * sx AS DOUBLE)
        |                 * CAST(n * syy - sy * sy AS DOUBLE)) END AS rho_sq,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
        |  FROM mo
        |), arms AS (
        |  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(x) AS BIGINT) AS ax, CAST(sum(y) AS BIGINT) AS ay
        |  FROM pa GROUP BY arm
        |)
        |SELECT CAST(arm AS BIGINT) AS arm, n_users,
        |  CAST(ay AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0 AS mean_y,
        |  (CAST(ay AS DOUBLE) / CAST(n_users AS DOUBLE)
        |   - theta * (CAST(ax AS DOUBLE) / CAST(n_users AS DOUBLE) - xbar))
        |    / 100.0 AS mean_y_adj,
        |  theta, rho_sq
        |FROM arms, th""".stripMargin,

    // the same exact conversion counts; the z statistic is the
    // identical double formula tree (p1-p0, pooled, sqrt) so every
    // rounded output is bit-equal
    "q_ab_test" ->
      """WITH per AS (
        |  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |              <= '7' THEN 0 ELSE 1 END AS arm,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
        |                       ELSE 0 END) >= 15 THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY user_id
        |), m AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
        |  FROM per
        |), d AS (
        |  SELECT *, CAST(n0 AS DOUBLE) AS n0d, CAST(n1 AS DOUBLE) AS n1d,
        |    CAST(c0 AS DOUBLE) AS c0d, CAST(c1 AS DOUBLE) AS c1d
        |  FROM m
        |), f AS (
        |  SELECT *, c0d / n0d AS p0x, c1d / n1d AS p1x,
        |    (c0d + c1d) / (n0d + n1d) AS pooled
        |  FROM d
        |), g AS (
        |  SELECT *, (p1x - p0x) / nullif(
        |    sqrt(pooled * (1.0 - pooled) * (1.0 / n0d + 1.0 / n1d)), 0.0)
        |    AS zx
        |  FROM f
        |)
        |SELECT n0, n1, c0, c1, round(p0x, 6) AS p0, round(p1x, 6) AS p1,
        |  round(p1x - p0x, 6) AS lift, round(zx, 6) AS z,
        |  coalesce(abs(zx) > 1.96, false) AS significant
        |FROM g""".stripMargin,

    "q_funnel_steps" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS click_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.view_ts
        |  WHERE e.event_type = 'click' GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS purchase_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.click_ts
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
        |)
        |SELECT v.user_id, epoch_us(v.view_ts) AS view_us,
        |  epoch_us(c.click_ts) AS click_us,
        |  epoch_us(p.purchase_ts) AS purchase_us,
        |  CASE WHEN p.user_id IS NOT NULL THEN 3
        |       WHEN c.user_id IS NOT NULL THEN 2
        |       ELSE 1 END AS stage_reached
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,

    // (user, day) distinct before the cohort join, then the offset matrix
    "q_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        |), cohort AS (
        |  SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY user_id
        |)
        |SELECT c.cohort_day, CAST(ev.d - c.cohort_day AS BIGINT) AS day_offset,
        |  count(*) AS n_users
        |FROM ev JOIN cohort c ON ev.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,

    // the identical lead() window under the (ts, event_id) total order;
    // prob = exact-long counts through one IEEE division on both engines
    "q_event_transitions" ->
      """WITH s AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS n_transitions
        |  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n_transitions,
        |  CAST(n_transitions AS DOUBLE) /
        |    CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE)
        |    AS prob
        |FROM c""".stripMargin,

    // DISTINCT baskets, bounded per-order pair expansion, the identical
    // support/confidence/lift double trees over exact longs
    "q_market_basket" ->
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS item
        |  FROM lineitem
        |), n AS (
        |  SELECT count(DISTINCT okey) AS n_orders FROM baskets
        |), ic AS (
        |  SELECT item, count(*) AS cnt FROM baskets GROUP BY 1
        |), p AS (
        |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_cnt
        |  FROM baskets a JOIN baskets b
        |    ON a.okey = b.okey AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |)
        |SELECT item_a, item_b, pair_cnt, ca.cnt AS cnt_a, cb.cnt AS cnt_b,
        |  CAST(pair_cnt AS DOUBLE) / CAST(n_orders AS DOUBLE) AS support,
        |  CAST(pair_cnt AS DOUBLE) / CAST(ca.cnt AS DOUBLE) AS conf_a_to_b,
        |  CAST(pair_cnt AS DOUBLE) / CAST(cb.cnt AS DOUBLE) AS conf_b_to_a,
        |  CAST(pair_cnt AS DOUBLE) * CAST(n_orders AS DOUBLE) /
        |    (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)) AS lift
        |FROM p
        |JOIN ic ca ON ca.item = p.item_a
        |JOIN ic cb ON cb.item = p.item_b, n""".stripMargin,

    // identical digest + quantile_cont boundaries + comparison trees;
    // DuckDB lists are 1-based where Spark arrays are 0-based
    "q_rfm_segments" ->
      """WITH cust AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS monetary_cents
        |  FROM orders GROUP BY 1
        |), g AS (
        |  SELECT max(last_order) AS maxd FROM cust
        |), base AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', last_order, maxd) AS BIGINT)
        |      AS recency_days,
        |    frequency, monetary_cents
        |  FROM cust, g
        |), b AS (
        |  SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rq,
        |    quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fq,
        |    quantile_cont(monetary_cents, [0.25, 0.5, 0.75]) AS mq
        |  FROM base
        |), scored AS (
        |  SELECT o_custkey, recency_days, frequency, monetary_cents,
        |    4 - CAST(recency_days > rq[1] AS INT)
        |      - CAST(recency_days > rq[2] AS INT)
        |      - CAST(recency_days > rq[3] AS INT) AS r_score,
        |    1 + CAST(frequency > fq[1] AS INT)
        |      + CAST(frequency > fq[2] AS INT)
        |      + CAST(frequency > fq[3] AS INT) AS f_score,
        |    1 + CAST(monetary_cents > mq[1] AS INT)
        |      + CAST(monetary_cents > mq[2] AS INT)
        |      + CAST(monetary_cents > mq[3] AS INT) AS m_score
        |  FROM base, b
        |)
        |SELECT o_custkey, recency_days, frequency, monetary_cents,
        |  r_score, f_score, m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
        |    CAST(m_score AS VARCHAR) AS segment
        |FROM scored""".stripMargin,

    // same payloads; json_valid routes, json path functions extract
    "ing_corrupt_quarantine" ->
      """WITH j AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN '{"id":' || doc_id || ',"lang":"' || lang
        |      ELSE '{"id":' || doc_id || ',"lang":"' || lang ||
        |           '","src":"' || source || '"}' END AS js
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN json_valid(js) THEN 'ok' ELSE 'quarantined' END AS status,
        |  CASE WHEN json_valid(js)
        |       THEN json_extract_string(js, '$.lang') END AS v_lang,
        |  CASE WHEN json_valid(js)
        |       THEN json_extract_string(js, '$.src') END AS v_src
        |FROM j""".stripMargin,

    "q_lateral_topn" ->
      """SELECT o_orderkey, l.l_linenumber, l.l_extendedprice
        |FROM orders, LATERAL (
        |  SELECT l_linenumber, l_extendedprice FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber ASC LIMIT 2) l
        |WHERE o_totalprice > 400000.0""".stripMargin,

    // same JSON built from the same columns, extracted with DuckDB's
    // JSON path functions
    "q_variant_extract" ->
      """WITH j AS (
        |  SELECT doc_id,
        |    '{"id":' || doc_id || ',"lang":"' || lang ||
        |    '","meta":{"src":"' || source || '","n":' || n_chars || '}}'
        |      AS js
        |  FROM documents
        |)
        |SELECT doc_id, json_extract_string(js, '$.lang') AS v_lang,
        |  json_extract_string(js, '$.meta.src') AS v_src,
        |  CAST(json_extract(js, '$.meta.n') AS BIGINT) AS v_n
        |FROM j""".stripMargin,

    // result-identical to the plain join: the bloom filter only prunes
    "q_runtime_filter" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 475000.0
        |GROUP BY l_returnflag""".stripMargin,

    "q_agg_pushdown" ->
      """SELECT count(*) AS n_rows, min(l_orderkey) AS min_okey,
        |  max(l_orderkey) AS max_okey, max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,

    "dq_lineitem_profile" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN NOT coalesce(l_quantity > 0, false) THEN 1 ELSE 0 END) AS BIGINT) AS viol_qty_positive,
        |  CAST(sum(CASE WHEN NOT coalesce(l_extendedprice > 0, false) THEN 1 ELSE 0 END) AS BIGINT) AS viol_price_positive,
        |  CAST(sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 1, false) THEN 1 ELSE 0 END) AS BIGINT) AS viol_discount_unit,
        |  CAST(sum(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), false) THEN 1 ELSE 0 END) AS BIGINT) AS viol_flag_domain
        |FROM lineitem""".stripMargin,

    // exact class-size counts, strict < k
    "dq_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS class_size
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |HAVING count(*) < 10""".stripMargin,

    // same exact bucket counts; the expected-count tree is written out
    // verbatim and the chi2 fold replays as a recursive CTE in bucket
    // order — identical left-fold, identical doubles
    "dq_drift_chi2" -> DqDriftChi2OracleSql,

    // the unbinned KS sibling: exact integer CDF-gap maximum, one
    // closing division, the sqrt-free squared threshold
    "dq_ks_drift" -> KsDriftOracleSql,

    // the KS report over the batch-maintained (d, v, n) digest — the
    // oracle IS dq_ks_drift
    "stream_ks_incremental" -> KsDriftOracleSql,

    // the alarm arm: identical machinery over the +20-shifted current
    // half (x + 0.0 = x in IEEE keeps the reference half bit-untouched)
    "dq_ks_drift_shifted" ->
      """WITH sp AS (
        |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |  FROM events
        |), m AS (
        |  SELECT value + CASE WHEN CAST(ts AS DATE) <
        |        d0 + CAST(date_diff('day', d0, d1) // 2 AS INT)
        |      THEN 0.0 ELSE 20.0 END AS v,
        |    CAST(ts AS DATE) <
        |      d0 + CAST(date_diff('day', d0, d1) // 2 AS INT) AS is_ref
        |  FROM events, sp
        |), g AS (
        |  SELECT v,
        |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM m GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(a) AS BIGINT) AS n_ref,
        |    CAST(sum(b) AS BIGINT) AS n_cur FROM g
        |), w AS (
        |  SELECT CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS ca,
        |    CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cb
        |  FROM g
        |), dm AS (
        |  SELECT max(abs(ca * t.n_cur - cb * t.n_ref)) AS d_num
        |  FROM w, t
        |), base AS (
        |  SELECT t.n_ref, t.n_cur, dm.d_num,
        |    CAST(dm.d_num AS DOUBLE)
        |      / (CAST(t.n_ref AS DOUBLE) * CAST(t.n_cur AS DOUBLE)) AS ks_d
        |  FROM dm, t
        |)
        |SELECT n_ref, n_cur, d_num, ks_d,
        |  ks_d * ks_d * (CAST(n_ref * n_cur AS DOUBLE)
        |                 / CAST(n_ref + n_cur AS DOUBLE)) AS ks_stat,
        |  ks_d * ks_d * (CAST(n_ref * n_cur AS DOUBLE)
        |                 / CAST(n_ref + n_cur AS DOUBLE)) > 1.844164
        |    AS drift_5pct
        |FROM base""".stripMargin,

    // the whole-CDF sibling: Σ (a+b)·d² in HUGEINT (DECIMAL(38,0) on
    // the engine side — both associative-exact), string-path double
    // conversion, identical left-associated denominator product
    "dq_cvm_drift" -> CvmDriftOracleSql(""),

    // the batch-maintained (d, v, n) digest must report the identical
    // statistic — the oracle IS dq_cvm_drift
    "stream_cvm_incremental" -> CvmDriftOracleSql(""),

    // the alarm arm: same machinery over the +20-shifted current half
    "dq_cvm_drift_shifted" -> CvmDriftOracleSql(
      """ + CASE WHEN CAST(ts AS DATE) <
        |        d0 + CAST(date_diff('day', d0, d1) // 2 AS INT)
        |      THEN 0.0 ELSE 20.0 END""".stripMargin),

    // the batch-maintained daily digest must reproduce the one-shot
    // report bit for bit — the oracle IS dq_drift_chi2
    "stream_drift_incremental" -> DqDriftChi2OracleSql,


    // per-candidate distinct-dependent counts over the determinant
    // groups; NULL-free columns make DISTINCT semantics identical
    "dq_functional_deps" -> {
      def one(det: String, dep: String) =
        s"""SELECT '$det' AS determinant, '$dep' AS dependent,
           |  CAST(count(*) AS BIGINT) AS n_keys,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT $det, count(DISTINCT $dep) AS nd
           |      FROM orders GROUP BY 1)""".stripMargin
      Seq(one("o_orderkey", "o_custkey"),
        one("o_custkey", "o_orderstatus"),
        one("o_orderpriority", "o_orderstatus"))
        .mkString("", "\nUNION ALL\n", "")
    },

    // exact class-size + distinct-bucket counts, strict < l
    "dq_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS class_size,
        |  count(DISTINCT CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0)
        |    AS BIGINT)) AS l_distinct
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |HAVING count(DISTINCT CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0)
        |    AS BIGINT)) < 8""".stripMargin,

    // each constraint's good-count replayed as the same exact-long
    // counts; metric = ratio of identical longs, passed = >= on the
    // identical double
    "dq_constraints" -> DqConstraintsOracleSql,

    // the incrementally maintained contract report must CONVERGE to the
    // one-shot validation — same oracle verbatim
    "stream_constraints_incremental" -> DqConstraintsOracleSql,

    // the in-flight observed counters must equal the second-scan profile
    // exact count digest + the identical ratio trees; percentile ↔
    // quantile_cont (the q_exact_percentiles precedent)
    // the trailing-frame integer moments + the identical double z tree;
    // sums feed straight into DOUBLE casts so no HUGEINT surfaces
    "dq_volume_anomaly" -> DqVolumeAnomalyOracleSql,

    // the maintained day-count digest must converge to the one-shot
    // monitor — same oracle verbatim
    "stream_volume_anomaly_incremental" -> DqVolumeAnomalyOracleSql,

    "dq_skew_profile" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS c FROM events GROUP BY 1
        |)
        |SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |  max(c) AS max_key_rows,
        |  quantile_cont(c, 0.99) AS p99_key_rows,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_key_share,
        |  CAST(max(c) AS DOUBLE)
        |    / (CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |    AS skew_factor
        |FROM c""".stripMargin,

    // the nine hardcoded Benford literals repeated verbatim, so the
    // expectation/contribution double trees are operand-identical —
    // the NEGATIVE exemplar: linear-ish prices do not conform
    "dq_benford" ->
      BenfordOracleSql("SELECT l_extendedprice AS amt FROM lineitem"),

    // the POSITIVE exemplar: the squared event value is a
    // multiplicative derived column (squaring doubles the log-spread),
    // which IS Benford-conforming — the small-chi² branch of the same
    // machinery (value >= 1 keeps the decimal's leading char a digit)
    "dq_benford_conforming" ->
      BenfordOracleSql("SELECT CAST(value * value AS DECIMAL(18,6)) " +
        "AS amt FROM events WHERE value >= 1"),

    // per-(pair,hour) moments + the identical z tree; hour() buckets
    // match because both sessions are pinned UTC
    "fx_seasonality" ->
      s"""WITH $RatesCte, u AS (
         |  SELECT ccy_couple, CAST(hour(timestamp) AS INT) AS hour_of_day,
         |    CAST(CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) * 1000
         |         AS BIGINT) AS x
         |  FROM rates
         |), m AS (
         |  SELECT ccy_couple, hour_of_day, count(*) AS n_ticks,
         |    CAST(sum(x) AS DOUBLE) AS s, CAST(sum(x * x) AS DOUBLE) AS ss,
         |    CAST(count(*) AS DOUBLE) AS n
         |  FROM u GROUP BY 1, 2
         |), p AS (
         |  SELECT ccy_couple, hour_of_day, n_ticks, s / n AS mean_milli,
         |    sqrt(greatest(n * ss - s * s, 0.0)
         |         / nullif(n * (n - 1.0), 0.0)) AS sd_milli
         |  FROM m
         |), a AS (
         |  SELECT u.ccy_couple, u.hour_of_day, count(*) AS n_anomalies
         |  FROM u JOIN p USING (ccy_couple, hour_of_day)
         |  WHERE abs((CAST(x AS DOUBLE) - mean_milli)
         |            / nullif(sd_milli, 0.0)) > 3.0
         |  GROUP BY 1, 2
         |)
         |SELECT p.ccy_couple, p.hour_of_day, p.n_ticks, p.mean_milli,
         |  p.sd_milli, coalesce(a.n_anomalies, 0) AS n_anomalies
         |FROM p LEFT JOIN a USING (ccy_couple, hour_of_day)""".stripMargin,

    // moments + z tree replayed; strict > on identical doubles
    "fx_outliers" ->
      s"""WITH $RatesCte, u AS (
         |  SELECT ccy_couple, event_id,
         |    CAST(CAST(CAST(rate AS DECIMAL(18,6)) AS DECIMAL(12,3)) * 1000
         |         AS BIGINT) AS x
         |  FROM rates
         |), m AS (
         |  SELECT ccy_couple, count(*) AS n_ticks,
         |    CAST(sum(x) AS DOUBLE) AS s, CAST(sum(x * x) AS DOUBLE) AS ss,
         |    CAST(count(*) AS DOUBLE) AS n
         |  FROM u GROUP BY 1
         |), j AS (
         |  SELECT u.ccy_couple, u.event_id, u.x,
         |    (CAST(u.x AS DOUBLE) - s / n)
         |      / nullif(sqrt(greatest(n * ss - s * s, 0.0)
         |                    / nullif(n * (n - 1.0), 0.0)), 0.0) AS z
         |  FROM u JOIN m ON u.ccy_couple = m.ccy_couple
         |)
         |SELECT ccy_couple, event_id, x AS rate_milli, z AS z_score
         |FROM j WHERE abs(z) > 3.0""".stripMargin,

    "dq_observe_lineitem" ->
"""SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN NOT coalesce(l_quantity > 0, false) THEN 1 ELSE 0 END) AS BIGINT) AS viol_qty_positive,
        |  CAST(sum(CASE WHEN NOT coalesce(l_extendedprice > 0, false) THEN 1 ELSE 0 END) AS BIGINT) AS viol_price_positive,
        |  CAST(sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 1, false) THEN 1 ELSE 0 END) AS BIGINT) AS viol_discount_unit,
        |  CAST(sum(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), false) THEN 1 ELSE 0 END) AS BIGINT) AS viol_flag_domain
        |FROM lineitem""".stripMargin,

    "q_full_outer_join" ->
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_clicks
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |), p AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT coalesce(c.user_id, p.user_id) AS user_id,
        |       coalesce(c.day, p.day) AS day,
        |       coalesce(n_clicks, 0) AS n_clicks,
        |       coalesce(n_purchases, 0) AS n_purchases
        |FROM c FULL OUTER JOIN p
        |  ON c.user_id = p.user_id AND c.day = p.day""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 250000)""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)""".stripMargin,

    "q_pivot_daily_types" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY CAST(ts AS DATE)""".stripMargin,

    // the quantized range join must equal the naive BETWEEN join
    // the overlap contract: quantized canonical-bucket join ≡ the naive
    // inequality join, one row per qualifying pair
    "q_interval_overlap" ->
      """WITH a AS (
        |  SELECT user_id, CAST(ts AS DATE) AS a_date,
        |    min(ts) AS a_start, max(ts) AS a_end
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |), b AS (
        |  SELECT user_id, CAST(ts AS DATE) AS b_date,
        |    min(ts) AS b_start, max(ts) AS b_end
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2
        |)
        |SELECT a.user_id, a_date, b_date, a_start, a_end, b_start, b_end
        |FROM a JOIN b ON a.user_id = b.user_id
        |WHERE a_start <= b_end AND b_start <= a_end""".stripMargin,

    "q_range_join" ->
      """SELECT p.event_id AS p_event_id, count(*) AS n_clicks,
        |  CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        | AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 6 HOUR
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id""".stripMargin,

    // melt(pivot(x)) minus the fill-in zeros = the plain long-form count
    "q_unpivot_daily_types" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_typed_topk_per_customer" ->
      """WITH r AS (
        |  SELECT o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |)
        |SELECT o_custkey, CAST(rn AS BIGINT) AS rank, o_totalprice AS price
        |FROM r WHERE rn <= 3""".stripMargin,

    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    // the whole KMV sketch replayed value-exactly: xxhash64 chain,
    // unsigned k-min order, estimator double tree (XxhOracleSql)
    "q_kmv_distinct" ->
      graft.oracle.XxhOracleSql.kmvDistinct(k = 64),

    // bins + cumulative walk + the identical interpolation tree; the
    // `- 0.0` keeps the binning operand tree literally aligned
    "q_hist_percentiles" -> HistPercentilesOracleSql,

    // the folded incremental bins must estimate identically
    "stream_hist_incremental" -> HistPercentilesOracleSql,

    // the register table replayed: hashLong in HUGEINT, top-p routing,
    // bin()-based clz rank, max per register
    "q_hll_registers" -> graft.oracle.XxhOracleSql.hllRegisters(p = 8),
    // the maintained registers must equal the one-shot table
    "stream_hll_incremental" -> graft.oracle.XxhOracleSql.hllRegisters(p = 8),
    "q_hll_grouped" -> graft.oracle.XxhOracleSql.hllRegistersPerGroup(p = 8),

    // the same digest fan-out + exact distinct count over the explicit
    // calendar grid (quiet windows emit 0, never a missing row)
    "q_rolling_dau" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), g AS (
        |  SELECT user_id, day + CAST(i AS INTEGER) AS w_day
        |  FROM d CROSS JOIN range(0, 7) t(i)
        |), s AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |cnts AS (
        |  SELECT w_day, count(DISTINCT user_id) AS c FROM g GROUP BY 1
        |), cal AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |    AS day
        |  FROM s
        |)
        |SELECT day, coalesce(c, 0) AS dau_7d
        |FROM cal LEFT JOIN cnts ON cnts.w_day = cal.day""".stripMargin,

    // the per-group sketch replay: same hash chain, k-min and estimator
    // QUALIFYed per group (XxhOracleSql)
    "q_kmv_grouped" ->
      graft.oracle.XxhOracleSql.kmvDistinctPerGroup(k = 64,
        keySql = """SELECT event_type AS grp, user_id * 100000
                    + datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS key FROM events""",
        groupOut = "event_type"),

    // both sketches + the union sketch + the set-algebra estimator
    // trees replayed value-exactly (XxhOracleSql)
    "q_kmv_set_algebra" ->
      graft.oracle.XxhOracleSql.kmvSetAlgebra(k = 64,
        aKeySql = """SELECT user_id * 100000
                     + datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                     AS key FROM events WHERE event_type = 'click'""",
        bKeySql = """SELECT user_id * 100000
                     + datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                     AS key FROM events WHERE event_type = 'purchase'"""),

    // the whole CMS replayed value-exactly: seeded hash chains, cell
    // addressing, min-over-rows estimate (XxhOracleSql)
    "q_cms_heavy_hitters" ->
      graft.oracle.XxhOracleSql.cmsHeavyHitters(w = 64),

    // identical md5-prefix sample + quantile_cont interpolation
    "q_sampled_percentiles" ->
      """SELECT event_type, count(*) AS n_sampled,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.99) AS p99
        |FROM events
        |WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '1a'
        |GROUP BY event_type""".stripMargin,

    "q_asof_join" ->
      """SELECT p.user_id, p.ts, p.event_id, c.value AS last_click_value
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |                WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    // daily grid × pairs, day-end ASOF fill; pre-first-quote days null
    "fx_resample_ffill" ->
      s"""WITH $RatesCte, span AS (
         |  SELECT min(CAST("timestamp" AS DATE)) AS d0,
         |         max(CAST("timestamp" AS DATE)) AS d1
         |  FROM rates
         |), grid AS (
         |  SELECT p.ccy_couple,
         |         CAST(unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY))
         |              AS DATE) AS day
         |  FROM (SELECT DISTINCT ccy_couple FROM rates) p, span s
         |)
         |SELECT g.ccy_couple, g.day, r.rate AS rate_ffill
         |FROM (SELECT ccy_couple, day,
         |        CAST(day AS TIMESTAMP) + INTERVAL 1 DAY
         |          - INTERVAL 1 MICROSECOND AS pt
         |      FROM grid) g
         |ASOF LEFT JOIN
         |  (SELECT ccy_couple AS r_pair, "timestamp" AS rts, rate
         |   FROM rates) r
         |  ON g.ccy_couple = r.r_pair AND g.pt >= r.rts""".stripMargin,

    // DuckDB ASOF with the inequality flipped is the forward direction
    "q_asof_forward" ->
      """SELECT p.user_id, p.ts, p.event_id, c.value AS next_click_value
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |                WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts <= c.ts""".stripMargin,

    // nearest = closer of the two ASOF directions within tolerance
    // (1h = 3600000000 us), equal distance resolving backward
    "q_asof_nearest" ->
      """WITH p AS (SELECT user_id, event_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'click'),
        |b AS (SELECT p.user_id, p.event_id, p.ts, c.ts AS bt, c.value AS bv
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND p.ts >= c.ts),
        |f AS (SELECT p.user_id, p.event_id, c.ts AS ft, c.value AS fv
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND p.ts <= c.ts)
        |SELECT b.user_id, b.ts, b.event_id,
        |  CASE WHEN b.bt IS NOT NULL
        |            AND epoch_us(b.ts) - epoch_us(b.bt) <= 3600000000
        |            AND (f.ft IS NULL
        |                 OR epoch_us(f.ft) - epoch_us(b.ts) > 3600000000
        |                 OR epoch_us(b.ts) - epoch_us(b.bt)
        |                    <= epoch_us(f.ft) - epoch_us(b.ts))
        |       THEN b.bv
        |       WHEN f.ft IS NOT NULL
        |            AND epoch_us(f.ft) - epoch_us(b.ts) <= 3600000000
        |       THEN f.fv
        |  END AS nearest_click_value
        |FROM b JOIN f ON b.user_id = f.user_id AND b.event_id = f.event_id""".stripMargin,

    "text_stats" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subwords,
        |  length(text) AS n_chars_measured,
        |  len(regexp_extract_all(text, '[\.,;:!?]')) AS n_punct,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
        |    / nullif(length(text), 0) AS alpha_ratio
        |FROM documents""".stripMargin,

    // the identical integer floor-division tree (`//` mirrors `div`);
    // every intermediate is positive, so floor == truncation on both
    "text_readability" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, n_words, n_sentences, n_syllables,
        |    CAST(((390 * n_words) // n_sentences)
        |      + ((11800 * n_syllables) // n_words) - 15590 AS BIGINT)
        |      AS fk_grade_milli
        |  FROM t WHERE n_words > 0
        |)
        |SELECT doc_id, n_words, n_sentences, n_syllables, fk_grade_milli,
        |  CASE WHEN fk_grade_milli < 6000 THEN 'elementary'
        |       WHEN fk_grade_milli < 9000 THEN 'middle'
        |       WHEN fk_grade_milli < 13000 THEN 'high_school'
        |       ELSE 'college' END AS band
        |FROM g""".stripMargin,

    // one plain row_number replays the two-pass distributed rank; the
    // stage is the identical integer floor division
    "cur_curriculum_stages" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    CAST(((390 * n_words) // n_sentences)
        |      + ((11800 * n_syllables) // n_words) - 15590 AS BIGINT)
        |      AS fk_grade_milli
        |  FROM t WHERE n_words > 0
        |), r AS (
        |  SELECT doc_id, fk_grade_milli,
        |    row_number() OVER (ORDER BY fk_grade_milli, doc_id) AS rank,
        |    count(*) OVER () AS n
        |  FROM g
        |)
        |SELECT doc_id, fk_grade_milli, CAST(rank AS BIGINT) AS rank,
        |  CASE ((rank - 1) * 4) // n
        |    WHEN 0 THEN 's1_simple' WHEN 1 THEN 's2_moderate'
        |    WHEN 2 THEN 's3_advanced' ELSE 's4_complex' END AS stage
        |FROM r""".stripMargin,

    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS toks,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
        |      / nullif(length(text), 0) AS alpha,
        |    CAST(len(regexp_extract_all(text, '[\.,;:!?]')) AS DOUBLE) AS punct,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '\b(the|a|of|and|to|in|is|it|for|on)\b')) AS DOUBLE) AS stop
        |  FROM documents
        |)
        |SELECT doc_id, lang,
        |  0.4 * alpha + 0.3 * least(toks / 100.0, 1.0)
        |    + 0.2 * (1.0 - least(punct / toks, 1.0))
        |    + 0.1 * least((stop / toks) * 5.0, 1.0) AS quality
        |FROM t""".stripMargin,

    // integer counts + single integer-ratio divisions, so every rule
    // boolean is bit-identical across engines
    "text_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS BIGINT) AS n_words,
        |    CAST(length(regexp_replace(trim(text), '\s+', '', 'g'))
        |      AS DOUBLE) / len(tk) AS mean_word_len,
        |    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
        |      / len(tk) AS symbol_ratio,
        |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS DOUBLE) / len(tk) AS alpha_word_frac,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '\b(the|a|of|and|to|in|is|it|for|on)\b')) AS BIGINT)
        |      AS n_stopwords
        |  FROM t
        |)
        |SELECT *,
        |  n_words BETWEEN 50 AND 100000 AS r_words,
        |  mean_word_len BETWEEN 3.0 AND 10.0 AS r_word_len,
        |  symbol_ratio <= 0.1 AS r_symbol,
        |  alpha_word_frac >= 0.8 AS r_alpha,
        |  n_stopwords >= 2 AS r_stopwords,
        |  (n_words BETWEEN 50 AND 100000) AND
        |    (mean_word_len BETWEEN 3.0 AND 10.0) AND
        |    symbol_ratio <= 0.1 AND alpha_word_frac >= 0.8 AND
        |    n_stopwords >= 2 AS passes
        |FROM m""".stripMargin,

    // the replace-length occurrence identity and 1-based strpos replay
    // the exact, regex-free substring semantics
    "text_canary_scan" -> {
      val canaryRows = graft.text.TextFunctions.DefaultCanaries.zipWithIndex
        .map { case (c, i) =>
          val lit = c.replace("'", "''")
          s"(CAST($i AS BIGINT), '$lit')"
        }.mkString(", ")
      s"""WITH c(canary_id, canary) AS (VALUES $canaryRows),
         |h AS (
         |  SELECT d.doc_id, c.canary_id, c.canary,
         |    CAST((length(d.text) - length(replace(d.text, c.canary, '')))
         |      // length(c.canary) AS BIGINT) AS n_hits,
         |    CAST(strpos(d.text, c.canary) AS BIGINT) AS first_pos
         |  FROM documents d CROSS JOIN c
         |)
         |SELECT * FROM h WHERE n_hits > 0""".stripMargin
    },

    // integer word/subword/char sums per language; both ratios are one
    // IEEE division of exact longs
    "cur_token_fertility" ->
      """WITH t AS (
        |  SELECT lang,
        |    len(string_split_regex(trim(text), '\s+')) AS w,
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |      AS sw,
        |    length(text) AS ch
        |  FROM documents
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS n_words,
        |  CAST(sum(sw) AS BIGINT) AS n_subwords,
        |  CAST(sum(ch) AS BIGINT) AS n_chars,
        |  CAST(sum(sw) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS fertility,
        |  CAST(sum(ch) AS DOUBLE) / CAST(sum(sw) AS DOUBLE)
        |    AS chars_per_subword
        |FROM t GROUP BY lang""".stripMargin,

    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b')) AS s_en,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) AS s_de,
        |    len(regexp_extract_all(lower(text), '\b(el|la|los|y|es)\b')) AS s_es,
        |    len(regexp_extract_all(lower(text), '\b(le|les|et|est|une)\b')) AS s_fr,
        |    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS s_zh
        |  FROM documents
        |)
        |SELECT doc_id, labeled_lang, s_en, s_de, s_es, s_fr, s_zh,
        |  CASE WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
        |       WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
        |       WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |       WHEN s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS predicted_lang
        |FROM t""".stripMargin,

    // the oracle affords the unnest+GROUP BY formulation at test scale;
    // the Spark side is a per-row sorted fold (mode = longest run in the
    // sorted token array) — same integer counts, same single double
    // division, bit-identical fractions
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), wc AS (
        |  SELECT doc_id, w, count(*) AS c
        |  FROM (SELECT doc_id, unnest(tk) AS w FROM t) GROUP BY doc_id, w
        |), wa AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         max(c) AS top_word, count(*) AS n_distinct
        |  FROM wc GROUP BY doc_id
        |), bc AS (
        |  SELECT doc_id, b, count(*) AS c
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
        |          i -> tk[i] || ' ' || tk[i + 1])) AS b FROM t)
        |  GROUP BY doc_id, b
        |), ba AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |         max(c) AS top_bigram
        |  FROM bc GROUP BY doc_id
        |)
        |SELECT wa.doc_id, wa.n_tokens,
        |  coalesce(ba.n_bigrams, 0) AS n_bigrams,
        |  1.0 - CAST(wa.n_distinct AS DOUBLE) / wa.n_tokens AS dup_word_frac,
        |  CAST(wa.top_word AS DOUBLE) / wa.n_tokens AS top_word_frac,
        |  CAST(ba.top_bigram AS DOUBLE) / ba.n_bigrams AS top_bigram_frac,
        |  NOT (1.0 - CAST(wa.n_distinct AS DOUBLE) / wa.n_tokens > 0.55
        |       OR CAST(ba.top_bigram AS DOUBLE) / ba.n_bigrams > 0.05)
        |    AS gopher_keep
        |FROM wa LEFT JOIN ba USING (doc_id)""".stripMargin,

    // per-doc fraction of DISTINCT word trigrams appearing in >= 5 docs;
    // boiler_frac = exact-integer double division, identical both engines
    "text_boilerplate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE text IS NOT NULL
        |), s0 AS (
        |  SELECT doc_id,
        |    [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |     for i in range(1, len(tk)-1)] AS shs
        |  FROM t
        |), sh AS (
        |  SELECT DISTINCT doc_id, sh
        |  FROM (SELECT doc_id, unnest(shs) AS sh FROM s0)
        |), f AS (
        |  SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
        |  WHERE df >= 5
        |)
        |SELECT d.doc_id, count(*) AS n_shingles,
        |  count(f.sh) AS n_boiler,
        |  CAST(count(f.sh) AS DOUBLE) / count(*) AS boiler_frac
        |FROM sh d LEFT JOIN f ON f.sh = d.sh
        |GROUP BY d.doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin,

    "dedup_exact" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents
        |), c AS (
        |  SELECT fp, count(*) AS cluster_size, min(doc_id) AS keeper_id
        |  FROM f GROUP BY fp
        |)
        |SELECT doc_id, fp, cluster_size, doc_id = keeper_id AS is_keeper
        |FROM f JOIN c USING (fp)""".stripMargin,

    // Bloom membership checked DEFINITIONALLY: a probe hits iff its bit
    // position appears in the reference half's position set — the bitset
    // the engine broadcasts is just that membership structure, so no
    // bit-word replay is needed; hashes are positive-BIGINT hex-slice
    // double hashing (largest intermediate < 2^63 — nothing wraps)
    "dedup_bloom_prefilter" -> BloomPrefilterOracleSql,

    // the bit_or-folded partial digest must probe identically to the
    // one-shot filter — the oracle IS dedup_bloom_prefilter
    "stream_bloom_incremental" -> BloomPrefilterOracleSql,

    "dedup_ngram_jaccard" ->
      s"""WITH $NgramCappedCtes
         |SELECT a.lang, a.source, a.doc_id, b.doc_id AS nb_id,
         |  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jaccard
         |FROM db a JOIN db b ON a.lang = b.lang AND a.source = b.source
         |                   AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |    / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.15""".stripMargin,

    // PPJoin is exact and lossless, so the oracle is the naive global
    // all-pairs join at the same threshold (9i >= 4(a+b) <=> J >= 0.8) —
    // the prefix/length/positional filters must not lose a single pair
    "dedup_ppjoin" -> PpjoinPairsSql,
    // the incrementally-maintained similarity-join index must converge
    // to the one-shot lossless pair set — identical oracle
    "stream_ppjoin_incremental" -> PpjoinPairsSql,

    // the containment variant: directional naive all-pairs at
    // 10i >= 9·|a| — again lossless, again pair-for-pair
    "dedup_containment" -> ContainmentSql,
    // the incrementally-maintained containment index must converge to
    // the one-shot directional join — identical oracle
    "stream_containment_incremental" -> ContainmentSql,

    // recall measurements: the oracle replays the capped candidate
    // generation (XXH64 and all) and counts the exact-Jaccard>=0.8 pairs
    // it misses — the same number the Spark side reports, at any sf
    "dedup_minhash_recall" ->
      graft.oracle.XxhOracleSql.minhashRecall(NgramCappedCtes, ExactPairsSelect),
    "dedup_simhash_recall" ->
      graft.oracle.XxhOracleSql.simhashRecall(NgramCappedCtes, ExactPairsSelect),

    // full value-checked replays of the seeded-signature near-dup
    // reports: Spark's XXH64 (byte-string + hashLong/hashInt + the
    // multi-arg fold) re-implemented in single-statement DuckDB SQL over
    // HUGEINT mod-2^64 arithmetic — see graft.oracle.XxhOracleSql
    "dedup_minhash_lsh" -> graft.oracle.XxhOracleSql.minhashLsh(),
    // the incrementally-maintained index must converge to the one-shot
    // batch report — identical oracle to dedup_minhash_lsh
    "stream_neardup_incremental" -> graft.oracle.XxhOracleSql.minhashLsh(),

    // the maintained sketch must equal the one-shot sketch, bit for bit
    "stream_kmv_incremental" ->
      graft.oracle.XxhOracleSql.kmvDistinct(k = 64),

    // the maintained cell table must reproduce the one-shot estimates
    "stream_cms_incremental" ->
      graft.oracle.XxhOracleSql.cmsHeavyHitters(w = 64),

    // the maintained vocabulary must equal the one-shot top-k
    "stream_vocab_incremental" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 100""".stripMargin,

    // the maintained join view must equal the one-shot join+aggregate
    "stream_mv_join_incremental" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "dedup_simhash" -> graft.oracle.XxhOracleSql.simhashReport(),

    // connected components of the 0.5-Jaccard pair graph, replayed with
    // a recursive CTE: label = min doc_id over the transitive closure
    "dedup_clusters" ->
      s"""WITH RECURSIVE $NgramCappedCtes, pr AS (
         |  SELECT a.doc_id AS src, b.doc_id AS dst FROM db a JOIN db b
         |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.5
         |), ed AS (
         |  SELECT src, dst FROM pr UNION SELECT dst, src FROM pr
         |), reach(id, label) AS (
         |  SELECT DISTINCT src, src FROM ed
         |  UNION
         |  SELECT ed.src, r.label FROM ed JOIN reach r ON ed.dst = r.id
         |), comp AS (
         |  SELECT id, min(label) AS cluster_id FROM reach GROUP BY id
         |), cs AS (
         |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id
         |)
         |SELECT comp.id AS doc_id, comp.cluster_id, cs.cluster_size
         |FROM comp JOIN cs USING (cluster_id)""".stripMargin,

    // the cluster replay above + the text_quality formula, then a
    // per-cluster argmax (quality DESC, doc_id ASC); nulls pinned last
    // via coalesce(quality, -1) on BOTH engines
    "dedup_canonical_keeper" ->
      (s"""WITH RECURSIVE $NgramCappedCtes, pr AS (
         |  SELECT a.doc_id AS src, b.doc_id AS dst FROM db a JOIN db b
         |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.5
         |), ed AS (
         |  SELECT src, dst FROM pr UNION SELECT dst, src FROM pr
         |), reach(id, label) AS (
         |  SELECT DISTINCT src, src FROM ed
         |  UNION
         |  SELECT ed.src, r.label FROM ed JOIN reach r ON ed.dst = r.id
         |), comp AS (
         |  SELECT id, min(label) AS cluster_id FROM reach GROUP BY id
         |), cs AS (
         |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id
         |), m AS (
         |  SELECT comp.cluster_id, cs.cluster_size, comp.id AS doc_id,
         |    documents.text AS text
         |  FROM comp JOIN cs USING (cluster_id)
         |       JOIN documents ON documents.doc_id = comp.id
         |)""".stripMargin +
      """, q AS (
        |  SELECT cluster_id, cluster_size, doc_id,
        |    0.4 * (CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
        |             / nullif(length(text), 0))
        |    + 0.3 * least(CAST(len(string_split_regex(trim(text), '\s+'))
        |                       AS DOUBLE) / 100.0, 1.0)
        |    + 0.2 * (1.0 - least(
        |        CAST(len(regexp_extract_all(text, '[\.,;:!?]')) AS DOUBLE)
        |          / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE),
        |        1.0))
        |    + 0.1 * least(
        |        (CAST(len(regexp_extract_all(lower(text),
        |           '\b(the|a|of|and|to|in|is|it|for|on)\b')) AS DOUBLE)
        |          / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE))
        |        * 5.0, 1.0) AS quality
        |  FROM m
        |)
        |SELECT cluster_id, doc_id AS keeper_doc_id, quality AS keeper_quality,
        |  cluster_size, cluster_size - 1 AS n_dropped
        |FROM q
        |QUALIFY row_number() OVER (PARTITION BY cluster_id
        |  ORDER BY coalesce(quality, -1.0) DESC, doc_id ASC) = 1""".stripMargin),

    // deletion-neighborhood replay + INDEPENDENT levenshtein verify (the
    // blocking's ED<=1 completeness is a theorem — substitution: both
    // sides drop position i; indel: the shorter IS a variant of the
    // longer — and is additionally brute-force-pinned in FuzzyJoinSpec)
    "dedup_fuzzy_keys" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |v AS (
        |  SELECT id, name, unnest(list_prepend(name,
        |    list_transform(range(1, length(name) + 1),
        |      i -> substr(name, 1, i - 1) ||
        |           substr(name, i + 1, length(name))))) AS var
        |  FROM c
        |)
        |SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |FROM v a JOIN v b ON a.var = b.var AND a.id < b.id
        |WHERE levenshtein(a.name, b.name) <= 1""".stripMargin,

    // the evolved-history read recomputed from generation membership
    // (doc_id % 3): nulls exactly where the generation's schema lacked
    // the column
    "ing_schema_evolution" ->
      """SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source,
        |  CAST(NULL AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id % 3 = 0
        |UNION ALL
        |SELECT doc_id, lang, source, CAST(NULL AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id % 3 = 1
        |UNION ALL
        |SELECT doc_id, lang, source, n_chars
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,

    // envelope replay collapses to a relational definition: every
    // non-deleted key survives with the after-image price (+1000 on all
    // non-deletes — inserts carry the updated image too)
    "ing_cdc_envelope" ->
      """SELECT o_orderkey, o_custkey,
        |  o_totalprice + 1000.0 AS o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderkey % 10 <> 0""".stripMargin,

    // the round-trip must be lossless: aggregate straight off parquet
    "ing_orc_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  min(ts) AS min_ts, max(ts) AS max_ts
        |FROM events GROUP BY event_type""".stripMargin,

    // anchor-diagonal replay: the oracle joins on the shingle STRING
    // where the engine joins on its xxhash64 (the ngram-Jaccard
    // precedent — a 64-bit collision would need ~10^10 anchors to reach
    // 1e-7 odds); cap, diagonal islands, and span arithmetic identical
    "dedup_substring" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(range(0, greatest(len(tk) - 7, 0))) AS pos, tk
        |  FROM t WHERE len(tk) >= 8
        |), sa AS (
        |  SELECT doc_id, pos,
        |    array_to_string(list_slice(tk, pos + 1, pos + 8), ' ') AS a
        |  FROM sh
        |), ok AS (
        |  SELECT a FROM sa GROUP BY a HAVING count(*) <= 50
        |), sc AS (
        |  SELECT sa.doc_id, sa.pos, sa.a FROM sa JOIN ok USING (a)
        |), m AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.pos AS pa, y.pos AS pb
        |  FROM sc x JOIN sc y ON x.a = y.a AND x.doc_id < y.doc_id
        |), isl AS (
        |  SELECT doc_a, doc_b, pa, pb, pa - pb AS diag,
        |    pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
        |                            ORDER BY pa) AS grp
        |  FROM m
        |)
        |SELECT doc_a, doc_b,
        |  CAST(min(pa) AS BIGINT) AS a_start,
        |  CAST(min(pb) AS BIGINT) AS b_start,
        |  CAST(max(pa) - min(pa) + 8 AS BIGINT) AS span_tokens
        |FROM isl GROUP BY doc_a, doc_b, diag, grp
        |HAVING max(pa) - min(pa) + 8 >= 12""".stripMargin,

    "cur_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'""".stripMargin,

    "cur_train_val_test" ->
      """SELECT doc_id,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    "cur_group_split" ->
      """WITH x AS (
        |  SELECT lang, source,
        |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
        |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
        |         ELSE 'test' END AS doc_split,
        |    CASE WHEN substring(md5(source), 1, 1) <= 'b' THEN 'train'
        |         WHEN substring(md5(source), 1, 1) <= 'd' THEN 'val'
        |         ELSE 'test' END AS group_split
        |  FROM documents
        |)
        |SELECT lang, source, count(*) AS n_docs,
        |  count(DISTINCT doc_split) AS n_splits_doc_level,
        |  count(DISTINCT group_split) AS n_splits_group_level,
        |  min(group_split) AS group_split
        |FROM x GROUP BY 1, 2""".stripMargin,

    "cur_source_quota" ->
      """SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang, source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 50""".stripMargin,

    "cur_redact_pii" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\d{3}[- ]\d{3,4}[- ]\d{4}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\d{3}[- ]\d{3,4}[- ]\d{4}', '<PHONE>', 'g')) AS redacted_fp
        |FROM documents""".stripMargin,

    "cur_pack_sequences" ->
      """SELECT doc_id, lang, n_tokens,
        |  CAST(floor(start_tok / 512.0) AS BIGINT) AS pack_id
        |FROM (
        |  SELECT doc_id, lang, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
        |  FROM (SELECT doc_id, lang,
        |          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |        FROM documents))""".stripMargin,

    // chunk starts = range(0, n_tokens, 48), identical to Spark's
    // sequence(0, n−1, 48); list_slice is 1-based-inclusive = slice
    "cur_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE len(string_split_regex(trim(text), '\s+')) >= 2
        |), b AS (
        |  SELECT doc_id, unnest(range(0, len(tk) - 1)) AS pos, tk FROM t
        |), bg AS (
        |  SELECT doc_id, pos, tk[pos + 1] AS w1, tk[pos + 2] AS w2 FROM b
        |), c2 AS (
        |  SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY w1, w2
        |), c1 AS (
        |  SELECT w1, count(*) AS n1 FROM bg GROUP BY w1
        |), pr AS (
        |  SELECT doc_id, pos, CAST(n2 AS DOUBLE) / n1 AS p
        |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |), l AS (
        |  SELECT doc_id, list(p ORDER BY pos) AS ps FROM pr GROUP BY doc_id
        |)
        |SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_bigrams,
        |  round(list_reduce(list_prepend(0.0, ps), (a, x) -> a + x)
        |        / len(ps), 6) AS lm_score
        |FROM l""".stripMargin,

    // train counts on the even half, eval bigrams LEFT-joined so the
    // CASE takes the backoff arm exactly when the bigram is unseen
    "cur_backoff_lm" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), bt AS (
        |  SELECT unnest(range(0, len(tk) - 1)) AS pos, tk
        |  FROM t WHERE doc_id % 2 = 0 AND len(tk) >= 2
        |), bgt AS (
        |  SELECT tk[pos + 1] AS w1, tk[pos + 2] AS w2 FROM bt
        |), c2 AS (
        |  SELECT w1, w2, count(*) AS n2 FROM bgt GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w1, count(*) AS n1 FROM bgt GROUP BY 1
        |), u1 AS (
        |  SELECT u.w AS w2, count(*) AS nu
        |  FROM t, unnest(t.tk) AS u(w) WHERE doc_id % 2 = 0 GROUP BY 1
        |), nt AS (
        |  SELECT count(*) AS ntok
        |  FROM t, unnest(t.tk) AS u(w) WHERE doc_id % 2 = 0
        |), be AS (
        |  SELECT doc_id, unnest(range(0, len(tk) - 1)) AS pos, tk
        |  FROM t WHERE doc_id % 2 = 1 AND len(tk) >= 2
        |), bge AS (
        |  SELECT doc_id, pos, tk[pos + 1] AS w1, tk[pos + 2] AS w2 FROM be
        |), pr AS (
        |  SELECT g.doc_id, g.pos,
        |    CASE WHEN c2.n2 IS NOT NULL THEN CAST(c2.n2 AS DOUBLE) / c1.n1
        |         ELSE 0.4 * CAST(coalesce(u1.nu, 0) AS DOUBLE) / nt.ntok
        |    END AS p
        |  FROM bge g
        |  LEFT JOIN c2 ON c2.w1 = g.w1 AND c2.w2 = g.w2
        |  LEFT JOIN c1 ON c1.w1 = g.w1
        |  LEFT JOIN u1 ON u1.w2 = g.w2
        |  CROSS JOIN nt
        |), l AS (
        |  SELECT doc_id, list(p ORDER BY pos) AS ps FROM pr GROUP BY 1
        |)
        |SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_bigrams,
        |  round(list_reduce(list_prepend(0.0, ps), (a, x) -> a + x)
        |        / len(ps), 6) AS backoff_score
        |FROM l""".stripMargin,

    // same held-out split; the KN tree mirrored term for term — the
    // discounted-ML CASE, then + (D·t1/n1)·(nc/nb); unseen context
    // takes the continuation probability alone
    "cur_kneser_ney" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), bt AS (
        |  SELECT unnest(range(0, len(tk) - 1)) AS pos, tk
        |  FROM t WHERE doc_id % 2 = 0 AND len(tk) >= 2
        |), bgt AS (
        |  SELECT tk[pos + 1] AS w1, tk[pos + 2] AS w2 FROM bt
        |), c2 AS (
        |  SELECT w1, w2, count(*) AS n2 FROM bgt GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w1, count(*) AS n1, count(DISTINCT w2) AS t1
        |  FROM bgt GROUP BY 1
        |), cont AS (
        |  SELECT w2, count(DISTINCT w1) AS nc FROM bgt GROUP BY 1
        |), nb AS (
        |  SELECT count(*) AS nb FROM (SELECT DISTINCT w1, w2 FROM bgt)
        |), be AS (
        |  SELECT doc_id, unnest(range(0, len(tk) - 1)) AS pos, tk
        |  FROM t WHERE doc_id % 2 = 1 AND len(tk) >= 2
        |), bge AS (
        |  SELECT doc_id, pos, tk[pos + 1] AS w1, tk[pos + 2] AS w2 FROM be
        |), pr AS (
        |  SELECT g.doc_id, g.pos,
        |    CASE WHEN c1.n1 IS NOT NULL THEN
        |      CASE WHEN c2.n2 IS NOT NULL
        |           THEN (CAST(c2.n2 AS DOUBLE) - 0.75) / CAST(c1.n1 AS DOUBLE)
        |           ELSE 0.0 END
        |      + (0.75 * CAST(c1.t1 AS DOUBLE) / CAST(c1.n1 AS DOUBLE))
        |        * (CAST(coalesce(cont.nc, 0) AS DOUBLE) / CAST(nb.nb AS DOUBLE))
        |    ELSE CAST(coalesce(cont.nc, 0) AS DOUBLE) / CAST(nb.nb AS DOUBLE)
        |    END AS p
        |  FROM bge g
        |  LEFT JOIN c2 ON c2.w1 = g.w1 AND c2.w2 = g.w2
        |  LEFT JOIN c1 ON c1.w1 = g.w1
        |  LEFT JOIN cont ON cont.w2 = g.w2
        |  CROSS JOIN nb
        |), l AS (
        |  SELECT doc_id, list(p ORDER BY pos) AS ps FROM pr GROUP BY 1
        |)
        |SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_bigrams,
        |  round(list_reduce(list_prepend(0.0, ps), (a, x) -> a + x)
        |        / len(ps), 6) AS kn_score
        |FROM l""".stripMargin,

    // the greedy span fold replayed ITERATION-SHAPED (one recursive-CTE
    // state row per position — never a list_reduce with correlated
    // VARCHAR accumulators); coins, sentinels, and both reconstructions
    // byte-exact
    "cur_span_corruption" ->
      """WITH RECURSIVE dw AS (
        |  SELECT doc_id, string_split(nt, ' ') AS words,
        |    len(string_split(nt, ' ')) AS n
        |  FROM (SELECT doc_id,
        |          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
        |        FROM documents WHERE text IS NOT NULL)
        |  WHERE length(nt) > 0
        |), seg AS (
        |  SELECT doc_id, words, n, 0 AS pos, 1 AS nf, 0 AS k, 0 AS m,
        |    CAST('' AS VARCHAR) AS inp, CAST('' AS VARCHAR) AS tgt
        |  FROM dw
        |  UNION ALL
        |  SELECT doc_id, words, n, pos + 1,
        |    CASE WHEN pos + 1 < nf THEN nf
        |         WHEN coin THEN pos + 4 ELSE nf END,
        |    CASE WHEN pos + 1 < nf THEN k
        |         WHEN coin THEN k + 1 ELSE k END,
        |    CASE WHEN pos + 1 < nf OR coin THEN m + 1 ELSE m END,
        |    CASE WHEN pos + 1 < nf THEN inp
        |         WHEN coin THEN inp || ' <X' || CAST(k AS VARCHAR) || '>'
        |         ELSE inp || ' ' || words[pos + 1] END,
        |    CASE WHEN pos + 1 < nf
        |           THEN tgt || ' ' || words[pos + 1]
        |         WHEN coin
        |           THEN tgt || ' <X' || CAST(k AS VARCHAR) || '> '
        |                || words[pos + 1]
        |         ELSE tgt END
        |  FROM (SELECT *,
        |          substring(md5(CAST(doc_id AS VARCHAR) || ':'
        |            || CAST(pos + 1 AS VARCHAR)), 1, 1) = '0' AS coin
        |        FROM seg WHERE pos < n)
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(k AS BIGINT) AS n_spans, CAST(m AS BIGINT) AS n_masked,
        |  md5(ltrim(inp)) AS input_fp, md5(ltrim(tgt)) AS target_fp
        |FROM seg WHERE pos = n""".stripMargin,

    // the hash coin, the two 15-hex cut points (the Bloom slice fold),
    // and the PSM bytes rebuilt verbatim; fingerprints must match
    "cur_fim_split" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS l,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents WHERE text IS NOT NULL
        |), c AS (
        |  SELECT doc_id, text, l,
        |    (CAST(strpos('0123456789abcdef', substring(h, 1, 1)) - 1
        |       AS INTEGER) < 8) AS applied,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(2, 17), j ->
        |        CAST(strpos('0123456789abcdef', substring(h, CAST(j AS INT), 1))
        |          - 1 AS BIGINT))), (a, x) -> 16 * a + x)
        |      % (l + 1) AS p1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(17, 32), j ->
        |        CAST(strpos('0123456789abcdef', substring(h, CAST(j AS INT), 1))
        |          - 1 AS BIGINT))), (a, x) -> 16 * a + x)
        |      % (l + 1) AS p2
        |  FROM d
        |), s AS (
        |  SELECT doc_id, text, l, applied,
        |    CAST(least(p1, p2) AS INTEGER) AS lo,
        |    CAST(greatest(p1, p2) AS INTEGER) AS hi
        |  FROM c
        |)
        |SELECT doc_id, applied AS fim_applied,
        |  CAST(CASE WHEN applied THEN lo ELSE l END AS BIGINT) AS n_prefix,
        |  CAST(CASE WHEN applied THEN hi - lo ELSE 0 END AS BIGINT) AS n_middle,
        |  CAST(CASE WHEN applied THEN l - hi ELSE 0 END AS BIGINT) AS n_suffix,
        |  md5(CASE WHEN applied THEN
        |        '<PRE>' || substr(text, 1, lo)
        |        || '<SUF>' || substr(text, hi + 1, l - hi)
        |        || '<MID>' || substr(text, lo + 1, hi - lo)
        |      ELSE text END) AS psm_fp
        |FROM s""".stripMargin,

    "cur_winsorize" ->
      """WITH b AS (
        |  SELECT lang, quantile_cont(n_chars, 0.05) AS lo_b,
        |    quantile_cont(n_chars, 0.95) AS hi_b
        |  FROM documents GROUP BY lang
        |)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  greatest(least(CAST(d.n_chars AS DOUBLE), b.hi_b), b.lo_b)
        |    AS clipped,
        |  d.n_chars < b.lo_b OR d.n_chars > b.hi_b AS is_outlier
        |FROM documents d JOIN b USING (lang)""".stripMargin,

    "cur_chunk_docs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, tk, unnest(range(0, len(tk), 48)) AS start FROM t
        |)
        |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
        |  array_to_string(list_slice(tk, start + 1, start + 64), ' ')
        |    AS chunk_text,
        |  CAST(len(list_slice(tk, start + 1, start + 64)) AS BIGINT)
        |    AS n_chunk_tokens
        |FROM s""".stripMargin,

    // the composed chain replayed stage-for-stage: the train/eval split,
    // the quality formula (float-identical to text_quality), min-doc_id
    // dedup keepers over the quality survivors, 5-gram contamination vs
    // the eval split, then the chunk arithmetic of cur_chunk_docs
    "cur_pipeline_e2e" ->
      """WITH t AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS tk,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS nib,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE text IS NOT NULL
        |), q AS (
        |  SELECT doc_id, tk, nib, fp,
        |    0.4 * (CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
        |           / nullif(length(text), 0))
        |  + 0.3 * least(CAST(len(tk) AS DOUBLE) / 100.0, 1.0)
        |  + 0.2 * (1.0 - least(CAST(len(regexp_extract_all(text, '[\.,;:!?]')) AS DOUBLE)
        |                       / CAST(len(tk) AS DOUBLE), 1.0))
        |  + 0.1 * least((CAST(len(regexp_extract_all(lower(text),
        |        '\b(the|a|of|and|to|in|is|it|for|on)\b')) AS DOUBLE)
        |      / CAST(len(tk) AS DOUBLE)) * 5.0, 1.0) AS quality
        |  FROM t
        |), trainq AS (
        |  SELECT * FROM q WHERE nib <= 'd' AND quality >= 0.65
        |), keep1 AS (
        |  SELECT * FROM (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keeper
        |                 FROM trainq)
        |  WHERE doc_id = keeper
        |), ev AS (
        |  SELECT DISTINCT g FROM (
        |    SELECT unnest(list_transform(range(1, len(tk) - 3),
        |      i -> array_to_string(list_slice(tk, i, i + 4), ' '))) AS g
        |    FROM t WHERE nib >= 'e')
        |), gtrain AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 3),
        |      i -> array_to_string(list_slice(tk, i, i + 4), ' '))) AS g
        |    FROM keep1)
        |), contaminated AS (
        |  SELECT DISTINCT doc_id FROM gtrain JOIN ev USING (g)
        |), surv AS (
        |  SELECT doc_id, tk FROM keep1
        |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        |), s AS (
        |  SELECT doc_id, tk, unnest(range(0, len(tk), 48)) AS start FROM surv
        |)
        |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
        |  array_to_string(list_slice(tk, start + 1, start + 64), ' ')
        |    AS chunk_text,
        |  CAST(len(list_slice(tk, start + 1, start + 64)) AS BIGINT)
        |    AS n_chunk_tokens
        |FROM s""".stripMargin,

    // word 5-grams; range(1, len−3) is empty for docs under 5 tokens —
    // the same guard as the Spark side's when(size >= 5)
    "cur_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS nib
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, nib, unnest(list_transform(range(1, len(tk) - 3),
        |    i -> array_to_string(list_slice(tk, i, i + 4), ' '))) AS g
        |  FROM t
        |), ev AS (
        |  SELECT DISTINCT g FROM g WHERE nib >= 'e'
        |), hits AS (
        |  SELECT tr.doc_id, count(*) AS n_shared
        |  FROM (SELECT DISTINCT doc_id, g FROM g WHERE nib <= 'd') tr
        |  JOIN ev USING (g) GROUP BY tr.doc_id
        |)
        |SELECT t.doc_id,
        |  CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared_ngrams,
        |  coalesce(h.n_shared, 0) > 0 AS contaminated
        |FROM t LEFT JOIN hits h USING (doc_id)
        |WHERE t.nib <= 'd'""".stripMargin,

    // the chunk framing of cur_chunk_docs at stride=width=8, document
    // frequency per line, and the ordered string_agg reassembly of the
    // surviving lines
    "cur_line_dedup" -> LineDedupOracleSql,

    // per-token rolling-hash buckets (HUGEINT fold, low 8 bits), the
    // two count digests and totals, HUGEINT product sums folded back
    // to the BIGINT margin
    "cur_dsir_margin" ->
      """WITH dz AS (
        |  SELECT doc_id, lang,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
        |  FROM documents WHERE text IS NOT NULL
        |), dt AS (
        |  SELECT doc_id, lang, unnest(str_split(nt, ' ')) AS tok FROM dz
        |), dh AS (
        |  SELECT doc_id, lang, hex(encode(tok)) AS hx,
        |    octet_length(encode(tok)) AS ln
        |  FROM dt
        |), db AS (
        |  SELECT doc_id, lang,
        |    CAST((list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |      list_transform(range(0, ln), j ->
        |        CAST(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
        |             + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
        |          AS HUGEINT))),
        |      (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT)
        |      & 255) AS BIGINT) AS b
        |  FROM dh
        |), dct AS (
        |  SELECT b, count(*) AS cnt_t FROM db WHERE lang = 'en' GROUP BY 1
        |), dcr AS (
        |  SELECT b, count(*) AS cnt_r FROM db GROUP BY 1
        |), dnt AS (
        |  SELECT count(*) AS n_t FROM db WHERE lang = 'en'
        |), dnr AS (
        |  SELECT count(*) AS n_r FROM db
        |), dm AS (
        |  SELECT t.doc_id, t.lang, count(*) AS n_tokens,
        |    sum(CAST(coalesce(ct.cnt_t, 0) AS HUGEINT)
        |          * CAST(nr.n_r AS HUGEINT)
        |        - CAST(cr.cnt_r AS HUGEINT) * CAST(nt2.n_t AS HUGEINT))
        |      AS mg
        |  FROM db t
        |  LEFT JOIN dct ct USING (b)
        |  JOIN dcr cr USING (b), dnt nt2, dnr nr
        |  GROUP BY t.doc_id, t.lang
        |)
        |SELECT doc_id, lang, n_tokens, CAST(mg AS BIGINT) AS margin,
        |  mg > 0 AS selected
        |FROM dm""".stripMargin,

    // the incrementally maintained dictionary must reproduce the
    // one-shot cleaned corpus bit for bit — the oracle IS cur_line_dedup
    "stream_linededup_incremental" -> LineDedupOracleSql,

    // zip-unnested gram positions matched against the eval gram set,
    // expanded to covered token positions, and the ordered string_agg
    // reassembly of the surviving tokens
    "cur_decontaminate_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS nib
        |  FROM documents
        |), ev AS (
        |  SELECT DISTINCT g FROM (
        |    SELECT unnest(list_transform(range(1, len(tk) - 3),
        |      i -> array_to_string(list_slice(tk, i, i + 4), ' '))) AS g
        |    FROM t WHERE nib >= 'e')
        |), gp AS (
        |  SELECT doc_id,
        |    unnest(range(0, greatest(len(tk) - 4, 0))) AS p,
        |    unnest(list_transform(range(1, len(tk) - 3),
        |      i -> array_to_string(list_slice(tk, i, i + 4), ' '))) AS g
        |  FROM t WHERE nib <= 'd'
        |), cov AS (
        |  SELECT DISTINCT gp.doc_id, gp.p + d.d AS pos
        |  FROM gp JOIN ev USING (g), (SELECT unnest(range(0, 5)) AS d) d
        |), tok AS (
        |  SELECT doc_id, unnest(range(0, len(tk))) AS pos, unnest(tk) AS w
        |  FROM t WHERE nib <= 'd'
        |)
        |SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(cov.pos) AS BIGINT) AS n_removed,
        |  coalesce(string_agg(CASE WHEN cov.pos IS NULL THEN tok.w END,
        |    ' ' ORDER BY tok.pos), '') AS clean_text
        |FROM tok LEFT JOIN cov
        |  ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
        |GROUP BY tok.doc_id""".stripMargin,

    // keep-one exact-substring self-dedup: the keeper of each
    // duplicated 8-gram is its (doc_id, p)-first occurrence — the
    // oracle ranks definitionally with a window; the engine's
    // min-struct aggregate must pick the identical keeper
    "cur_selfrepeat_spans" -> SelfRepeatOracleSql,

    // the incrementally maintained gram dictionary (summed counts,
    // min-folded keepers) must reproduce the one-shot excision bit for
    // bit — the oracle IS cur_selfrepeat_spans
    "stream_selfrepeat_incremental" -> SelfRepeatOracleSql,

    // the same gram CTEs as cur_decontaminate, but grouped per
    // (train, eval) pair with the containment ratio
    "cur_contamination_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS nib
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, nib, unnest(list_transform(range(1, len(tk) - 3),
        |    i -> array_to_string(list_slice(tk, i, i + 4), ' '))) AS g
        |  FROM t
        |), ev AS (
        |  SELECT DISTINCT doc_id AS eval_doc_id, g FROM g WHERE nib >= 'e'
        |), tr AS (
        |  SELECT DISTINCT doc_id, g FROM g WHERE nib <= 'd'
        |), tn AS (
        |  SELECT doc_id, count(*) AS n_train_grams FROM tr GROUP BY 1
        |), pairs AS (
        |  SELECT tr.doc_id, ev.eval_doc_id, count(*) AS n_shared
        |  FROM tr JOIN ev USING (g) GROUP BY 1, 2
        |)
        |SELECT p.doc_id, p.eval_doc_id, p.n_shared,
        |  CAST(p.n_shared AS DOUBLE) / tn.n_train_grams AS containment
        |FROM pairs p JOIN tn USING (doc_id)
        |WHERE p.n_shared >= 2""".stripMargin,

    // the hash-uniform draw rebuilt by folding the first 8 (lowercase)
    // md5 hex digits to an integer / 2^32; the weight is the text_quality
    // formula verbatim — both pure IEEE arithmetic, so the accept
    // decision is bit-identical across engines
    "cur_weighted_sample" ->
      """WITH q AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS toks,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
        |      / nullif(length(text), 0) AS alpha,
        |    CAST(len(regexp_extract_all(text, '[\.,;:!?]')) AS DOUBLE) AS punct,
        |    CAST(len(regexp_extract_all(lower(text),
        |      '\b(the|a|of|and|to|in|is|it|for|on)\b')) AS DOUBLE) AS stop
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, lang,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(0, 8), j ->
        |        CAST(strpos('0123456789abcdef',
        |          substring(md5(CAST(doc_id AS VARCHAR)), j + 1, 1)) - 1 AS BIGINT))),
        |      (a, x) -> 16 * a + x) AS DOUBLE) / 4294967296.0 AS u,
        |    0.4 * alpha + 0.3 * least(toks / 100.0, 1.0)
        |      + 0.2 * (1.0 - least(punct / toks, 1.0))
        |      + 0.1 * least((stop / toks) * 5.0, 1.0) AS weight
        |  FROM q
        |)
        |SELECT doc_id, lang, u, weight FROM t WHERE u < weight""".stripMargin,

    // temperature mixture: per-language count join + the same md5-uniform
    // draw as cur_weighted_sample; rate arithmetic is one IEEE division
    // over an exact integer sqrt, so the filter replays bit-for-bit
    "cur_temperature_mix" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang
        |), t AS (
        |  SELECT d.doc_id, d.lang, c.n_lang,
        |    least(1.0, 8.0 / sqrt(CAST(c.n_lang AS DOUBLE))) AS rate,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(0, 8), j ->
        |        CAST(strpos('0123456789abcdef',
        |          substring(md5(CAST(d.doc_id AS VARCHAR)), j + 1, 1)) - 1 AS BIGINT))),
        |      (a, x) -> 16 * a + x) AS DOUBLE) / 4294967296.0 AS u
        |  FROM documents d JOIN counts c USING (lang)
        |)
        |SELECT doc_id, lang, n_lang, rate, u FROM t WHERE u < rate""".stripMargin,

    // trigram rolling hashes (HUGEINT fold), ≤w member windows per
    // hash via range, rightmost-argmin row_number, distinct selections
    "text_winnowing" ->
      s"""WITH $WinnowCtes
         |SELECT doc_id, pos, fp_hash FROM wn""".stripMargin,

    // the same df-capped inverted-index pair shape as every near-dup
    // sibling, over the winnowed fingerprint sets
    "dedup_winnowing" ->
      s"""WITH $WinnowCtes, wd_d AS (
         |  SELECT DISTINCT doc_id, fp_hash FROM wn
         |), wd_cap AS (
         |  SELECT fp_hash FROM wd_d GROUP BY fp_hash HAVING count(*) <= 100
         |), wd_cd AS (
         |  SELECT d.doc_id, d.fp_hash FROM wd_d d JOIN wd_cap USING (fp_hash)
         |), wd_sz AS (
         |  SELECT doc_id, count(*) AS n FROM wd_cd GROUP BY 1
         |), wd_pr AS (
         |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |    count(*) AS n_shared
         |  FROM wd_cd a JOIN wd_cd b2 USING (fp_hash)
         |  WHERE a.doc_id < b2.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 2
         |)
         |SELECT p.doc_a, p.doc_b, p.n_shared,
         |  CAST(p.n_shared AS DOUBLE) / (sa.n + sb.n - p.n_shared)
         |    AS jaccard
         |FROM wd_pr p
         |JOIN wd_sz sa ON sa.doc_id = p.doc_a
         |JOIN wd_sz sb ON sb.doc_id = p.doc_b""".stripMargin,

    // the taint injection is a pure function of doc_id (md5 hex), the
    // detectors the same regex classes counted with RE2
    "text_secret_scan" ->
      """WITH t AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 7 = 3
        |         THEN ' sk_' || md5(CAST(doc_id AS VARCHAR)) ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 5
        |         THEN ' AKIA' || upper(substring(
        |           md5('aws' || CAST(doc_id AS VARCHAR)), 1, 16))
        |         ELSE '' END AS text
        |  FROM documents WHERE text IS NOT NULL
        |), c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[0-9a-f]{32}')) AS BIGINT)
        |      AS n_hex32,
        |    CAST(len(regexp_extract_all(text, 'AKIA[0-9A-Z]{16}')) AS BIGINT)
        |      AS n_awskey
        |  FROM t
        |)
        |SELECT doc_id, n_hex32, n_awskey,
        |  n_hex32 > 0 OR n_awskey > 0 AS has_secret
        |FROM c""".stripMargin,

    // the same bigram expansion (1-based list indexing), digest-side
    // context totals, and both top-k rankings; p_next is one IEEE
    // division of exact BIGINTs in both engines
    "text_bigram_lm" -> BigramLmOracleSql,

    // the maintained counts must reproduce the one-shot ranking — the
    // oracle IS text_bigram_lm
    "stream_bigramlm_incremental" -> BigramLmOracleSql,

    // trigram expansion via 1-based list slicing, exact occurrence and
    // distinct counts per language, one-division type-token ratio
    "text_ngram_diversity" ->
      """WITH t AS (
        |  SELECT lang, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE text IS NOT NULL
        |), o AS (
        |  SELECT lang, tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2] AS sh
        |  FROM (SELECT lang, tk, unnest(range(1, len(tk) - 1)) AS i FROM t)
        |), tot AS (
        |  SELECT lang, count(*) AS n_trigrams FROM o GROUP BY 1
        |), dis AS (
        |  SELECT lang, count(*) AS n_distinct
        |  FROM (SELECT DISTINCT lang, sh FROM o) GROUP BY 1
        |)
        |SELECT t2.lang, t2.n_trigrams, d.n_distinct,
        |  CAST(d.n_distinct AS DOUBLE) / CAST(t2.n_trigrams AS DOUBLE)
        |    AS diversity
        |FROM tot t2 JOIN dis d ON t2.lang = d.lang""".stripMargin,

    // stopword-delimited runs found by the row_number-difference island
    // identity; degree·10⁶ // freq integer word scores summed per
    // phrase — exact longs end to end
    "text_rake_keywords" ->
      """WITH t AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
        |  FROM documents WHERE text IS NOT NULL
        |), tok AS (
        |  SELECT doc_id, pos, w FROM (
        |    SELECT doc_id, unnest(string_split(nt, ' ')) AS w,
        |           generate_subscripts(string_split(nt, ' '), 1) AS pos
        |    FROM t)
        |  WHERE w <> ''
        |), cand AS (
        |  SELECT doc_id, pos, w,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM tok
        |  WHERE w NOT IN ('the','a','of','and','to','in','is','it','for','on')
        |), mem AS (
        |  SELECT doc_id, grp, pos, w,
        |    count(*) OVER (PARTITION BY doc_id, grp) AS plen
        |  FROM cand
        |), ws AS (
        |  SELECT doc_id, w, (sum(plen) * 1000000) // count(*) AS score_u
        |  FROM mem GROUP BY 1, 2
        |), ph AS (
        |  SELECT m.doc_id, m.grp,
        |    string_agg(m.w, ' ' ORDER BY m.pos) AS phrase,
        |    count(*) AS n_words,
        |    CAST(sum(ws.score_u) AS BIGINT) AS score_u
        |  FROM mem m JOIN ws ON ws.doc_id = m.doc_id AND ws.w = m.w
        |  GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, phrase, n_words, score_u
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score_u DESC, phrase ASC) AS rank FROM ph)
        |WHERE rank <= 3""".stripMargin,

    // tf ties per (doc, token); df reuses the tf relation (one row per
    // doc-token pair); linear idf = tf * N / df in exact IEEE doubles
    "text_tfidf_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM tok WHERE length(token) > 0 GROUP BY doc_id, token
        |), dfq AS (
        |  SELECT token, count(*) AS df FROM tf GROUP BY token
        |), n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, token, tf, df,
        |    CAST(tf AS DOUBLE) * CAST(n AS DOUBLE) / CAST(df AS DOUBLE) AS score
        |  FROM tf JOIN dfq USING (token), n
        |)
        |SELECT doc_id, token, tf, df, score, CAST(rank AS BIGINT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, token ASC) AS rank FROM scored)
        |WHERE rank <= 5""".stripMargin,

    // same tokenization CTEs; the contribution expression reproduces the
    // Spark operation tree literal-for-literal (left-assoc A*B/C), and
    // the total adds c0+c1+c2 in fixed order — no data-ordered sums
    "text_bm25_topk" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM tok WHERE length(token) > 0 GROUP BY doc_id, token
        |), dfq AS (
        |  SELECT token, count(*) AS df FROM tf
        |  WHERE token IN ('hash', 'join', 'stream') GROUP BY token
        |), dl AS (
        |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
        |), tot AS (
        |  SELECT CAST(sum(tf) AS DOUBLE) / CAST(count(DISTINCT doc_id) AS DOUBLE)
        |    AS avgdl, count(DISTINCT doc_id) AS n_docs FROM tf
        |), scored AS (
        |  SELECT t.doc_id, t.token,
        |    ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |       / (CAST(df AS DOUBLE) + 0.5))
        |      * (CAST(t.tf AS DOUBLE) * 2.2)
        |      / (CAST(t.tf AS DOUBLE)
        |         + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl))
        |      AS contrib
        |  FROM tf t JOIN dfq USING (token) JOIN dl ON t.doc_id = dl.doc_id, tot
        |), agged AS (
        |  SELECT doc_id,
        |    max(contrib) FILTER (WHERE token = 'hash') AS c0,
        |    max(contrib) FILTER (WHERE token = 'join') AS c1,
        |    max(contrib) FILTER (WHERE token = 'stream') AS c2
        |  FROM scored GROUP BY doc_id
        |)
        |SELECT doc_id,
        |  coalesce(c0, 0.0) + coalesce(c1, 0.0) + coalesce(c2, 0.0) AS score,
        |  c0, c1, c2
        |FROM agged
        |ORDER BY score DESC, doc_id ASC LIMIT 50""".stripMargin,

    // the two legs ranked under the same rounded-score total orders,
    // fused by 1/(60+rank) sums in fixed leg order
    "text_hybrid_rrf" ->
      s"""WITH $HybridRrfCtes
         |SELECT doc_id, lex_rank, dense_rank, rrf
         |FROM fused WHERE rnk <= 20""".stripMargin,

    // the composed RAG context chain: the hybrid fusion CTEs, the MMR
    // rounds over the fused top-20 (relevance = rrf), and the greedy
    // token pack as a running sum in pick order
    "cur_rag_context" -> CurRagContextOracleSql,

    "cur_top_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 100""".stripMargin,

    // both rankings replayed with the sim_topk cosine tree — the
    // truncated side on list_slice prefixes — then the exact-integer
    // intersection and one rational
    "sim_matryoshka_recall" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 5
        |), pairs AS (
        |  SELECT qid, vec_id, qe, CAST(embedding AS DOUBLE[]) AS ee
        |  FROM embeddings CROSS JOIN q WHERE vec_id <> qid
        |), tr AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |      ORDER BY round(list_dot_product(qe[1:16], ee[1:16])
        |        / sqrt(list_dot_product(qe[1:16], qe[1:16])
        |               * list_dot_product(ee[1:16], ee[1:16])), 6) DESC,
        |        vec_id ASC) AS rank
        |    FROM pairs)
        |  WHERE rank <= 10
        |), br AS (
        |  SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
        |      ORDER BY round(list_dot_product(qe, ee)
        |        / sqrt(list_dot_product(qe, qe)
        |               * list_dot_product(ee, ee)), 6) DESC,
        |        vec_id ASC) AS rank
        |    FROM pairs)
        |  WHERE rank <= 10
        |), h AS (
        |  SELECT tr.qid, count(*) AS n_hits
        |  FROM tr JOIN br ON tr.qid = br.qid AND tr.vec_id = br.vec_id
        |  GROUP BY 1
        |), tot AS (
        |  SELECT qid, CAST(count(*) AS BIGINT) AS n_true FROM br GROUP BY 1
        |)
        |SELECT tot.qid, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  tot.n_true,
        |  CAST(coalesce(h.n_hits, 0) AS DOUBLE)
        |    / CAST(tot.n_true AS DOUBLE) AS recall
        |FROM tot LEFT JOIN h ON tot.qid = h.qid""".stripMargin,

    // the greedy MMR selection unrolled as 10 materialized CTE rounds
    // (the k-core/PageRank pattern): each round one correlated
    // max-over-selected, one NOT IN cut, one (mmr, vec_id) argmax
    "sim_mmr_topk" -> SimMmrOracleSql,

    "sim_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT qid, vec_id,
        |    round(list_dot_product(qe, ee)
        |          / sqrt(list_dot_product(qe, qe) * list_dot_product(ee, ee)),
        |          6) AS cos_sim
        |  FROM (SELECT qid, vec_id, qe, CAST(embedding AS DOUBLE[]) AS ee
        |        FROM embeddings CROSS JOIN q WHERE vec_id <> qid)
        |)
        |SELECT qid, vec_id, cos_sim, rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM scored)
        |WHERE rank <= 10""".stripMargin,

    // hardest positive / hardest negative argmaxes over the same scored
    // relation as sim_topk, joined per anchor
    "sim_triplet_mining" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe,
        |         label AS qlabel
        |  FROM embeddings WHERE vec_id < 20
        |), scored AS (
        |  SELECT qid, qlabel, vec_id, label,
        |    round(list_dot_product(qe, ee)
        |          / sqrt(list_dot_product(qe, qe) * list_dot_product(ee, ee)),
        |          6) AS cos_sim
        |  FROM (SELECT qid, qlabel, vec_id, label,
        |               qe, CAST(embedding AS DOUBLE[]) AS ee
        |        FROM embeddings CROSS JOIN q WHERE vec_id <> qid)
        |), pos AS (
        |  SELECT qid, vec_id AS pos_id, cos_sim AS pos_sim
        |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |          ORDER BY cos_sim DESC, vec_id ASC) AS rn
        |        FROM scored WHERE label = qlabel)
        |  WHERE rn = 1
        |), neg AS (
        |  SELECT qid, vec_id AS neg_id, cos_sim AS neg_sim
        |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |          ORDER BY cos_sim DESC, vec_id ASC) AS rn
        |        FROM scored WHERE label <> qlabel)
        |  WHERE rn = 1
        |)
        |SELECT pos.qid, pos_id, pos_sim, neg_id, neg_sim,
        |  pos_sim - neg_sim AS margin
        |FROM pos JOIN neg ON pos.qid = neg.qid""".stripMargin,

    // the sign fold replayed as an or-reduce of shifted bits; Hamming
    // is bit_count(xor), all integers
    "sim_binary_topk" ->
      s"""WITH $BinarySigCtes, bq AS (
         |  SELECT vec_id AS qid, sig AS qsig FROM bsig WHERE vec_id < 5
         |), bsc AS (
         |  SELECT qid, s.vec_id,
         |    CAST(bit_count(xor(qsig, s.sig)) AS BIGINT) AS hamming
         |  FROM bsig s CROSS JOIN bq WHERE s.vec_id <> qid
         |)
         |SELECT qid, vec_id, hamming, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |        ORDER BY hamming ASC, vec_id ASC) AS rank FROM bsc)
         |WHERE rank <= 10""".stripMargin,

    // the composed two-stage serving path: Hamming top-50 candidates,
    // exact-cosine rerank over just the survivors
    "sim_twostage_topk" ->
      s"""WITH $BinarySigCtes, bq AS (
         |  SELECT vec_id AS qid, sig AS qsig FROM bsig WHERE vec_id < 5
         |), bsc AS (
         |  SELECT qid, s.vec_id,
         |    CAST(bit_count(xor(qsig, s.sig)) AS BIGINT) AS hamming
         |  FROM bsig s CROSS JOIN bq WHERE s.vec_id <> qid
         |), bcand AS (
         |  SELECT qid, vec_id FROM (SELECT *, row_number() OVER
         |      (PARTITION BY qid ORDER BY hamming ASC, vec_id ASC) AS rank
         |    FROM bsc) WHERE rank <= 50
         |), cq AS (
         |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
         |  FROM embeddings WHERE vec_id < 5
         |), rr AS (
         |  SELECT b.qid, b.vec_id,
         |    round(list_dot_product(cq.qe, CAST(e.embedding AS DOUBLE[]))
         |          / sqrt(list_dot_product(cq.qe, cq.qe)
         |                 * list_dot_product(CAST(e.embedding AS DOUBLE[]),
         |                                    CAST(e.embedding AS DOUBLE[]))),
         |          6) AS cos_sim
         |  FROM bcand b JOIN embeddings e ON e.vec_id = b.vec_id
         |  JOIN cq ON cq.qid = b.qid
         |)
         |SELECT qid, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |        ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM rr)
         |WHERE rank <= 10""".stripMargin,

    // binary top-10 joined against the exact-cosine brute top-10
    "sim_binary_recall" ->
      s"""WITH $BinarySigCtes, bq AS (
         |  SELECT vec_id AS qid, sig AS qsig FROM bsig WHERE vec_id < 5
         |), bsc AS (
         |  SELECT qid, s.vec_id,
         |    CAST(bit_count(xor(qsig, s.sig)) AS BIGINT) AS hamming
         |  FROM bsig s CROSS JOIN bq WHERE s.vec_id <> qid
         |), bt AS (
         |  SELECT qid, vec_id FROM (SELECT *, row_number() OVER
         |      (PARTITION BY qid ORDER BY hamming ASC, vec_id ASC) AS rank
         |    FROM bsc) WHERE rank <= 10
         |), cq AS (
         |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
         |  FROM embeddings WHERE vec_id < 5
         |), csc AS (
         |  SELECT qid, vec_id,
         |    round(list_dot_product(qe, ee)
         |          / sqrt(list_dot_product(qe, qe) * list_dot_product(ee, ee)),
         |          6) AS cos_sim
         |  FROM (SELECT qid, vec_id, qe, CAST(embedding AS DOUBLE[]) AS ee
         |        FROM embeddings CROSS JOIN cq WHERE vec_id <> qid)
         |), ct2 AS (
         |  SELECT qid, vec_id FROM (SELECT *, row_number() OVER
         |      (PARTITION BY qid ORDER BY cos_sim DESC, vec_id ASC) AS rank
         |    FROM csc) WHERE rank <= 10
         |), h AS (
         |  SELECT bt.qid, count(*) AS n_hits
         |  FROM bt JOIN ct2 ON bt.qid = ct2.qid AND bt.vec_id = ct2.vec_id
         |  GROUP BY 1
         |), tr AS (
         |  SELECT qid, count(*) AS n_true FROM ct2 GROUP BY 1
         |)
         |SELECT tr.qid, coalesce(h.n_hits, 0) AS n_hits, tr.n_true,
         |  CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST(tr.n_true AS DOUBLE)
         |    AS recall
         |FROM tr LEFT JOIN h ON tr.qid = h.qid""".stripMargin,

    // int8 quantization replayed exactly: scale = 127/max|v| per vector,
    // codes floor(v·scale + 0.5) (half-up on doubles — engine-portable),
    // integer dot and norms, one final double division rounded like
    // sim_topk
    "sim_quantized_topk" ->
      """WITH sc AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
        |  FROM embeddings
        |), qz AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
        |      * (CASE WHEN ma > 0 THEN 127.0 / ma ELSE 0.0 END) + 0.5) AS BIGINT)) AS q8
        |  FROM sc
        |), nn AS (
        |  SELECT vec_id, q8,
        |    list_sum(list_transform(q8, x -> x * x)) AS nq
        |  FROM qz
        |), q AS (
        |  SELECT vec_id AS qid, q8 AS qq8, nq AS qnq FROM nn WHERE vec_id < 5
        |), scored AS (
        |  SELECT qid, vec_id,
        |    CASE WHEN nq * qnq > 0 THEN
        |      round(list_dot_product(CAST(q8 AS DOUBLE[]), CAST(qq8 AS DOUBLE[]))
        |            / sqrt(CAST(nq AS DOUBLE) * CAST(qnq AS DOUBLE)), 6)
        |    ELSE 0.0 END AS q_cos
        |  FROM nn CROSS JOIN q WHERE vec_id <> qid
        |)
        |SELECT qid, vec_id, q_cos, rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY q_cos DESC, vec_id ASC) AS rank FROM scored)
        |WHERE rank <= 10""".stripMargin,

    // IVF end-to-end: DECIMAL-exact centroid training (the same arithmetic
    // as sim_label_centroid, then float-cast like the Spark side), probe
    // selection on rounded centroid cosine with the label tiebreak, exact
    // rerank within the nprobe=2 probed cells.
    "sim_ivf_topk" ->
      """WITH un AS (
        |  SELECT label, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings
        |), cc AS (
        |  SELECT label, pos,
        |    CAST(round(CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)
        |               / count(*), 6) AS FLOAT) AS c
        |  FROM un GROUP BY label, pos
        |), cent AS (
        |  SELECT label, CAST(list(c ORDER BY pos) AS DOUBLE[]) AS centroid
        |  FROM cc GROUP BY label
        |), q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 5
        |), probes AS (
        |  SELECT qid, qe, label FROM (
        |    SELECT qid, qe, label,
        |      row_number() OVER (PARTITION BY qid ORDER BY
        |        round(list_dot_product(qe, centroid)
        |              / sqrt(list_dot_product(qe, qe)
        |                   * list_dot_product(centroid, centroid)), 6) DESC,
        |        label ASC) AS pr
        |    FROM q CROSS JOIN cent)
        |  WHERE pr <= 2
        |), scored AS (
        |  SELECT p.qid, p.label, e.vec_id,
        |    round(list_dot_product(p.qe, CAST(e.embedding AS DOUBLE[]))
        |          / sqrt(list_dot_product(p.qe, p.qe)
        |               * list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                                  CAST(e.embedding AS DOUBLE[]))), 6) AS cos_sim
        |  FROM probes p JOIN embeddings e USING (label)
        |  WHERE e.vec_id <> p.qid
        |)
        |SELECT qid, label, vec_id, cos_sim, rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM scored)
        |WHERE rank <= 5""".stripMargin,

    // the full spherical-k-means training loop, replayed in SQL: the
    // final per-cell per-dimension components must match exactly
    "sim_kmeans_cells" -> {
      val (ctes, _, ccFinal) = KmeansCtes(16, 3)
      s"""WITH $ctes
         |SELECT CAST(cell AS BIGINT) AS cell, CAST(pos AS BIGINT) AS pos,
         |       CAST(c AS DOUBLE) AS c
         |FROM $ccFinal""".stripMargin
    },

    // the per-subspace codebook training loop replayed: the final
    // (sub, cell, pos) components must match exactly (the
    // sim_kmeans_cells precedent for the PQ family)
    "sim_pq_codebooks" -> {
      val d = 64 / 8
      s"""WITH ${PqCtes(8, 8, 2)}
         |SELECT CAST(sub AS BIGINT) AS sub, CAST(cell AS BIGINT) AS cell,
         |       CAST(p.pos AS BIGINT) AS pos,
         |       CAST(centroid[p.pos] AS DOUBLE) AS c
         |FROM cb CROSS JOIN (SELECT unnest(range(1, ${d + 1})) AS pos) p""".stripMargin
    },

    // IVFADC replayed end to end: PQ training + encoding (PqCtes), the
    // DECIMAL-exact label-cell centroids + probe selection
    // (sim_ivf_topk's CTEs), candidates restricted to probed cells, and
    // the micro-scaled-long ADC fold
    "sim_ivfpq_topk" -> {
      s"""WITH $IvfPqAdcCtes
         |SELECT qid, label, vec_id, adc_dist, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY adc_dist ASC, vec_id ASC) AS rank FROM adc)
         |WHERE rank <= 10""".stripMargin
    },

    // recall@10 of IVFADC against the exact-L2 brute top-10 (the same
    // metric ADC approximates): both pipelines replayed in full,
    // integer hits + exact-rational recall
    "sim_ivfpq_recall" -> {
      s"""WITH $IvfPqAdcCtes, ivfk AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY adc_dist ASC, vec_id ASC) AS rank FROM adc)
         |  WHERE rank <= 10
         |), bscored AS (
         |  SELECT qid, vec_id, ${PqL2("qe", "ee")} AS dist
         |  FROM (SELECT q.qid, e.vec_id, q.qe,
         |          CAST(e.embedding AS DOUBLE[]) AS ee
         |        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid)
         |), brute AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY dist ASC, vec_id ASC) AS rank FROM bscored)
         |  WHERE rank <= 10
         |), hits AS (
         |  SELECT qid, count(*) AS n_hits
         |  FROM ivfk JOIN brute USING (qid, vec_id) GROUP BY 1
         |), tru AS (
         |  SELECT qid, count(*) AS n_true FROM brute GROUP BY 1
         |)
         |SELECT t.qid, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  t.n_true,
         |  CAST(coalesce(h.n_hits, 0) AS DOUBLE) / CAST(t.n_true AS DOUBLE)
         |    AS recall
         |FROM tru t LEFT JOIN hits h USING (qid)""".stripMargin
    },

    // covariance by exact-integer moment identity + 8 ordered matvec
    // folds with L∞ normalizers — operand-identical to the engine
    "sim_pca_power" -> PcaPowerOracleSql,
    "sim_pca_project" -> PcaProjectOracleSql,

    // the batch-maintained moment digest must train the identical
    // component — the oracle IS sim_pca_power
    "stream_pca_incremental" -> PcaPowerOracleSql,

    // the full PQ pipeline replayed: per-subspace training (PqCtes),
    // argmin-L2² encoding, per-(query, candidate, subspace) ADC parts,
    // and the subspace-ordered fold — bit for bit
    "sim_pq_topk" -> {
      s"""WITH ${PqCtes(8, 8, 2)},
         |codes AS (
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT s.vec_id, s.sub, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id, s.sub
         |        ORDER BY ${PqL2("s.sv", "c.centroid")} ASC, c.cell ASC) AS rn
         |    FROM svall s JOIN cb c ON c.sub = s.sub)
         |  WHERE rn = 1
         |), parts AS (
         |  SELECT q.vec_id AS qid, x.vec_id, x.sub,
         |    ${PqL2("q.sv", "c.centroid")} AS pd
         |  FROM codes x
         |  JOIN cb c ON c.sub = x.sub AND c.cell = x.cell
         |  JOIN svall q ON q.sub = x.sub
         |  WHERE q.vec_id < 5 AND q.vec_id <> x.vec_id
         |), adc AS (
         |  SELECT qid, vec_id,
         |    CAST(sum(CAST(floor(pd * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / 1000000 AS adc_dist
         |  FROM parts GROUP BY 1, 2
         |)
         |SELECT qid, vec_id, adc_dist, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY adc_dist ASC, vec_id ASC) AS rank FROM adc)
         |WHERE rank <= 10""".stripMargin
    },

    // IVF over the trained cells: final assignment + probe selection +
    // exact in-cell rerank, all replayed from the training CTEs
    "sim_ivf_kmeans_topk" -> IvfKmeansTopKOracleSql,

    // the navigable-graph ANN replayed END TO END: training CTEs →
    // assignment → bounded-degree graph → 3 unrolled beam rounds →
    // visited-set top-k / recall vs the exact cosine brute force
    "sim_hnsw_topk" -> HnswTopKOracleSql,
    "sim_hnsw_recall" -> HnswRecallOracleSql,

    // the batch-maintained (cell, vec_id, embedding) index must serve
    // the identical top-k — the oracle IS sim_ivf_kmeans_topk
    "stream_annindex_incremental" -> IvfKmeansTopKOracleSql,
    "stream_annindex_delete" -> IvfKmeansDeleteOracleSql,

    // the batch-maintained navigable graph must serve the identical
    // beam-search top-k — the oracle IS sim_hnsw_topk
    "stream_hnsw_incremental" -> HnswTopKOracleSql,

    // soft deletes: tombstoned ids route but never rank — the oracle is
    // the full-graph visited set, retained-filtered, re-ranked
    "stream_hnsw_delete" -> HnswDeleteOracleSql,

    // cross-modal probes through the navigable graph: encoder replay
    // composed with the HNSW training→graph→beam CTEs
    "mm_crossmodal_hnsw_topk" -> MmCrossModalHnswTopKOracleSql,

    // SemDeDup replayed end-to-end: trained cells (same unrolled
    // training CTEs), max-cosine assignment, then the within-cell
    // lower-id max-cosine flag — value-exact because every cosine is
    // 6-dp-rounded pre-compare and the reduction is MAX
    "dedup_semantic" -> SemanticDedupOracleSql,

    // the batch-maintained (members, per-doc lower-cos max partials)
    // index must report the identical flags — the oracle IS
    // dedup_semantic
    "stream_semantic_incremental" -> SemanticDedupOracleSql,

    // LSH ANN end-to-end: the oracle recomputes the hyperplane signatures
    // from the literal plane values, applies the same <=50 bucket cap,
    // and reranks exactly in-bucket.
    "sim_ann_lsh" ->
      s"""WITH $AnnLshCtes
         |SELECT s.vec_id, s.bucket, b.nn_id, b.nn_cos
         |FROM sig s LEFT JOIN best b ON s.vec_id = b.vec_id""".stripMargin,

    // the augmented-space signatures + in-bucket exact-dot rerank
    // replayed with literal dim+1 planes; FLOAT-quantized extra coord
    "sim_mips_topk" ->
      s"""WITH $MipsCtes
         |SELECT qid, vec_id, ip, rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |        ORDER BY ip DESC, vec_id ASC) AS rank FROM mpairs)
         |WHERE rank <= 5""".stripMargin,

    "dedup_embedding" ->
      s"""WITH $AnnLshCtes
         |SELECT s.vec_id, s.bucket, b.nn_id, b.nn_cos,
         |       coalesce(b.nn_cos >= 0.95, false) AS is_dup
         |FROM sig s LEFT JOIN best b ON s.vec_id = b.vec_id""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS byte_len,
        |  64 + octet_length(encode(text)) % 192 AS width,
        |  64 + (octet_length(encode(text)) // 3) % 192 AS height,
        |  CASE WHEN doc_id % 3 = 2 THEN 1 + octet_length(encode(text)) % 8
        |       ELSE 1 END AS frames
        |FROM documents""".stripMargin,

    // the rolling 31·h+b polynomial replayed over the normalized text's
    // UTF-8 bytes (hex-pair extraction, HUGEINT mod-2^64 fold), then the
    // unsigned residue re-interpreted as the signed 64-bit value the
    // Scala long arithmetic produces
    "text_rolling_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    hex(encode(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS hx,
        |    octet_length(encode(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS len
        |  FROM documents
        |), h AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(1125899906842597 AS HUGEINT),
        |        list_transform(range(0, len), j ->
        |          CAST(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
        |               + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
        |               AS HUGEINT))),
        |      (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT) AS u
        |  FROM n
        |)
        |SELECT doc_id, CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
        |                         THEN u - 18446744073709551616::HUGEINT
        |                         ELSE u END AS BIGINT) AS rolling_fp
        |FROM h""".stripMargin,

    // the stub decode replayed exactly: bytes come back out of the UTF-8
    // blob as hex pairs; each of the 8 feature slots folds its byte
    // stride through the 31·h+b hash in HUGEINT mod 2^64 (2048 = 2^11
    // shift, 9007199254740992 = 2^53 scale — the same unsigned-shift /
    // scale the Scala stub applies); the float-cast slot values then
    // fold-sum left to right like the Spark `aggregate` lambda
    // BPE training replayed end-to-end: the learned merge table must
    // match step for step (integer counts, total argmax order, greedy
    // non-overlapping merge fold)
    "cur_bpe_merges" -> BpeMergesOracleSql,

    // the unigram-LM training loop replayed END TO END: seed substring
    // counts, three Viterbi-EM rounds as unrolled MATERIALIZED DP
    // chains, usage prunes — the learned artifact must hash-match
    "cur_unigram_vocab" -> graft.oracle.UnigramOracleSql.vocabSql(),

    // inference = the final round's segmentation under the final costs
    "cur_unigram_tokenize" -> graft.oracle.UnigramOracleSql.tokenizeSql(),

    // the retrained-from-partials vocabulary must equal the
    // batch-trained one — the convergence proof, same oracle verbatim
    "stream_unigram_incremental" -> graft.oracle.UnigramOracleSql.vocabSql(),

    // BOTH tokenizer trainings replayed in one statement (the CTE
    // namespaces are disjoint); BPE token counts read off the training
    // loop's final symbol state (= from-scratch inference, the
    // cur_bpe_tokenize-pinned equivalence), capped to the shared table
    "cur_tokenizer_stats" ->
      s"""WITH ${BpeCtes(8, 2000)}, ${graft.oracle.UnigramOracleSql.ctes(2000)},
         |bpec AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_types,
         |    CAST(sum(s.freq * length(s.word)) AS BIGINT) AS n_chars_w,
         |    CAST(sum(s.freq * len(s.syms)) AS BIGINT) AS n_tokens_w
         |  FROM st8 s JOIN wtc w ON w.word = s.word
         |), unic AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_types,
         |    CAST(sum(freq * length(word)) AS BIGINT) AS n_chars_w,
         |    CAST(sum(freq * n_tokens) AS BIGINT) AS n_tokens_w
         |  FROM seg3
         |)
         |SELECT family, n_types, n_chars_w, n_tokens_w,
         |  CAST(n_chars_w AS DOUBLE) / CAST(n_tokens_w AS DOUBLE)
         |    AS chars_per_token
         |FROM (
         |  SELECT 'bpe' AS family, * FROM bpec
         |  UNION ALL
         |  SELECT 'unigram', * FROM unic
         |)""".stripMargin,

    // raw-array positions (empties keep their slot, then drop) so
    // per-doc chunk-graph PageRank replayed round for round
    "text_textrank" -> TextRankOracleSql,
    // doc-atomic incremental union must equal the one-shot — same oracle
    "stream_textrank_incremental" -> TextRankOracleSql,

    // adjacency replays string-true; (count desc, w1, w2) total order
    "text_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS arr
        |  FROM documents WHERE text IS NOT NULL
        |), p AS (
        |  SELECT doc_id, arr[i + 1] AS token, CAST(i AS INT) AS pos
        |  FROM t, unnest(range(0, length(arr))) AS r(i)
        |  WHERE length(arr[i + 1]) > 0
        |), bg AS (
        |  SELECT a.doc_id, a.token AS w1, b.token AS w2
        |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |), top1 AS (
        |  SELECT w1, w2 FROM (
        |    SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2)
        |  ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 1
        |)
        |SELECT bg.doc_id, bg.w1, bg.w2, count(*) AS n_matches
        |FROM bg JOIN top1 USING (w1, w2)
        |GROUP BY 1, 2, 3""".stripMargin,

    // training replayed end-to-end: token hash → fixed-point features →
    // 4 unrolled GD steps → weight table / final margins
    "cur_classifier_weights" -> graft.oracle.ClassifierOracleSql.weights(),
    "cur_classifier_scores" -> graft.oracle.ClassifierOracleSql.scores(),
    // the doubled Mann-Whitney U over the replayed margins
    "cur_classifier_auc" -> graft.oracle.ClassifierOracleSql.auc(),
    // margins → decile bounds → strict-exceed buckets → exact counts
    "cur_classifier_calibration" ->
      graft.oracle.ClassifierOracleSql.calibration(),
    // the incrementally maintained training state must learn the
    // identical model — same oracle verbatim
    "stream_classifier_incremental" ->
      graft.oracle.ClassifierOracleSql.weights(),

    // the training replay's own final symbol state IS the tokenization
    // oracle — st8 after all eight fold-merges
    "cur_bpe_tokenize" ->
      s"""WITH ${BpeCtes(8, 2000)}
         |SELECT word, freq, CAST(len(syms) AS BIGINT) AS n_tokens,
         |  array_to_string(syms, '|') AS tokens_str
         |FROM st8""".stripMargin,

    // the MaxMatch rule replayed as a RECURSIVE CTE — one (word, step)
    // state row per consumed token. The previous list_reduce fold with
    // correlated lambdas WRONG-RESULTED on one row in a 31-row batch at
    // sf0.001 (a DuckDB 1.0 vectorization bug: single-row evaluation of
    // the identical fold was correct) — fold-with-correlated-state
    // oracles must be iteration-shaped, the fx_zigzag lesson extended
    "cur_maxmatch_tokenize" ->
      s"""WITH RECURSIVE ${BpeCtes(8, 2000)},
         |mg AS (
         |  SELECT l || r AS v FROM b1 UNION ALL SELECT l || r FROM b2
         |  UNION ALL SELECT l || r FROM b3 UNION ALL SELECT l || r FROM b4
         |  UNION ALL SELECT l || r FROM b5 UNION ALL SELECT l || r FROM b6
         |  UNION ALL SELECT l || r FROM b7 UNION ALL SELECT l || r FROM b8
         |), voc AS (
         |  SELECT list(DISTINCT v) AS vocab,
         |    greatest(max(length(v)), 1) AS maxlen
         |  FROM (SELECT v FROM mg UNION
         |        SELECT unnest(regexp_extract_all('abcdefghijklmnopqrstuvwxyz',
         |          '.')) AS v)
         |), seg AS (
         |  SELECT word, freq, length(word) AS len, 0 AS pos,
         |    CAST('' AS VARCHAR) AS pieces, CAST(0 AS BIGINT) AS np
         |  FROM wt
         |  UNION ALL
         |  SELECT word, freq, len, pos + bl AS pos,
         |    CASE WHEN pieces = '' THEN substr(word, pos + 1, bl)
         |         ELSE pieces || '|' || substr(word, pos + 1, bl) END,
         |    np + 1
         |  FROM (
         |    SELECT s.word, s.freq, s.len, s.pos, s.pieces, s.np,
         |      coalesce(list_max(list_filter(range(1, maxlen + 1),
         |        L -> L <= s.len - s.pos
         |          AND list_contains(vocab, substr(s.word, s.pos + 1,
         |            CAST(L AS BIGINT))))), 1) AS bl
         |    FROM seg s, voc
         |    WHERE s.pos < s.len
         |  )
         |)
         |SELECT word, freq, np AS n_pieces, pieces AS pieces_str
         |FROM seg WHERE pos >= len""".stripMargin,

    // the merges retrained from incrementally-maintained word-type
    // partials must equal the batch-trained table — same oracle
    "stream_bpe_incremental" -> BpeMergesOracleSql,

    // WordPiece training replayed with the exact cross-multiplication
    // tournament — the selection rule is the whole difference from BPE,
    // so the oracle checks it end to end
    "cur_wordpiece_merges" -> WordPieceMergesOracleSql,
    // the retrain from maintained partials must learn the identical
    // table — same oracle
    "stream_wordpiece_incremental" -> WordPieceMergesOracleSql,

    // greedy longest-match over the WordPiece-trained vocabulary — the
    // same iteration-shaped RECURSIVE seg as cur_maxmatch_tokenize
    // (fold-with-correlated-state oracles must be iteration-shaped)
    "cur_wordpiece_tokenize" ->
      s"""WITH RECURSIVE ${WpCtes(8, 2000)},
         |mg AS (
         |  SELECT l || r AS v FROM wb1 UNION ALL SELECT l || r FROM wb2
         |  UNION ALL SELECT l || r FROM wb3 UNION ALL SELECT l || r FROM wb4
         |  UNION ALL SELECT l || r FROM wb5 UNION ALL SELECT l || r FROM wb6
         |  UNION ALL SELECT l || r FROM wb7 UNION ALL SELECT l || r FROM wb8
         |), voc AS (
         |  SELECT list(DISTINCT v) AS vocab,
         |    greatest(max(length(v)), 1) AS maxlen
         |  FROM (SELECT v FROM mg UNION
         |        SELECT unnest(regexp_extract_all('abcdefghijklmnopqrstuvwxyz',
         |          '.')) AS v)
         |), seg AS (
         |  SELECT word, freq, length(word) AS len, 0 AS pos,
         |    CAST('' AS VARCHAR) AS pieces, CAST(0 AS BIGINT) AS np
         |  FROM wt
         |  UNION ALL
         |  SELECT word, freq, len, pos + bl AS pos,
         |    CASE WHEN pieces = '' THEN substr(word, pos + 1, bl)
         |         ELSE pieces || '|' || substr(word, pos + 1, bl) END,
         |    np + 1
         |  FROM (
         |    SELECT s.word, s.freq, s.len, s.pos, s.pieces, s.np,
         |      coalesce(list_max(list_filter(range(1, maxlen + 1),
         |        L -> L <= s.len - s.pos
         |          AND list_contains(vocab, substr(s.word, s.pos + 1,
         |            CAST(L AS BIGINT))))), 1) AS bl
         |    FROM seg s, voc
         |    WHERE s.pos < s.len
         |  )
         |)
         |SELECT word, freq, np AS n_pieces, pieces AS pieces_str
         |FROM seg WHERE pos >= len""".stripMargin,

    // dHash perceptual near-dup, replayed end-to-end: the 72-cell grid is
    // the same HUGEINT mod-2^64 fold as mm_features (stride 72, per-cell
    // seed), bits compare the >>11 values, blocking/cap/distance mirror
    // the engine; Hamming runs on the UNSIGNED hash (xor+bit_count on
    // HUGEINT < 2^64 equals 64-bit xor), the signed BIGINT is output-only
    "mm_phash_dedup" ->
      """WITH img AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |         hex(encode(text)) AS hx
        |  FROM documents WHERE doc_id % 3 = 0
        |), gr AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 72), g ->
        |      list_reduce(
        |        list_prepend(CAST(1125899906842597 + g AS HUGEINT),
        |          list_transform(range(g, len, 72), j ->
        |            CAST(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
        |                 + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
        |                 AS HUGEINT))),
        |        (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT
        |      ) >> 11) AS grid
        |  FROM img
        |), pu AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS HUGEINT),
        |      list_transform(range(0, 64), i ->
        |        CASE WHEN grid[9 * (i // 8) + (i % 8) + 1]
        |                  > grid[9 * (i // 8) + (i % 8) + 2]
        |             THEN CAST(1 AS HUGEINT) << CAST(i AS INT)
        |             ELSE CAST(0 AS HUGEINT) END)),
        |      (a, x) -> a | x) AS u
        |  FROM gr
        |), ps AS (
        |  SELECT doc_id, u,
        |    CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
        |              THEN u - 18446744073709551616::HUGEINT
        |              ELSE u END AS BIGINT) AS phash
        |  FROM pu
        |), ch AS (
        |  SELECT doc_id, i AS chunk, (u >> CAST(8 * i AS INT)) & 255 AS ckey
        |  FROM ps, range(0, 8) t(i)
        |), okb AS (
        |  SELECT chunk, ckey FROM ch GROUP BY chunk, ckey
        |  HAVING count(*) <= 50
        |), pruned AS (
        |  SELECT ch.doc_id, ch.chunk, ch.ckey FROM ch JOIN okb USING (chunk, ckey)
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS nb_id
        |  FROM pruned a JOIN pruned b USING (chunk, ckey)
        |  WHERE a.doc_id <> b.doc_id
        |), cand AS (
        |  SELECT p.doc_id, p.nb_id, bit_count(xor(x.u, y.u)) AS hamming
        |  FROM pairs p JOIN ps x ON p.doc_id = x.doc_id
        |               JOIN ps y ON p.nb_id = y.doc_id
        |), best AS (
        |  SELECT doc_id, nb_id AS nn_id, CAST(hamming AS BIGINT) AS nn_hamming
        |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |          ORDER BY hamming ASC, nb_id ASC) AS rn FROM cand)
        |  WHERE rn = 1
        |)
        |SELECT s.doc_id, s.phash, b.nn_id, b.nn_hamming,
        |       coalesce(b.nn_hamming <= 7, false) AS is_dup
        |FROM ps s LEFT JOIN best b USING (doc_id)""".stripMargin,

    "mm_features" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio'
        |         ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS len, hex(encode(text)) AS hx
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, kind,
        |    list_transform(range(0, 8), i ->
        |      CAST(CAST(
        |        list_reduce(
        |          list_prepend(CAST(1125899906842597 + i AS HUGEINT),
        |            list_transform(range(i, len, 8), j ->
        |              CAST(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
        |                   + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
        |                   AS HUGEINT))),
        |          (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT
        |        ) // 2048 AS DOUBLE) / 9007199254740992.0 AS FLOAT)) AS feats
        |  FROM m
        |)
        |SELECT doc_id, kind,
        |  round(list_reduce(list_prepend(0.0, list_transform(feats, x -> CAST(x AS DOUBLE))),
        |        (a, x) -> a + x), 6) AS feature_sum
        |FROM f""".stripMargin,

    // the media-encoder stub replayed (the mm_features fold at 64 slots,
    // stride 64), then the sim_topk cosine/rank replay against the text
    // embeddings — both halves already-proven machinery
    "mm_crossmodal_topk" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |    hex(encode(text)) AS hx
        |  FROM documents WHERE doc_id % 3 = 0
        |), mv AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 64), i ->
        |      CAST(CAST(
        |        list_reduce(
        |          list_prepend(CAST(1125899906842597 + i AS HUGEINT),
        |            list_transform(range(i, len, 64), j ->
        |              CAST(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
        |                   + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
        |                   AS HUGEINT))),
        |          (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT
        |        ) // 2048 AS DOUBLE) / 9007199254740992.0 AS FLOAT)) AS v
        |  FROM m
        |), scored AS (
        |  SELECT doc_id, vec_id,
        |    round(list_dot_product(CAST(v AS DOUBLE[]), ee)
        |          / sqrt(list_dot_product(CAST(v AS DOUBLE[]), CAST(v AS DOUBLE[]))
        |                 * list_dot_product(ee, ee)), 6) AS cos_sim
        |  FROM (SELECT doc_id, v, vec_id, CAST(embedding AS DOUBLE[]) AS ee
        |        FROM mv CROSS JOIN embeddings)
        |)
        |SELECT doc_id, vec_id, cos_sim, rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM scored)
        |WHERE rank <= 3""".stripMargin,

    // the encoder replay (the mm_crossmodal_topk mv CTE) fed through the
    // sim_ivf_topk centroid/probe/rerank replay — no self-exclusion
    // (doc_ids and vec_ids are different id spaces)
    "mm_crossmodal_ivf_topk" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |    hex(encode(text)) AS hx
        |  FROM documents WHERE doc_id % 3 = 0
        |), mv AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 64), i ->
        |      CAST(CAST(
        |        list_reduce(
        |          list_prepend(CAST(1125899906842597 + i AS HUGEINT),
        |            list_transform(range(i, len, 64), j ->
        |              CAST(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
        |                   + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
        |                   AS HUGEINT))),
        |          (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT
        |        ) // 2048 AS DOUBLE) / 9007199254740992.0 AS FLOAT)) AS v
        |  FROM m
        |), un AS (
        |  SELECT label, unnest(embedding) AS ev,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings
        |), cc AS (
        |  SELECT label, pos,
        |    CAST(round(CAST(sum(CAST(CAST(ev AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)
        |               / count(*), 6) AS FLOAT) AS c
        |  FROM un GROUP BY label, pos
        |), cent AS (
        |  SELECT label, CAST(list(c ORDER BY pos) AS DOUBLE[]) AS centroid
        |  FROM cc GROUP BY label
        |), q AS (
        |  SELECT doc_id AS qid, CAST(v AS DOUBLE[]) AS qe FROM mv
        |), probes AS (
        |  SELECT qid, qe, label FROM (
        |    SELECT qid, qe, label,
        |      row_number() OVER (PARTITION BY qid ORDER BY
        |        round(list_dot_product(qe, centroid)
        |              / sqrt(list_dot_product(qe, qe)
        |                   * list_dot_product(centroid, centroid)), 6) DESC,
        |        label ASC) AS pr
        |    FROM q CROSS JOIN cent)
        |  WHERE pr <= 2
        |), scored AS (
        |  SELECT p.qid, p.label, e.vec_id,
        |    round(list_dot_product(p.qe, CAST(e.embedding AS DOUBLE[]))
        |          / sqrt(list_dot_product(p.qe, p.qe)
        |               * list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                                  CAST(e.embedding AS DOUBLE[]))), 6) AS cos_sim
        |  FROM probes p JOIN embeddings e USING (label)
        |)
        |SELECT qid AS doc_id, label, vec_id, cos_sim, rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM scored)
        |WHERE rank <= 3""".stripMargin,

    // the CDC segmentation + per-chunk HUGEINT fold replayed; the hash
    // folds back to Spark's signed long
    "mm_cdc_chunks" ->
      s"""WITH $CdcChunkCtes
         |SELECT doc_id, kind, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  CAST(chunk_off AS BIGINT) AS chunk_off,
         |  CAST(chunk_len AS BIGINT) AS chunk_len,
         |  CAST(CASE WHEN hh >= 9223372036854775808::HUGEINT
         |            THEN hh - 18446744073709551616::HUGEINT ELSE hh END
         |       AS BIGINT) AS chunk_hash
         |FROM cdc_hs""".stripMargin,

    // the derived-re-encode video corpus (frame-0 bytes +1 mod 256 for
    // even videos with ≥3 frames), frame-window HUGEINT folds, then
    // the df-capped inverted-index pair shape of mm_cdc_neardup
    "mm_video_neardup" ->
      """WITH vn_m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |    hex(encode(text)) AS hx, 0 AS der
        |  FROM documents WHERE doc_id % 3 = 2
        |), vn_a AS (
        |  SELECT doc_id, len, hx, der FROM vn_m
        |  UNION ALL
        |  SELECT doc_id + 1000000000, len, hx, 1
        |  FROM vn_m WHERE doc_id % 6 = 2 AND len % 8 >= 2
        |), vn_fr AS (
        |  SELECT doc_id, len, hx, der, len // (1 + len % 8) AS stride,
        |    unnest(range(0, 1 + len % 8)) AS i
        |  FROM vn_a
        |), vn_h AS (
        |  SELECT doc_id, i,
        |    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |      list_transform(range(i * stride, i * stride + stride),
        |        j -> CAST((16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
        |                   + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
        |                   + CASE WHEN der = 1 AND i = 0 THEN 1 ELSE 0 END) % 256
        |             AS HUGEINT))),
        |      (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT) AS hh
        |  FROM vn_fr
        |), vn_d AS (
        |  SELECT DISTINCT doc_id, hh FROM vn_h
        |), vn_cap AS (
        |  SELECT hh FROM vn_d GROUP BY hh HAVING count(*) <= 100
        |), vn_cd AS (
        |  SELECT d.doc_id, d.hh FROM vn_d d JOIN vn_cap USING (hh)
        |), vn_sz AS (
        |  SELECT doc_id, count(*) AS n FROM vn_cd GROUP BY 1
        |), vn_pr AS (
        |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |    count(*) AS n_shared
        |  FROM vn_cd a JOIN vn_cd b2 USING (hh)
        |  WHERE a.doc_id < b2.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |)
        |SELECT p.doc_a, p.doc_b, p.n_shared,
        |  CAST(p.n_shared AS DOUBLE) / (sa.n + sb.n - p.n_shared)
        |    AS jaccard
        |FROM vn_pr p
        |JOIN vn_sz sa ON sa.doc_id = p.doc_a
        |JOIN vn_sz sb ON sb.doc_id = p.doc_b""".stripMargin,

    // unique-(hash, len) chunk bytes over total payload bytes — the
    // sums feed straight into DOUBLE casts / BIGINT casts, no HUGEINT
    "mm_cdc_savings" ->
      s"""WITH $CdcChunkCtes, sv_t AS (
         |  SELECT CAST(sum(chunk_len) AS BIGINT) AS total_bytes FROM cdc_hs
         |), sv_u AS (
         |  SELECT CAST(sum(chunk_len) AS BIGINT) AS stored_bytes,
         |    count(*) AS n_unique_chunks
         |  FROM (SELECT DISTINCT hh, chunk_len FROM cdc_hs)
         |)
         |SELECT total_bytes, stored_bytes, n_unique_chunks,
         |  CAST(stored_bytes AS DOUBLE) / CAST(total_bytes AS DOUBLE)
         |    AS stored_ratio,
         |  CAST(total_bytes AS DOUBLE) / CAST(stored_bytes AS DOUBLE)
         |    AS dedup_factor
         |FROM sv_t, sv_u""".stripMargin,

    // the same chunk fingerprints grouped per (a, b) pair through the
    // df-capped inverted index, with the exact-rational Jaccard
    "mm_cdc_neardup" ->
      s"""WITH $CdcChunkCtes, $CdcPairCtes
         |SELECT p.doc_a, p.doc_b, p.n_shared,
         |  CAST(p.n_shared AS DOUBLE) / (sa.n + sb.n - p.n_shared)
         |    AS jaccard
         |FROM cdc_pr p
         |JOIN cdc_sz sa ON sa.doc_id = p.doc_a
         |JOIN cdc_sz sb ON sb.doc_id = p.doc_b""".stripMargin,

    // connected components of the thresholded pair graph — the
    // dedup_clusters recursive-CTE replay over the CDC evidence
    "mm_cdc_clusters" ->
      s"""WITH RECURSIVE $CdcChunkCtes, $CdcPairCtes, pj AS (
         |  SELECT p.doc_a AS src, p.doc_b AS dst
         |  FROM cdc_pr p
         |  JOIN cdc_sz sa ON sa.doc_id = p.doc_a
         |  JOIN cdc_sz sb ON sb.doc_id = p.doc_b
         |  WHERE CAST(p.n_shared AS DOUBLE) / (sa.n + sb.n - p.n_shared)
         |        >= 0.5
         |), ed AS (
         |  SELECT src, dst FROM pj UNION SELECT dst, src FROM pj
         |), reach(id, label) AS (
         |  SELECT DISTINCT src, src FROM ed
         |  UNION
         |  SELECT ed.src, r.label FROM ed JOIN reach r ON ed.dst = r.id
         |), comp AS (
         |  SELECT id, min(label) AS cluster_id FROM reach GROUP BY id
         |), cs AS (
         |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1
         |)
         |SELECT comp.id AS doc_id, comp.cluster_id, cs.cluster_size
         |FROM comp JOIN cs USING (cluster_id)""".stripMargin,

    // the frame-window arithmetic + wrapping 31h+b fold replayed from the
    // hex payload; the HUGEINT hash folds back to Spark's signed long
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |    hex(encode(text)) AS hx
        |  FROM documents WHERE doc_id % 3 = 2
        |), fr AS (
        |  SELECT doc_id, len, hx, len // (1 + len % 8) AS stride,
        |    unnest(range(0, 1 + len % 8, 2)) AS i
        |  FROM m
        |), h AS (
        |  SELECT doc_id, i, i * stride AS off,
        |    least(i * stride + stride, len) - i * stride AS flen,
        |    list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |      list_transform(range(i * stride, least(i * stride + stride, len)),
        |        j -> CAST(16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
        |                  + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
        |             AS HUGEINT))),
        |      (acc, x) -> (31 * acc + x) % 18446744073709551616::HUGEINT) AS hh
        |  FROM fr
        |)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |  CAST(off AS INTEGER) AS frame_off, CAST(flen AS INTEGER) AS frame_len,
        |  CAST(CASE WHEN hh >= 9223372036854775808::HUGEINT
        |            THEN hh - 18446744073709551616::HUGEINT ELSE hh END
        |       AS BIGINT) AS frame_hash
        |FROM h""".stripMargin,

    // frame byte sums replayed as plain BIGINT folds (no wrapping —
    // stride·255 is tiny); same equal-stride frame grid as the sampler
    "mm_scene_cuts" ->
      s"""WITH $SceneCutCtes
         |SELECT doc_id, frame_idx, frame_sum, delta, is_cut
         |FROM scc""".stripMargin,

    // shot assembly + per-shot max-intensity argmax over the scene-cut
    // relation: running cut count as shot_id, descending row_number for
    // the keyframe (composite-key arg_max is engine-unportable)
    "mm_video_keyframes" ->
      s"""WITH $SceneCutCtes, kf_sh AS (
         |  SELECT *, CAST(sum(CASE WHEN is_cut THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY frame_idx) AS BIGINT)
         |    AS shot_id
         |  FROM scc
         |), kf_r AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY doc_id, shot_id
         |      ORDER BY frame_sum DESC, frame_idx ASC) AS rn,
         |    count(*) OVER (PARTITION BY doc_id, shot_id) AS n_frames,
         |    min(frame_idx) OVER (PARTITION BY doc_id, shot_id)
         |      AS shot_start,
         |    max(frame_idx) OVER (PARTITION BY doc_id, shot_id)
         |      AS shot_end
         |  FROM kf_sh
         |)
         |SELECT doc_id, shot_id, frame_idx AS keyframe_idx,
         |  frame_sum AS key_sum, n_frames, shot_start, shot_end
         |FROM kf_r WHERE rn = 1""".stripMargin,

    // audio stub replay: same hex-pair byte extraction, plain BIGINT
    // arithmetic (no wrapping — window energy tops out at 200·128²)
    "mm_audio_windows" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |    hex(encode(text)) AS hx
        |  FROM documents WHERE doc_id % 3 = 1
        |), w AS (
        |  SELECT doc_id, hx, unnest(range(0, len // 200)) AS i
        |  FROM m WHERE len >= 200
        |), b AS (
        |  SELECT doc_id, i, i * 200 AS off,
        |    list_transform(range(i * 200, i * 200 + 200),
        |      j -> 16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
        |           + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
        |           - 128) AS cs
        |  FROM w
        |)
        |SELECT doc_id, CAST(i AS INTEGER) AS win_idx,
        |  CAST(off AS INTEGER) AS win_off,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(cs, c -> CAST(c * c AS BIGINT))),
        |    (acc, x) -> acc + x) AS energy,
        |  CAST(list_max(list_transform(cs, c -> abs(c))) AS INTEGER) AS peak
        |FROM b""".stripMargin,

    // the same hex-decoded energy series, lag/lead peak test, and
    // target-zone pair ranking; the hash is pure integer arithmetic
    "mm_audio_fingerprints" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |    hex(encode(text)) AS hx
        |  FROM documents WHERE doc_id % 3 = 1
        |), w AS (
        |  SELECT doc_id, hx, unnest(range(0, len // 16)) AS i
        |  FROM m WHERE len >= 16
        |), en AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS t,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(
        |        list_transform(range(i * 16, i * 16 + 16),
        |          j -> 16 * (strpos('0123456789ABCDEF',
        |                 substring(hx, 2*j + 1, 1)) - 1)
        |               + (strpos('0123456789ABCDEF',
        |                 substring(hx, 2*j + 2, 1)) - 1)
        |               - 128),
        |        c -> CAST(c * c AS BIGINT))),
        |      (acc, x) -> acc + x) AS energy
        |  FROM w
        |), pk AS (
        |  SELECT doc_id, t, energy,
        |    coalesce(lag(energy) OVER (PARTITION BY doc_id ORDER BY t),
        |      -1) AS pe,
        |    coalesce(lead(energy) OVER (PARTITION BY doc_id ORDER BY t),
        |      -1) AS ne
        |  FROM en
        |), peaks AS (
        |  SELECT doc_id, t, energy FROM pk
        |  WHERE energy > pe AND energy >= ne
        |), pr AS (
        |  SELECT a.doc_id, a.t AS t1, b2.t - a.t AS dt,
        |    a.energy AS e1, b2.energy AS e2,
        |    row_number() OVER (PARTITION BY a.doc_id, a.t
        |      ORDER BY b2.t ASC) AS rk
        |  FROM peaks a JOIN peaks b2 ON a.doc_id = b2.doc_id
        |    AND b2.t > a.t AND b2.t <= a.t + 32
        |)
        |SELECT doc_id, CAST(t1 AS INTEGER) AS t1, CAST(dt AS INTEGER) AS dt,
        |  (e1 % 64) * 65536 + (e2 % 64) * 256 + dt AS h
        |FROM pr WHERE rk <= 3""".stripMargin,

    // the same presence digest, vocabulary cut, pair join, and the one
    // integer-operand double division
    "text_word_lift" ->
      """WITH wd AS (
        |  SELECT DISTINCT doc_id, word FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |    FROM documents)
        |  WHERE regexp_matches(word, '^[a-z]+$')
        |), vocab AS (
        |  SELECT word, count(*) AS n_w FROM wd GROUP BY 1
        |  ORDER BY n_w DESC, word ASC LIMIT 20
        |), p AS (
        |  SELECT wd.doc_id, wd.word, v.n_w
        |  FROM wd JOIN vocab v ON v.word = wd.word
        |), nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |pr AS (
        |  SELECT a.word AS word_a, b.word AS word_b,
        |    a.n_w AS n_a, b.n_w AS n_b, count(*) AS n_both
        |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.word < b.word
        |  GROUP BY 1, 2, 3, 4
        |)
        |SELECT word_a, word_b, n_a, n_b, n_both,
        |  CAST(n_both * n_docs AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS lift
        |FROM pr, nd""".stripMargin,

    // the window-energy replay + the voiced predicate (integer
    // cross-multiplication) + gaps-and-islands segment merge
    "mm_audio_segments" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |    hex(encode(text)) AS hx
        |  FROM documents WHERE doc_id % 3 = 1
        |), w AS (
        |  SELECT doc_id, hx, unnest(range(0, len // 200)) AS i
        |  FROM m WHERE len >= 200
        |), b AS (
        |  SELECT doc_id, i,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(
        |        list_transform(range(i * 200, i * 200 + 200),
        |          j -> 16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
        |               + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
        |               - 128),
        |        c -> CAST(c * c AS BIGINT))),
        |      (acc, x) -> acc + x) AS energy,
        |    CAST(list_max(list_transform(
        |      list_transform(range(i * 200, i * 200 + 200),
        |        j -> 16 * (strpos('0123456789ABCDEF', substring(hx, 2*j + 1, 1)) - 1)
        |             + (strpos('0123456789ABCDEF', substring(hx, 2*j + 2, 1)) - 1)
        |             - 128),
        |      c -> abs(c))) AS BIGINT) AS peak
        |  FROM w
        |), t AS (
        |  SELECT doc_id, sum(energy) AS tot, count(*) AS cnt
        |  FROM b GROUP BY 1
        |), v AS (
        |  SELECT b.doc_id, b.i, b.energy, b.peak
        |  FROM b JOIN t ON b.doc_id = t.doc_id
        |  WHERE b.energy * t.cnt > t.tot
        |), g AS (
        |  SELECT *, i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
        |    AS grp
        |  FROM v
        |)
        |SELECT doc_id, min(i) AS seg_start, max(i) AS seg_end,
        |  count(*) AS n_windows, CAST(sum(energy) AS BIGINT) AS seg_energy,
        |  max(peak) AS seg_peak
        |FROM g GROUP BY doc_id, grp""".stripMargin,

    "sim_label_centroid" ->
      """WITH un AS (
        |  SELECT label, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings
        |)
        |SELECT label, CAST(pos AS BIGINT) AS pos,
        |  round(CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)
        |        / count(*), 6) AS c
        |FROM un GROUP BY label, pos""".stripMargin,
  )
}
