package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.RateAnalysis
import graft.ingest.MergeOps
import graft.model.Tables

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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RateAnalysis.rateChangeReport(
      rates(spark, "/root/testdata/sf0.001"), cutoff, ActiveWindowSpark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

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

    // Task A end-to-end report (A4 independent-MAX dedup + LEFT join J2)
    "fx_report_a" -> ((s, dir) =>
      RateAnalysis.rateChangeReportTaskA(rates(s, dir), cutoff, ActiveWindowSpark)),

    // K1: last-writer-wins upsert on (ccy_couple, date)
    "fx_upsert_latest" -> ((s, dir) =>
      MergeOps.upsertLatest(rates(s, dir), Seq("ccy_couple", "date"),
          Seq(col("timestamp"), col("event_id")))
        .select(col("ccy_couple"), col("date"), col("rate"), col("event_time"))),

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
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = ListMap(

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

    "fx_upsert_latest" ->
      s"""WITH $RatesCte
         |SELECT ccy_couple, date, rate, event_time
         |FROM (SELECT *, row_number() OVER (PARTITION BY ccy_couple, date
         |        ORDER BY "timestamp" DESC, event_id DESC) AS rn FROM rates)
         |WHERE rn = 1""".stripMargin,

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
  )
}
