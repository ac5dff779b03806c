package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's analysis-query semantics (SURVEY.md §2.3-§2.7), Spark-first.
  *
  * The reference runs one MySQL statement per task
  * (/root/reference/Fx_1min.py:147-217, /root/reference/update_exchange_rates.py:110-235)
  * whose dataflow is: recency filter → latest-per-pair window → as-of
  * previous-rate lookup → join → percent-change projection. Here each stage
  * is a named, composable DataFrame transformation so Catalyst sees one
  * declarative plan (filter pushdown + WindowGroupLimit + broadcast joins
  * all apply).
  *
  * Expected input schema: Tables.rateEventSchema
  * (event_id, event_time, ccy_couple, rate, date, timestamp).
  */
object RateAnalysis {

  /** P2/A1 (Fx_1min.py:156): rows within `activeWindow` of the max ingestion
    * timestamp. The 1-row aggregate is broadcast, so this stays a single
    * scan + broadcast-nested-loop filter at any scale — no window-over-
    * empty-partition collapse onto one task.
    */
  def activeRates(rates: DataFrame, activeWindow: String = "30 SECONDS"): DataFrame = {
    val maxTs = rates.agg(max(col("timestamp")).as("__max_ts"))
    rates.join(broadcast(maxTs),
        col("timestamp") >= col("__max_ts") - expr(s"INTERVAL $activeWindow"))
      .drop("__max_ts")
  }

  private def latestFirst = Window.partitionBy("ccy_couple")
    .orderBy(col("event_time").desc, col("event_id").desc)

  /** W1/P4 (Fx_1min.py:165-172): latest row per pair — top-1-per-group.
    * Catalyst's InferWindowGroupLimit turns the rn=1 filter into
    * WindowGroupLimitExec (no full per-partition sort materialization).
    * event_id is a deterministic tiebreak the reference leaves to chance.
    */
  def latestPerPair(rates: DataFrame): DataFrame =
    rates.withColumn("rn", row_number().over(latestFirst))
      .where(col("rn") === 1).drop("rn")

  /** A2 (Fx_1min.py:182-188): per-pair max event time at-or-before cutoff,
    * plus the rate at that max (the reference recomputes it with a
    * correlated subquery; `max_by` is the native argmax).
    */
  def maxPerPair(rates: DataFrame, cutoff: Column): DataFrame =
    rates.where(col("date") <= cutoff)
      .groupBy("ccy_couple")
      .agg(max(col("event_time")).as("max_event_time"),
        max_by(col("rate"), col("event_time")).as("rate_at_max"))

  /** J1+J3+A3 (Fx_1min.py:175-197): the "previous rate" — the 2nd-latest
    * event at-or-before the cutoff. The reference spells this as a theta
    * join plus a correlated scalar MAX subquery; since event dates are
    * monotone with event times, it is exactly row_number()=2 over the
    * cutoff subset — one shuffle instead of three.
    */
  def previousRates(rates: DataFrame, cutoff: Column): DataFrame =
    rates.where(col("date") <= cutoff)
      .withColumn("rn", row_number().over(latestFirst))
      .where(col("rn") === 2)
      .select(col("ccy_couple"),
        col("rate").as("previous_rate"),
        col("event_time").as("previous_event_time"))

  /** [[previousRates]] in the reference's own dataflow shape — grouped max
    * per pair, theta join (J1), then argmax-before (A3) — but decorrelated
    * BY HAND into equi-join + hash aggregate. Catalyst's automatic
    * decorrelation of the reference's correlated scalar MAX plans a
    * BroadcastNestedLoopJoin over the (pair, bound) domain (measured 50 s
    * at sf0.1 vs ~1 s for this form), which would never survive cluster
    * scale; this is the rewrite SURVEY §4 calls for. The pair dimension is
    * tiny after the group-by, so AQE picks a broadcast-hash join at runtime.
    */
  def previousRatesJoinAgg(rates: DataFrame, cutoff: Column): DataFrame = {
    val lr = rates.where(col("date") <= cutoff)
      .groupBy("ccy_couple").agg(max(col("event_time")).as("max_event_time"))
    rates.join(lr, Seq("ccy_couple"))
      .where(col("event_time") < col("max_event_time"))
      .groupBy("ccy_couple")
      .agg(max_by(col("rate"), col("event_time")).as("previous_rate"),
        max(col("event_time")).as("previous_event_time"))
  }

  /** The literal reference shape of [[previousRates]] — grouped-max + theta
    * join + correlated scalar subquery (Fx_1min.py:180-196) — kept to
    * exercise Catalyst's RewriteCorrelatedScalarSubquery decorrelation.
    * Semantically identical to [[previousRates]] when (ccy_couple,
    * event_time) is unique.
    */
  def previousRatesCompatSql(rates: DataFrame, cutoffSql: String): DataFrame = {
    val spark = rates.sparkSession
    val view = s"__rates_compat_${System.identityHashCode(rates).toHexString}"
    rates.createOrReplaceTempView(view)
    spark.sql(
      s"""WITH lr AS (
         |  SELECT ccy_couple, MAX(event_time) AS max_event_time
         |  FROM $view WHERE date <= $cutoffSql GROUP BY ccy_couple
         |)
         |SELECT e1.ccy_couple,
         |       e1.rate AS previous_rate,
         |       e1.event_time AS previous_event_time
         |FROM $view e1
         |JOIN lr ON e1.ccy_couple = lr.ccy_couple
         |       AND e1.event_time < lr.max_event_time
         |WHERE e1.event_time = (
         |  SELECT MAX(e2.event_time) FROM $view e2
         |  WHERE e2.ccy_couple = e1.ccy_couple
         |    AND e2.event_time < lr.max_event_time)
         |""".stripMargin)
  }

  /** F2/F3 (Fx_1min.py:207-210): ((cur - prev) / prev) * 100, rounded to
    * 2 dp. Routed through DecimalType so rounding is HALF_UP in every
    * engine (MySQL, DuckDB, Spark) instead of double-formatting luck.
    */
  def pctChange(cur: Column, prev: Column): Column =
    round(((cur - prev) / prev * 100).cast(DecimalType(28, 10)), 2)

  /** F1/F4 (Fx_1min.py:204-213): the report string, with the Task A
    * 'No Previous Rate' sentinel (update_exchange_rates.py:203).
    */
  def pctChangeLabel(cur: Column, prev: Column): Column =
    when(prev.isNull, lit("No Previous Rate"))
      .otherwise(concat(pctChange(cur, prev).cast("string"), lit("%")))

  /** The full Task B statement in one spark.sql CTE pipeline — the
    * reference's single-SQL-statement shape (Fx_1min.py:147-217:
    * ActiveRates → LatestRates → PreviousRates → report), with the two
    * scalability substitutions this engine standardizes on: an explicit
    * event_id tiebreak in the rank, and PreviousRates as window rn=2
    * instead of the correlated MAX (see [[previousRatesJoinAgg]] for why).
    */
  def taskBCompatSql(rates: DataFrame, cutoffSql: String,
      activeWindowSql: String): DataFrame = {
    val spark = rates.sparkSession
    val view = s"__rates_stmt_${System.identityHashCode(rates).toHexString}"
    rates.createOrReplaceTempView(view)
    spark.sql(
      s"""WITH ActiveRates AS (
         |  SELECT ccy_couple, rate, event_time AS event_date_time, event_id
         |  FROM $view
         |  WHERE `timestamp` >= (SELECT MAX(`timestamp`) FROM $view)
         |                       - INTERVAL $activeWindowSql
         |),
         |LatestRates AS (
         |  SELECT ccy_couple, rate AS current_rate
         |  FROM (SELECT ccy_couple, rate,
         |          ROW_NUMBER() OVER (PARTITION BY ccy_couple
         |            ORDER BY event_date_time DESC, event_id DESC) AS rn
         |        FROM ActiveRates) ranked
         |  WHERE rn = 1
         |),
         |PreviousRates AS (
         |  SELECT ccy_couple, rate AS previous_rate
         |  FROM (SELECT ccy_couple, rate,
         |          ROW_NUMBER() OVER (PARTITION BY ccy_couple
         |            ORDER BY event_time DESC, event_id DESC) AS rn
         |        FROM $view WHERE date <= $cutoffSql) ranked
         |  WHERE rn = 2
         |)
         |SELECT l.ccy_couple, l.current_rate,
         |  CASE WHEN p.previous_rate IS NULL THEN 'No Previous Rate'
         |       ELSE CONCAT(CAST(ROUND(CAST((l.current_rate - p.previous_rate)
         |                / p.previous_rate * 100 AS DECIMAL(28,10)), 2)
         |              AS STRING), '%') END AS rate_change
         |FROM LatestRates l
         |JOIN PreviousRates p ON l.ccy_couple = p.ccy_couple
         |""".stripMargin)
  }

  /** Task A as one statement (update_exchange_rates.py:116-217): same CTE
    * pipeline plus the defensive dedup CTEs (independent MAX per pair —
    * not argmax, preserved bug-for-bug) and the final LEFT JOIN with the
    * 'No Previous Rate' sentinel.
    */
  def taskACompatSql(rates: DataFrame, cutoffSql: String,
      activeWindowSql: String): DataFrame = {
    val spark = rates.sparkSession
    val view = s"__rates_stmt_a_${System.identityHashCode(rates).toHexString}"
    rates.createOrReplaceTempView(view)
    spark.sql(
      s"""WITH ActiveRates AS (
         |  SELECT ccy_couple, rate, event_time AS event_date_time, event_id
         |  FROM $view
         |  WHERE `timestamp` >= (SELECT MAX(`timestamp`) FROM $view)
         |                       - INTERVAL $activeWindowSql
         |),
         |LatestRates AS (
         |  SELECT ccy_couple, rate AS current_rate,
         |         event_date_time AS current_event_date_time
         |  FROM (SELECT ccy_couple, rate, event_date_time,
         |          ROW_NUMBER() OVER (PARTITION BY ccy_couple
         |            ORDER BY event_date_time DESC, event_id DESC) AS rn
         |        FROM ActiveRates) ranked
         |  WHERE rn = 1
         |),
         |PreviousRates AS (
         |  SELECT ccy_couple, rate AS previous_rate,
         |         event_time AS previous_event_time
         |  FROM (SELECT ccy_couple, rate, event_time,
         |          ROW_NUMBER() OVER (PARTITION BY ccy_couple
         |            ORDER BY event_time DESC, event_id DESC) AS rn
         |        FROM $view WHERE date <= $cutoffSql) ranked
         |  WHERE rn = 2
         |),
         |DedupedLatest AS (
         |  SELECT ccy_couple, MAX(current_rate) AS current_rate,
         |         MAX(current_event_date_time) AS current_event_date_time
         |  FROM LatestRates GROUP BY ccy_couple
         |),
         |DedupedPrevious AS (
         |  SELECT ccy_couple, MAX(previous_rate) AS previous_rate,
         |         MAX(previous_event_time) AS previous_event_time
         |  FROM PreviousRates GROUP BY ccy_couple
         |)
         |SELECT l.ccy_couple, l.current_rate,
         |  CASE WHEN p.previous_rate IS NULL THEN 'No Previous Rate'
         |       ELSE CONCAT(CAST(ROUND(CAST((l.current_rate - p.previous_rate)
         |                / p.previous_rate * 100 AS DECIMAL(28,10)), 2)
         |              AS STRING), '%') END AS rate_change
         |FROM DedupedLatest l
         |LEFT JOIN DedupedPrevious p ON l.ccy_couple = p.ccy_couple
         |""".stripMargin)
  }

  /** Task B report (Fx_1min.py:147-217): INNER join latest×previous. */
  def rateChangeReport(rates: DataFrame, cutoff: Column,
      activeWindow: String = "30 SECONDS"): DataFrame = {
    val latest = latestPerPair(activeRates(rates, activeWindow))
      .select(col("ccy_couple"), col("rate").as("current_rate"),
        col("event_time").as("current_event_time"))
    latest.join(previousRates(rates, cutoff), Seq("ccy_couple"), "inner")
      .select(col("ccy_couple"), col("current_rate"),
        pctChangeLabel(col("current_rate"), col("previous_rate")).as("rate_change"))
  }

  /** Task A report (update_exchange_rates.py:110-235): same pipeline but
    * with the defensive dedup CTEs — independent MAX(rate), MAX(event_time)
    * per pair, which is NOT argmax (SURVEY §2.5 A4, preserved bug-for-bug)
    * — and a LEFT join that can emit the sentinel.
    */
  def rateChangeReportTaskA(rates: DataFrame, cutoff: Column,
      activeWindow: String = "30 SECONDS"): DataFrame = {
    val latest = latestPerPair(activeRates(rates, activeWindow))
      .groupBy("ccy_couple")
      .agg(max(col("rate")).as("current_rate"),
        max(col("event_time")).as("current_event_time"))
    val prev = previousRates(rates, cutoff)
      .groupBy("ccy_couple")
      .agg(max(col("previous_rate")).as("previous_rate"),
        max(col("previous_event_time")).as("previous_event_time"))
    latest.join(prev, Seq("ccy_couple"), "left_outer")
      .select(col("ccy_couple"), col("current_rate"),
        pctChangeLabel(col("current_rate"), col("previous_rate")).as("rate_change"))
  }

  /** OHLC daily bars (SURVEY §1.4: the reference discards open/high/low —
    * modeled here as the standard time-series bar aggregation). Per
    * (ccy_couple, date): first/max/min/last rate ordered by (event_time,
    * event_id) — the unique tiebreak makes every bar deterministic. ONE
    * hash aggregation: min_by/max_by carry (value, ordering) pairs through
    * partial aggregation, so there is no window sort and the shuffle moves
    * one combined row per (pair, day) per map task, not the tick stream.
    */
  def ohlcBars(rates: DataFrame): DataFrame =
    rates.groupBy(col("ccy_couple"), col("date"))
      .agg(
        min_by(col("rate"), struct(col("event_time"), col("event_id"))).as("open"),
        max(col("rate")).as("high"),
        min(col("rate")).as("low"),
        max_by(col("rate"), struct(col("event_time"), col("event_id"))).as("close"),
        count(lit(1)).as("n_ticks"))

  /** Quote CONFLATION — the ingest-side data-reduction every real rates
    * feed applies: keep only the LAST quote per (pair, time slot),
    * collapsing quote bursts to one row per grain. The shape is the
    * OHLC bar at a finer grain with only the close kept: ONE hash
    * aggregation whose max_by carries (value, ordering) pairs through
    * partial aggregation — map-side combine does the reduction inside
    * the scan, so a 100 TB burst-heavy feed shrinks before it ever
    * shuffles. `div` (integer division) keeps the slot arithmetic exact
    * and oracle-identical; the (event_time, event_id) tiebreak makes
    * the kept quote deterministic under equal-time bursts.
    */
  def conflate(rates: DataFrame, grainUs: Long = 1000000L): DataFrame =
    rates
      .withColumn("slot", expr(s"event_time div $grainUs"))
      .groupBy(col("ccy_couple"), col("slot"))
      .agg(
        max_by(col("event_id"), struct(col("event_time"), col("event_id")))
          .as("event_id"),
        max(col("event_time")).as("event_time"),
        max_by(col("rate"), struct(col("event_time"), col("event_id")))
          .as("rate"))
}
