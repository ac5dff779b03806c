package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market analytics the reference's FX users compute downstream of the
  * rate store: cross-rate triangulation, time-weighted average price, and
  * co-movement (correlation of daily changes). All three consume the
  * rate-event relation (Tables.rateEventSchema) and are designed around
  * the same scale shape: the tick corpus is first reduced to a bounded
  * per-pair digest (latest rate, one row per pair; daily close, one row
  * per pair-day), and ONLY the digest enters any pairwise join. At 100 TB
  * of ticks the digests stay |pairs| and |pairs|×|days| rows, so the
  * quadratic-in-pairs steps never touch the big table.
  *
  * Reference anchor: the rate model and pair naming come from
  * /root/reference/update_exchange_rates.py:32-43 (all pairs quoted
  * against a common base), which is what makes ratio triangulation
  * (EUR/JPY = EUR/USD ÷ JPY/USD) well-defined.
  */
object MarketAnalytics {

  /** Cross-rate triangulation: every synthetic pair is quoted against the
    * same implicit base (SURVEY §1.2 — `user_id` IS the foreign currency),
    * so the cross rate between currencies a and b is rate_a / rate_b over
    * the latest active quotes.
    *
    * Scale shape: activeRates is a broadcast-1-row filter on the scan and
    * latestPerPair is a WindowGroupLimit — the only full-data work. The
    * triangulation itself is a broadcast nested-loop self-join of the
    * |pairs|-row digest (both sides bounded by the currency universe, a
    * few hundred rows at any corpus size), so the quadratic blowup is
    * confined to a relation that never grows with tick volume.
    *
    * Determinism: the output rate is one IEEE double division of two
    * stored doubles — bit-identical on any engine; no accumulation order
    * exists.
    */
  def crossRates(rates: DataFrame, activeWindow: String): DataFrame = {
    val latest = RateAnalysis
      .latestPerPair(RateAnalysis.activeRates(rates, activeWindow))
      .select(col("ccy_couple"), col("rate"))
    val base = latest.select(col("ccy_couple").as("base_ccy"),
      col("rate").as("base_rate"))
    val quote = latest.select(col("ccy_couple").as("quote_ccy"),
      col("rate").as("quote_rate"))
    base.join(broadcast(quote), col("base_ccy") =!= col("quote_ccy"))
      .select(col("base_ccy"), col("quote_ccy"), col("base_rate"),
        col("quote_rate"),
        (col("base_rate") / col("quote_rate")).as("cross_rate"))
  }

  /** TWAP — time-weighted average price per pair per day: each quote is
    * weighted by its dwell time (micros until the next quote of the same
    * pair-day, or until midnight for the day's last quote), the weighting
    * a plain tick-mean gets wrong whenever quoting is bursty.
    *
    * Numerics: the weighted sum routes through exact decimals
    * (rate@DECIMAL(18,6) × dwell@DECIMAL(20,0) — both conversions exact
    * for 2-dp rates and integral micros) and divides in double only at
    * the output boundary, so distributed accumulation order cannot
    * perturb the hash. One shuffle on the pair key (the lead window and
    * the groupBy share the ccy_couple partitioning).
    */
  def twap(rates: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ccy_couple"), col("date"))
      .orderBy(col("event_time"), col("event_id"))
    val dayEndUs = unix_micros(
      date_add(col("date"), 1).cast("timestamp"))
    rates
      .withColumn("dwell_us",
        coalesce(lead(col("event_time"), 1).over(w), dayEndUs)
          - col("event_time"))
      .groupBy(col("ccy_couple"), col("date"))
      .agg(
        count(lit(1)).as("n_ticks"),
        // the summed unscaled value at scale 6 can top 2^53 (dwell is in
        // micros), where decimal->double conversion double-rounds
        // differently across engines; rates are 2-dp so the sum has only
        // two true decimals — the rescale to scale 2 is EXACT and pulls
        // the unscaled value back below 2^53 (exact int->double + one
        // division rounding, identical everywhere)
        (sum(col("rate").cast("decimal(18,6)")
            * col("dwell_us").cast("decimal(20,0)"))
          .cast("decimal(38,2)").cast("double")
          / sum(col("dwell_us")).cast("double")).as("twap"))
  }

  /** Co-movement: Pearson correlation of day-over-day close changes for
    * every unordered pair of currencies — the risk/hedging matrix.
    *
    * Built-in `corr` accumulates doubles in partition order, so its
    * low-order bits are nondeterministic under distribution; instead the
    * five moments (n, Σx, Σy, Σxy, Σx², Σy²) are accumulated as EXACT
    * decimals and the textbook formula runs once per pair-pair in double.
    * Daily changes are rounded to DECIMAL(12,3) first, which (a) is a
    * deterministic half-up rescale on identical inputs and (b) bounds
    * every moment's unscaled value below 2^53 so the final
    * decimal→double conversions are exact-integer-then-one-rounding,
    * identical across engines.
    *
    * Scale shape: the full scan reduces to the |pairs|×|days| daily-close
    * digest before anything quadratic; the pair-pair join is digest ⋈
    * digest on date (|days| × |pairs|² rows at most, independent of tick
    * volume) and the moment aggregation is map-side combinable.
    */
  def dailyChangeCorr(rates: DataFrame): DataFrame = {
    val close = rates.groupBy(col("ccy_couple"), col("date"))
      .agg(max_by(col("rate"), struct(col("event_time"), col("event_id")))
        .cast("decimal(18,6)").as("close"))
    val wd = Window.partitionBy(col("ccy_couple")).orderBy(col("date"))
    val chg = close
      .withColumn("chg", (col("close") - lag(col("close"), 1).over(wd))
        .cast("decimal(12,3)"))
      .where(col("chg").isNotNull)
      .select(col("ccy_couple"), col("date"), col("chg"))
    val a = chg.select(col("ccy_couple").as("ccy_a"), col("date"),
      col("chg").as("xa"))
    val b = chg.select(col("ccy_couple").as("ccy_b"), col("date"),
      col("chg").as("xb"))
    val moments = a.join(b, Seq("date"))
      .where(col("ccy_a") < col("ccy_b"))
      .groupBy(col("ccy_a"), col("ccy_b"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("xa")).cast("double").as("sx"),
        sum(col("xb")).cast("double").as("sy"),
        sum(col("xa") * col("xb")).cast("double").as("sxy"),
        sum(col("xa") * col("xa")).cast("double").as("sxx"),
        sum(col("xb") * col("xb")).cast("double").as("syy"))
    val n = col("n_days").cast("double")
    val cov = n * col("sxy") - col("sx") * col("sy")
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = n * col("syy") - col("sy") * col("sy")
    // vx*vy is >= 0 in exact arithmetic (Cauchy-Schwarz); double rounding
    // can land an all-equal series a hair below zero, so clamp THEN
    // null-out — degenerate (zero-variance) pairs get NULL, never NaN
    moments.select(col("ccy_a"), col("ccy_b"), col("n_days"),
      (cov / sqrt(nullif(greatest(vx * vy, lit(0.0)), lit(0.0))))
        .as("corr_chg"))
  }
}
