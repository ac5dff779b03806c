package graft.report

import org.apache.spark.sql.DataFrame

/** K3 (SURVEY §2.2): the reference's fixed-width console report, format
  * preserved byte-for-byte from /root/reference/Fx_1min.py:223-228 /
  * update_exchange_rates.py:222-226 (golden renders: PDF p.5-6):
  *
  * {{{
  * Currency Pair   Current Rate    % Change
  * ============================================================
  * AUD/CAD         0.914510         0.17%
  * }}}
  *
  * Input schema: (ccy_couple, current_rate, rate_change). Rows are ordered
  * by pair for determinism — the reference relies on MySQL's incidental
  * ordering (SURVEY §2.8). The collect is bounded by the number of currency
  * pairs (the report is per-pair), so a driver-side format is correct even
  * when the underlying table is huge.
  */
object ReportSink {

  def format(report: DataFrame): String = {
    val rows = report.select("ccy_couple", "current_rate", "rate_change")
      .orderBy("ccy_couple").collect()
    val sb = new StringBuilder
    sb.append(f"${"Currency Pair"}%-15s ${"Current Rate"}%-15s ${"% Change"}%-15s\n")
    sb.append("=" * 60).append('\n')
    rows.foreach { r =>
      val rate = r.get(1) match {
        case d: java.math.BigDecimal => d.doubleValue()
        case d: Double => d
        case x => x.toString.toDouble
      }
      sb.append(f"${r.getString(0)}%-15s $rate%-15.6f  ${r.getString(2)}%-15s\n")
    }
    sb.append("Results displayed successfully.")
    sb.toString
  }

  def print(report: DataFrame): Unit = Console.println(format(report))

  /** The same golden render as [[format]], but DISTRIBUTED: one row per
    * output line, `(line_no, line)`, so the byte-exact console shape can
    * be hash-gated against a SQL oracle instead of living only in a
    * driver-side spec. Line numbering: 0 = header, 1 = separator,
    * 2..n+1 = body rows in `ccy_couple` order, n+2 = footer.
    *
    * Rendering discipline: the 6-dp rate is built by integer math
    * (`floor(rate·10⁶ + 0.5)` — the repo's half-up float→int recipe) and
    * `format_string`, never `%f` on a double, so Spark and DuckDB agree
    * bit-for-bit; padding emulates `%-15s` exactly (pad-only — `rpad`
    * alone TRUNCATES strings over 15 chars, e.g. Task A's 16-char
    * 'No Previous Rate' sentinel, where printf padding never does).
    * The global window runs on the report digest (one row per currency
    * pair), never a corpus — same bound as [[format]]'s collect.
    */
  def lines(report: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    def pad15(c: org.apache.spark.sql.Column) =
      when(length(c) < 15, rpad(c, 15, " ")).otherwise(c)
    val micro = floor(col("current_rate").cast("double") * lit(1000000.0)
      + lit(0.5)).cast("long")
    val intpart = (micro / lit(1000000)).cast("long")
    val frac = (micro - intpart * lit(1000000L)).cast("int")
    val body = report.select(
      (row_number().over(Window.orderBy(col("ccy_couple"))).cast("long")
        + lit(1L)).as("line_no"),
      concat(
        pad15(col("ccy_couple")), lit(" "),
        pad15(format_string("%d.%06d", intpart, frac)), lit("  "),
        pad15(col("rate_change"))).as("line"))
    val counts = report.agg(count(lit(1)).as("nrows"))
    val header = counts.select(lit(0L).as("line_no"), lit(HeaderLine).as("line"))
    val sep = counts.select(lit(1L).as("line_no"), lit("=" * 60).as("line"))
    val footer = counts.select((col("nrows") + lit(2L)).as("line_no"),
      lit(FooterLine).as("line"))
    header.unionAll(sep).unionAll(body).unionAll(footer)
  }

  /** Rendered by the SAME Java format string [[format]] uses, so the
    * literal the gate (and its oracle) pins is the golden header by
    * construction, not a hand-transcribed copy.
    */
  val HeaderLine: String =
    f"${"Currency Pair"}%-15s ${"Current Rate"}%-15s ${"% Change"}%-15s"

  val FooterLine: String = "Results displayed successfully."
}
