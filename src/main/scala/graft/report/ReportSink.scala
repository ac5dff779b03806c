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
}
