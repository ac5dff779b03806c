package graft

import org.apache.spark.sql.functions._

import graft.report.ReportSink

/** Ties the DISTRIBUTED golden render ([[ReportSink.lines]] — the
  * fx_report_golden gate's operator) byte-for-byte to the driver-side
  * [[ReportSink.format]] the PDF p.5-6 golden spec pins, including the
  * 16-char 'No Previous Rate' sentinel that plain rpad would truncate.
  */
class ReportSinkSpec extends SparkSuite {

  test("lines() reassembles to exactly format(), sentinel row included") {
    import spark.implicits._
    val report = Seq(
      ("AUD/CAD", 0.914510, "-0.16%"),
      ("EUR/USD", 1.160000, "3.57%"),
      ("GBP/JPY", 123.456789, "No Previous Rate"))
      .toDF("ccy_couple", "current_rate", "rate_change")
    val fromLines = ReportSink.lines(report)
      .orderBy(col("line_no")).collect().map(_.getString(1)).mkString("\n")
    assert(fromLines == ReportSink.format(report))
  }

  test("lines() equals format() on the real sf0.001 Task B report") {
    // the fixture test can't rule out a divergence between Java's
    // %-15.6f (exact-binary HALF_UP) and the half-up integer recipe on
    // arbitrary doubles — the real report's rates exercise it
    val report = graft.analysis.RateAnalysis.rateChangeReport(
      graft.model.Tables.rates(spark, sf("sf0.001")),
      org.apache.spark.sql.functions.expr("TIMESTAMP '2024-01-20 17:00:00'"),
      "7 DAYS")
    val fromLines = ReportSink.lines(report)
      .orderBy(col("line_no")).collect().map(_.getString(1)).mkString("\n")
    assert(fromLines == ReportSink.format(report))
  }

  test("line numbering: header 0, separator 1, body 2..n+1, footer n+2") {
    import spark.implicits._
    val report = Seq(("EUR/USD", 1.1, "0.10%"), ("AUD/CAD", 0.9, "0.20%"))
      .toDF("ccy_couple", "current_rate", "rate_change")
    val rows = ReportSink.lines(report).orderBy(col("line_no"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(rows(0)._2 == ReportSink.HeaderLine)
    assert(rows(1)._2 == "=" * 60)
    // body is ccy-ordered regardless of input order
    assert(rows(2)._2.startsWith("AUD/CAD"))
    assert(rows(3)._2.startsWith("EUR/USD"))
    assert(rows(4)._2 == ReportSink.FooterLine)
  }
}
