package graft

import org.apache.spark.sql.functions._

import graft.analysis.RateAnalysis
import graft.fixtures.RateFixtures
import graft.model.Tables
import graft.report.ReportSink

class RateAnalysisSpec extends SparkSuite {

  private def fixture = RateFixtures.exchangeRates(spark)
  private def cutoff = expr(RateFixtures.CutoffSql)

  test("Task B report: inner join, argmax latest, 2nd-latest previous, signed pct") {
    val out = RateAnalysis.rateChangeReport(fixture, cutoff, "30 SECONDS")
      .orderBy("ccy_couple").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("AUD/CAD", "EUR/USD"))
    val byPair = out.map(r => r.getString(0) -> r.getString(2)).toMap
    assert(byPair("EUR/USD") == "3.57%")   // (1.16-1.12)/1.12*100
    assert(byPair("AUD/CAD") == "-0.16%")  // (0.91451-0.916)/0.916*100
  }

  test("Task A report: LEFT join emits the 'No Previous Rate' sentinel") {
    val out = RateAnalysis.rateChangeReportTaskA(fixture, cutoff, "30 SECONDS")
      .orderBy("ccy_couple").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("AUD/CAD", "EUR/USD", "GBP/USD"))
    assert(out.find(_.getString(0) == "GBP/USD").get.getString(2) == "No Previous Rate")
  }

  test("golden console format matches the reference byte-for-byte") {
    val got = ReportSink.format(
      RateAnalysis.rateChangeReport(fixture, cutoff, "30 SECONDS"))
    val pad = (s: String) => s + " " * (15 - s.length)
    val expected = Seq(
      pad("Currency Pair") + " " + pad("Current Rate") + " " + pad("% Change"),
      "=" * 60,
      pad("AUD/CAD") + " " + pad("0.914510") + "  " + pad("-0.16%"),
      pad("EUR/USD") + " " + pad("1.160000") + "  " + pad("3.57%"),
      "Results displayed successfully.").mkString("\n")
    assert(got == expected)
  }

  test("upsert tiebreak: duplicate (pair, date) resolves to the later ingest") {
    val latest = RateAnalysis.latestPerPair(
      RateAnalysis.activeRates(fixture, "30 SECONDS"))
    val eur = latest.where(col("ccy_couple") === "EUR/USD").collect().head
    assert(eur.getDecimal(3).doubleValue() == 1.16)
  }

  test("three previous-rate formulations agree (window, join-agg, correlated SQL)") {
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("ccy_couple"),
          col("previous_rate").cast("double"), col("previous_event_time"))
        .collect().map(_.toSeq).toSet
    val a = key(RateAnalysis.previousRates(fixture, cutoff))
    val b = key(RateAnalysis.previousRatesJoinAgg(fixture, cutoff))
    val c = key(RateAnalysis.previousRatesCompatSql(fixture, RateFixtures.CutoffSql))
    assert(a == b)
    assert(a == c)
  }

  test("formulations also agree on real data (sf0.001)") {
    val rates = Tables.rates(spark, sf("sf0.001"))
    val cut = expr("TIMESTAMP '2024-01-20 17:00:00'")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("ccy_couple", "previous_rate", "previous_event_time")
        .collect().map(_.toSeq).toSet
    val a = key(RateAnalysis.previousRates(rates, cut))
    val b = key(RateAnalysis.previousRatesJoinAgg(rates, cut))
    val c = key(RateAnalysis.previousRatesCompatSql(rates,
      "TIMESTAMP '2024-01-20 17:00:00'"))
    assert(a.nonEmpty)
    assert(a == b)
    assert(a == c)
  }
}
