package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.RateAnalysis
import graft.ingest.{FxJson, MergeOps}
import graft.report.ReportSink

/** The reference's full workflow end-to-end through this engine's pieces:
  * per-pair payload files → DataSourceV2 source → normalize → merge into a
  * date-partitioned rates table → analysis → byte-exact console report.
  * This is the "a user of the reference could switch" proof.
  */
class PipelineIntegrationSpec extends SparkSuite {

  test("source → merge → partitioned table → analysis → report") {
    val work = Files.createTempDirectory("fx_e2e").toFile
    val feed = new java.io.File(work, "feed"); feed.mkdirs()
    val table = new java.io.File(work, "rates").getAbsolutePath

    // 1. the polled feed drops per-pair FX_DAILY payloads
    def drop(name: String, dates: Seq[String], closes: Seq[String]): Unit =
      Files.writeString(new java.io.File(feed, name).toPath,
        FxJson.fixturePayload(dates, closes.map(BigDecimal(_))))
    drop("EUR_USD.json", Seq("2024-01-10", "2024-01-12", "2024-01-15", "2024-01-16"),
      Seq("1.100000", "1.120000", "1.150000", "1.160000"))
    drop("AUD_CAD.json", Seq("2024-01-12", "2024-01-15", "2024-01-16"),
      Seq("0.916000", "0.920000", "0.914510"))

    // 2. read through the DataSourceV2 source and normalize to the model
    val fetched = spark.read.format("graft.sources.FxRatesSource")
      .option("path", feed.getAbsolutePath).load()
      .withColumn("event_id",
        row_number().over(Window.orderBy("ccy_couple", "event_time")).cast("long"))
      .withColumn("timestamp", to_timestamp(lit("2024-01-16 12:00:10")))
      .select("event_id", "event_time", "ccy_couple", "rate", "date", "timestamp")

    // 3. merge into the date-partitioned rates table (two batches: the
    // second re-delivers Jan 16 EUR with a corrected close — upsert wins)
    MergeOps.writeDatePartitioned(fetched.where(col("ccy_couple") =!= "EUR/USD" ||
      col("event_time") < lit(1705363200000L)), table)
    val base = spark.read.parquet(table).drop("p_date")
    val redelivery = fetched.where(col("ccy_couple") === "EUR/USD" &&
      col("event_time") === lit(1705363200000L))
    val merged = MergeOps.merge(base, redelivery,
      Seq("ccy_couple", "date"), Seq(col("timestamp"), col("event_id")))
    MergeOps.writeDatePartitioned(merged, table)

    // 4. analysis at the NY-close cutoff over the stored table
    val rates = spark.read.parquet(table).drop("p_date")
    val report = RateAnalysis.rateChangeReport(rates,
      expr("TIMESTAMP '2024-01-15 17:00:00'"), "30 SECONDS")

    // 5. byte-exact reference report
    val got = ReportSink.format(report)
    val pad = (s: String) => s + " " * (15 - s.length)
    val expected = Seq(
      pad("Currency Pair") + " " + pad("Current Rate") + " " + pad("% Change"),
      "=" * 60,
      pad("AUD/CAD") + " " + pad("0.914510") + "  " + pad("-0.16%"),
      pad("EUR/USD") + " " + pad("1.160000") + "  " + pad("3.57%"),
      "Results displayed successfully.").mkString("\n")
    assert(got == expected)
  }
}
