package graft.fixtures

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic domain fixture reproducing the reference's data model
  * (FIXTURES.md §A1) with every scenario the analysis queries must
  * distinguish: multiple pre-cutoff quotes (latest vs 2nd-latest), a
  * post-cutoff quote, a duplicate (ccy_couple, date) ingested twice with
  * different rates (upsert last-write-wins), a pair with no pre-cutoff
  * history ('No Previous Rate' / inner-vs-left divergence), an inactive
  * pair outside the 30 s activity window, and a negative change (sign
  * formatting, PDF p.6 `AUD/CHF -0.08%`).
  *
  * Test clock: cutoff = 2024-01-15 17:00 UTC; max ingestion timestamp =
  * 2024-01-16 12:00:30.
  */
object RateFixtures {

  val CutoffSql = "TIMESTAMP '2024-01-15 17:00:00'"

  final case class RateRow(event_id: Long, event_time: Long,
      ccy_couple: String, rate: java.math.BigDecimal, date: Timestamp,
      timestamp: Timestamp)

  private def utcMs(s: String): Long =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli

  private def ts(s: String) = new Timestamp(utcMs(s))
  private def dec(s: String) = new java.math.BigDecimal(s).setScale(6)

  private def row(id: Long, pair: String, quoteDate: String, rate: String,
      ingest: String): RateRow =
    RateRow(id, utcMs(quoteDate + " 00:00:00"), pair, dec(rate),
      ts(quoteDate + " 00:00:00"), ts(ingest))

  /** All ingestion timestamps of active rows sit within 30 s of MaxIngest. */
  val rows: Seq[RateRow] = Seq(
    // EUR/USD: 3 pre-cutoff quotes + post-cutoff quote ingested twice
    // (last-writer-wins upsert: the 1.15 row is superseded by 1.16)
    row(1, "EUR/USD", "2024-01-10", "1.100000", "2024-01-16 12:00:10"),
    row(2, "EUR/USD", "2024-01-12", "1.120000", "2024-01-16 12:00:10"),
    row(3, "EUR/USD", "2024-01-15", "1.150000", "2024-01-16 12:00:10"),
    row(4, "EUR/USD", "2024-01-16", "1.150000", "2024-01-16 12:00:05"),
    row(5, "EUR/USD", "2024-01-16", "1.160000", "2024-01-16 12:00:20"),
    // AUD/CAD: negative change (current 0.914510 vs previous 0.916)
    row(6, "AUD/CAD", "2024-01-12", "0.916000", "2024-01-16 12:00:10"),
    row(7, "AUD/CAD", "2024-01-15", "0.920000", "2024-01-16 12:00:10"),
    row(8, "AUD/CAD", "2024-01-16", "0.914510", "2024-01-16 12:00:25"),
    // GBP/USD: no pre-cutoff history → 'No Previous Rate' in Task A,
    // dropped by Task B's inner join
    row(9, "GBP/USD", "2024-01-16", "1.270000", "2024-01-16 12:00:30"),
    // JPY/USD: stale ingestion (outside the 30 s activity window)
    row(10, "JPY/USD", "2024-01-12", "0.006800", "2024-01-16 11:00:00"),
    row(11, "JPY/USD", "2024-01-15", "0.006900", "2024-01-16 11:00:00"))

  def exchangeRates(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }
}
