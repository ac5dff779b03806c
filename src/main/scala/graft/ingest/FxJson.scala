package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion of the reference's REST payload shape (SURVEY §1.4, §2.1 S1/S5).
  *
  * The reference fetches Alpha-Vantage `FX_DAILY` JSON per currency pair
  * (/root/reference/Fx_1min.py:54-61) and flattens the
  * `"Time Series FX (Daily)"` object — a map of date → {"1. open", "2.
  * high", "3. low", "4. close"} — into one row per quote date, keeping only
  * the close (/root/reference/Fx_1min.py:70-76). Here the payload column is
  * parsed with `from_json` into a map and exploded; open/high/low are kept
  * as optional columns (the reference discards them — modeled for OHLC
  * extensions). Zero-egress: sources are fixture files/streams with the
  * identical shape, not the live API.
  */
object FxJson {

  val SeriesKey = "Time Series FX (Daily)"

  val payloadSchema: MapType =
    MapType(StringType, MapType(StringType, StringType))

  /** Input: (base_currency, target_currency, payload:String). Output: the
    * reference rate-event schema plus OHLC. `slashName=false` gives Task
    * A's concatenated pair naming (update_exchange_rates.py:72) vs Task
    * B's slashed naming (Fx_1min.py:71).
    *
    * `carryCols` are input columns threaded through the flatten unchanged
    * (e.g. the delivery `ingest_version` the streaming source parses from
    * the payload file name). The `timestamp` column stays processing-time
    * (the reference's CURRENT_TIMESTAMP, Fx_1min.py:103-110) but is NOT a
    * safe last-writer-wins version on a distributed engine — MySQL
    * serializes upserts, micro-batches don't; merge orderings must lead
    * with an explicit delivery version (see RateStream.mergeBatchWriter).
    */
  def parsePayloads(payloads: DataFrame, slashName: Boolean = true,
      payloadCol: String = "payload", carryCols: Seq[String] = Nil): DataFrame = {
    val pair =
      if (slashName) concat_ws("/", col("base_currency"), col("target_currency"))
      else concat(col("base_currency"), col("target_currency"))
    payloads
      .select(pair.as("ccy_couple") +:
        explode(get_json_map(col(payloadCol))).as(Seq("quote_date", "ohlc")) +:
        carryCols.map(col): _*)
      .select(
        Seq(col("ccy_couple"),
          unix_millis(to_timestamp(col("quote_date"), "yyyy-MM-dd")).as("event_time"),
          element_at(col("ohlc"), "4. close").cast(DecimalType(10, 6)).as("rate"),
          to_timestamp(col("quote_date"), "yyyy-MM-dd").as("date"),
          element_at(col("ohlc"), "1. open").cast(DecimalType(10, 6)).as("open"),
          element_at(col("ohlc"), "2. high").cast(DecimalType(10, 6)).as("high"),
          element_at(col("ohlc"), "3. low").cast(DecimalType(10, 6)).as("low"),
          current_timestamp().as("timestamp")) ++ carryCols.map(col): _*)
  }

  private def get_json_map(payload: org.apache.spark.sql.Column) =
    from_json(payload, StructType(Seq(StructField(SeriesKey, payloadSchema))))
      .getField(SeriesKey)

  /** Deterministic fixture payload in the exact Alpha-Vantage shape, for
    * tests and the file-backed source (no egress).
    */
  def fixturePayload(dates: Seq[String], closes: Seq[BigDecimal]): String = {
    val entries = dates.zip(closes).map { case (d, c) =>
      s""""$d": {"1. open": "${c - 0.001}", "2. high": "${c + 0.002}",
         |"3. low": "${c - 0.002}", "4. close": "$c"}""".stripMargin.replace("\n", " ")
    }
    s"""{"Meta Data": {"1. Information": "Forex Daily Prices"},
       |"$SeriesKey": {${entries.mkString(", ")}}}""".stripMargin.replace("\n", " ")
  }

  /** S3 (Fx_1min.py:251): read a `base_currency,target_currency` header
    * CSV into the broadcast-able config DataFrame.
    */
  def currencyPairsFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(col("base_currency"), col("target_currency"))

  /** The same config generated in code: the full 11-currency cross minus
    * identity (110 rows, mirroring currency_pairs.csv).
    */
  def currencyPairs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val ccys = Seq("USD", "EUR", "GBP", "JPY", "AUD", "CAD",
      "CHF", "CNY", "HKD", "SGD", "NZD")
    (for { b <- ccys; t <- ccys if b != t } yield (b, t))
      .toDF("base_currency", "target_currency")
  }
}
