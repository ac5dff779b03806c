package graft

import org.apache.spark.sql.functions._

import graft.ingest.FxJson

class FxJsonSpec extends SparkSuite {

  private def payloads = {
    import spark.implicits._
    Seq(
      ("EUR", "USD", FxJson.fixturePayload(
        Seq("2024-01-15", "2024-01-16"),
        Seq(BigDecimal("1.092500"), BigDecimal("1.094200")))),
      ("USD", "JPY", FxJson.fixturePayload(
        Seq("2024-01-16"), Seq(BigDecimal("147.350000"))))
    ).toDF("base_currency", "target_currency", "payload")
  }

  test("payload flatten: one row per quote date, close → DECIMAL(10,6) rate") {
    val out = FxJson.parsePayloads(payloads)
    assert(out.count() == 3)
    val eur16 = out.where(col("ccy_couple") === "EUR/USD" &&
      col("event_time") === lit(1705363200000L)).collect().head
    assert(eur16.getAs[java.math.BigDecimal]("rate").toPlainString == "1.094200")
    // OHLC retained as optional columns (reference discards them)
    assert(out.columns.toSet.intersect(Set("open", "high", "low")).size == 3)
  }

  test("pair naming: Task B slashed vs Task A concatenated") {
    val slashed = FxJson.parsePayloads(payloads, slashName = true)
      .select("ccy_couple").distinct().collect().map(_.getString(0)).toSet
    val concat = FxJson.parsePayloads(payloads, slashName = false)
      .select("ccy_couple").distinct().collect().map(_.getString(0)).toSet
    assert(slashed == Set("EUR/USD", "USD/JPY"))
    assert(concat == Set("EURUSD", "USDJPY"))
  }

  test("currency config is the 11-currency cross minus identity (110 pairs)") {
    assert(FxJson.currencyPairs(spark).count() == 110)
  }

  test("config CSV reader round-trips the generated pair set") {
    val dir = java.nio.file.Files.createTempDirectory("pairs").toFile
    val f = new java.io.File(dir, "currency_pairs.csv")
    val generated = FxJson.currencyPairs(spark)
    val csv = "base_currency,target_currency\n" +
      generated.collect().map(r => s"${r.getString(0)},${r.getString(1)}")
        .mkString("\n")
    java.nio.file.Files.writeString(f.toPath, csv)
    val read = FxJson.currencyPairsFromCsv(spark, f.getAbsolutePath)
    assert(read.collect().map(_.toSeq).toSet ==
      generated.collect().map(_.toSeq).toSet)
  }

  test("typed Dataset view exposes the reference row type") {
    val ds = graft.model.Tables.ratesTyped(spark, sf("sf0.001"))
    val first = ds.head()
    assert(first.ccy_couple.nonEmpty && first.rate > 0)
    assert(ds.filter(_.event_time > 0).count() == 1000)
  }
}
