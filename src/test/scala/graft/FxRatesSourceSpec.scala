package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.FxJson

class FxRatesSourceSpec extends SparkSuite {

  test("DataSourceV2 source: one partition per pair file, flattened rows") {
    val dir = Files.createTempDirectory("fxsrc").toFile
    def write(name: String, payload: String): Unit =
      Files.writeString(new java.io.File(dir, name).toPath, payload)
    write("EUR_USD.json", FxJson.fixturePayload(
      Seq("2024-01-15", "2024-01-16"),
      Seq(BigDecimal("1.092500"), BigDecimal("1.094200"))))
    write("USD_JPY.json", FxJson.fixturePayload(
      Seq("2024-01-16"), Seq(BigDecimal("147.350000"))))

    val df = spark.read.format("graft.sources.FxRatesSource")
      .option("path", dir.getAbsolutePath).load()
    assert(df.rdd.getNumPartitions == 2) // one request/partition per pair
    val rows = df.orderBy("ccy_couple", "quote_date").collect()
    assert(rows.length == 3)
    val eur16 = rows(1)
    assert(eur16.getString(0) == "EUR/USD")
    assert(eur16.getDouble(2) == 1.0942)
    assert(eur16.getLong(1) == 1705363200000L)
    // schema round-trips into the analysis model
    assert(df.where(col("date") === to_date(lit("2024-01-16"))).count() == 2)
  }
}
