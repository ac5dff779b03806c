package graft

import org.apache.spark.sql.functions._

import graft.fixtures.RateFixtures
import graft.ingest.MergeOps

class MergeOpsSpec extends SparkSuite {

  private def fixture = RateFixtures.exchangeRates(spark)
  private val keys = Seq("ccy_couple", "date")
  private def ordering = Seq(col("timestamp"), col("event_id"))

  test("upsertLatest keeps one row per key, last writer wins") {
    val up = MergeOps.upsertLatest(fixture, keys, ordering)
    assert(up.count() == 10) // 11 rows, one duplicate (EUR/USD, Jan16)
    val eur16 = up.where(col("ccy_couple") === "EUR/USD" &&
      col("date") === to_timestamp(lit("2024-01-16"))).collect().head
    assert(eur16.getDecimal(3).doubleValue() == 1.16)
  }

  test("merge is idempotent: re-ingesting the same payload is a no-op") {
    val base = MergeOps.upsertLatest(fixture, keys, ordering)
    val again = MergeOps.merge(base, base, keys, ordering)
    assert(again.count() == base.count())
    assert(again.collect().map(_.toSeq).toSet == base.collect().map(_.toSeq).toSet)
  }

  test("date-partitioned layout: cutoff predicates prune partitions at planning") {
    val dir = java.nio.file.Files.createTempDirectory("rates_part").toFile
    val path = new java.io.File(dir, "rates").getAbsolutePath
    MergeOps.writeDatePartitioned(fixture, path)
    val read = spark.read.parquet(path)
      .where(col("p_date") <= lit("2024-01-12").cast("date"))
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(p_date"))
    assert(read.count() == 4) // only the Jan 10/12 partitions are read
    // files on disk really are split by day
    assert(new java.io.File(path).listFiles().count(_.getName.startsWith("p_date=")) == 4)
  }

  test("insertIfAbsent drops rows whose key already exists") {
    val existing = fixture.where(col("event_id") <= 9)
    val incoming = fixture // superset: 2 JPY rows are genuinely new
    val inserted = MergeOps.insertIfAbsent(incoming, existing, keys)
    assert(inserted.select("ccy_couple").distinct().collect()
      .map(_.getString(0)).toSet == Set("JPY/USD"))
    assert(inserted.count() == 2)
  }
}
