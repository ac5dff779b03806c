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

  test("insertIfAbsent drops rows whose key already exists") {
    val existing = fixture.where(col("event_id") <= 9)
    val incoming = fixture // superset: 2 JPY rows are genuinely new
    val inserted = MergeOps.insertIfAbsent(incoming, existing, keys)
    assert(inserted.select("ccy_couple").distinct().collect()
      .map(_.getString(0)).toSet == Set("JPY/USD"))
    assert(inserted.count() == 2)
  }
}
