package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Fixture-drift tripwire. The driver has regenerated `/root/testdata`
  * between rounds with a DIFFERENT physical type for `events.ts`
  * (INT64 TIMESTAMP(NANOS) → TIMESTAMP_NTZ µs); when that happens again,
  * this suite must fail with ONE clear message instead of 53 opaque
  * analysis errors downstream.
  */
class TablesSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("events.ts raw physical type is a known era (nanos-long or timestamp)") {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val dt = raw.schema("ts").dataType
    assert(
      dt == LongType || dt == TimestampNTZType || dt == TimestampType,
      s"events.parquet ts arrived as $dt — the driver regenerated testdata " +
        "with a NEW physical type; teach Tables.events this era before " +
        "anything else (every fx_*/rates/streaming query depends on it)")
  }

  test("Tables.events normalizes ts to session-TZ TimestampType in every era") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    // values are sane epoch-range instants, not 1970-adjacent garbage
    // from a mis-scaled unit conversion
    val r = ev.agg(min(year(col("ts"))), max(year(col("ts")))).collect()(0)
    assert(r.getInt(0) >= 2000 && r.getInt(1) <= 2100)
  }

  test("Tables.events nanos-long era still converts integrally") {
    import spark.implicits._
    val tmp = graft.util.Scratch.dir("tables_ns_era").toString
    // 2024-01-01T00:00:00.000001500 — ns tail must TRUNCATE to 1 µs
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val ns = base.getEpochSecond * 1000000000L + 1500L
    Seq((1L, 7L, "view", 0.5, ns))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Tables.events(spark, tmp).select(unix_micros(col("ts")))
      .collect()(0).getLong(0)
    assert(got == base.getEpochSecond * 1000000L + 1L)
  }

  test("an unknown ts era fails loudly instead of casting silently") {
    import spark.implicits._
    val tmp = graft.util.Scratch.dir("tables_bad_era").toString
    Seq((1L, 7L, "view", 0.5, "2024-01-01 00:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, tmp) }
    assert(e.getMessage.contains("NEW physical type"))
  }

  test("rates view exposes the reference exchange-rates model") {
    val r = Tables.rates(spark, dir)
    assert(r.schema.fieldNames.toSeq ==
      Seq("event_id", "event_time", "ccy_couple", "rate", "date", "timestamp"))
    assert(r.schema("event_time").dataType == LongType)
    assert(r.schema("timestamp").dataType == TimestampType)
    assert(r.count() > 0)
  }
}
