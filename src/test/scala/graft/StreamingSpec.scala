package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.fixtures.RateFixtures
import graft.streaming.RateStream
import graft.streaming.RateStream.RateUpdate

class StreamingSpec extends SparkSuite {

  test("stateful latest-per-pair emits only when a pair's event time advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RateUpdate]
    val q = RateStream.latestPerPair(input.toDS())
      .writeStream.format("memory").queryName("latest_out")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(RateUpdate("EUR/USD", 100L, 1.10, 1L),
        RateUpdate("EUR/USD", 200L, 1.12, 2L), RateUpdate("USD/JPY", 50L, 147.0, 3L))
      q.processAllAvailable()
      val afterB1 = spark.table("latest_out").collect()
      assert(afterB1.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet ==
        Set(("EUR/USD", 200L, 1.12), ("USD/JPY", 50L, 147.0)))

      // late/stale update must NOT re-emit; a newer one must
      input.addData(RateUpdate("EUR/USD", 150L, 1.11, 4L),
        RateUpdate("USD/JPY", 60L, 147.5, 5L))
      q.processAllAvailable()
      val all = spark.table("latest_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(!all.contains(("EUR/USD", 150L, 1.11)))
      assert(all.contains(("USD/JPY", 60L, 147.5)))
    } finally q.stop()
  }

  test("watermarked dedup: duplicate natural keys collapse within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val parsed = input.toDS()
      .toDF("ccy_couple", "date", "rate")
      .withColumn("timestamp", col("date"))
    val q = RateStream.dedupWithinWatermark(parsed, "timestamp", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      val d = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
      input.addData(("EUR/USD", d, 1.15), ("EUR/USD", d, 1.16), ("AUD/CAD", d, 0.91))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("foreachBatch merge sink: parquet target converges to last-writer-wins") {
    val dir = Files.createTempDirectory("merge_sink").toFile
    val target = new java.io.File(dir, "rates").getAbsolutePath
    val writer = RateStream.mergeBatchWriter(target,
      Seq("ccy_couple", "date"), "event_id")
    val fx = RateFixtures.exchangeRates(spark)
    writer(fx.where(col("event_id") <= 4), 0L)   // includes (EUR/USD, Jan16)@1.15
    writer(fx.where(col("event_id") >= 5), 1L)   // supersedes with 1.16
    val result = spark.read.parquet(target)
    assert(result.count() == 10)
    val eur16 = result.where(col("ccy_couple") === "EUR/USD" &&
      col("date") === to_timestamp(lit("2024-01-16"))).collect().head
    assert(eur16.getAs[java.math.BigDecimal]("rate").doubleValue() == 1.16)
  }

  test("session windows close after the gap and carry the last rate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double, Long)]
    val parsed = input.toDS().toDF("ccy_couple", "timestamp", "rate", "event_id")
    val q = RateStream.sessionWindowStats(parsed, gap = "10 minutes",
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        ("EUR/USD", t("2024-01-16 00:00:00"), 1.10, 1L),
        ("EUR/USD", t("2024-01-16 00:05:00"), 1.11, 2L),   // same session
        ("EUR/USD", t("2024-01-16 00:30:00"), 1.13, 3L))   // new session (>10m gap)
      q.processAllAvailable()
      input.addData(("EUR/USD", t("2024-01-16 02:00:00"), 1.15, 4L)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sess_out").collect()
      assert(rows.length == 2)
      val bySize = rows.map(r => r.getLong(2) -> r.getDouble(3)).toMap
      assert(bySize(2L) == 1.11) // 2-event session ends on the 00:05 rate
      assert(bySize(1L) == 1.13)
    } finally q.stop()
  }

  test("tumbling-window aggregation emits closed windows with per-pair stats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double, Long)]
    val parsed = input.toDS().toDF("ccy_couple", "timestamp", "rate", "event_id")
    val q = RateStream.windowedRateStats(parsed)
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        ("EUR/USD", t("2024-01-16 00:00:05"), 1.10, 1L),
        // equal timestamps: the (ts, event_id) tiebreak must pick id 3
        ("EUR/USD", t("2024-01-16 00:00:20"), 1.12, 3L),
        ("EUR/USD", t("2024-01-16 00:00:20"), 1.11, 2L))
      q.processAllAvailable()
      // advance the watermark past the first window
      input.addData(("EUR/USD", t("2024-01-16 00:05:00"), 1.14, 4L))
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
      assert(rows.nonEmpty)
      val first = rows.minBy(_.getStruct(0).getTimestamp(0).getTime)
      assert(first.getLong(2) == 3)          // three quotes in [00:00:00,00:00:30)
      assert(first.getDouble(5) == 1.12)     // equal-ts tie resolved by event_id
    } finally q.stop()
  }

  test("file-drop payload stream: dropped FX_DAILY files flatten into rate events") {
    import graft.ingest.FxJson
    val dir = Files.createTempDirectory("paydrop").toFile
    val q = RateStream.payloadFileStream(spark, dir.getAbsolutePath)
      .writeStream.format("memory").queryName("pay_out")
      .outputMode(OutputMode.Append).start()
    try {
      Files.writeString(new java.io.File(dir, "EUR_USD.json").toPath,
        FxJson.fixturePayload(Seq("2024-01-15", "2024-01-16"),
          Seq(BigDecimal("1.0925"), BigDecimal("1.0942"))))
      q.processAllAvailable()
      Files.writeString(new java.io.File(dir, "USD_JPY.json").toPath,
        FxJson.fixturePayload(Seq("2024-01-16"), Seq(BigDecimal("147.35"))))
      q.processAllAvailable()
      val rows = spark.table("pay_out")
        .select("ccy_couple", "rate").collect()
      assert(rows.length == 3)
      assert(rows.map(_.getString(0)).toSet == Set("EUR/USD", "USD/JPY"))
    } finally q.stop()
  }

  test("composed ingest pipeline: file drop converges to an upserted table") {
    import graft.ingest.FxJson
    val work = Files.createTempDirectory("ingest_e2e").toFile
    val feed = new java.io.File(work, "feed"); feed.mkdirs()
    val table = new java.io.File(work, "rates").getAbsolutePath
    val q = RateStream.runIngestPipeline(spark, feed.getAbsolutePath, table)
    try {
      Files.writeString(new java.io.File(feed, "EUR_USD.json").toPath,
        FxJson.fixturePayload(Seq("2024-01-15", "2024-01-16"),
          Seq(BigDecimal("1.0925"), BigDecimal("1.0942"))))
      q.processAllAvailable()
      val t1 = spark.read.parquet(table)
      assert(t1.count() == 2)
      // second drop re-delivers Jan 16 with a correction → upsert, not dup
      Files.writeString(new java.io.File(feed, "EUR_USD.v2.json").toPath,
        FxJson.fixturePayload(Seq("2024-01-16"), Seq(BigDecimal("1.0950"))))
      q.processAllAvailable()
      val t2 = spark.read.parquet(table)
      assert(t2.count() == 2)
      val jan16 = t2.where(col("date") === to_timestamp(lit("2024-01-16")))
        .collect().head
      assert(jan16.getAs[java.math.BigDecimal]("rate").doubleValue() == 1.095)
    } finally q.stop()
  }

  test("same-batch version tie: conflicting versioned files in ONE micro-batch, higher version wins") {
    import graft.ingest.FxJson
    val work = Files.createTempDirectory("ingest_tie").toFile
    val feed = new java.io.File(work, "feed"); feed.mkdirs()
    val table = new java.io.File(work, "rates").getAbsolutePath
    // both files present BEFORE the stream starts and no maxFilesPerTrigger
    // cap → one micro-batch carries both deliveries; ingest_batch ties, so
    // only the explicit ingest_version can resolve the conflict
    Files.writeString(new java.io.File(feed, "EUR_USD.v1.json").toPath,
      FxJson.fixturePayload(Seq("2024-01-16"), Seq(BigDecimal("1.0900"))))
    Files.writeString(new java.io.File(feed, "EUR_USD.v2.json").toPath,
      FxJson.fixturePayload(Seq("2024-01-16"), Seq(BigDecimal("1.0950"))))
    val q = RateStream.runIngestPipeline(spark, feed.getAbsolutePath, table)
    try {
      q.processAllAvailable()
      val rows = spark.read.parquet(table).collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[java.math.BigDecimal]("rate").doubleValue() == 1.095)
      assert(rows.head.getAs[Long]("ingest_version") == 2L)
    } finally q.stop()
  }

  test("stateful latest-per-pair replay converges to the batch argmax") {
    import graft.model.Tables
    import graft.streaming.StreamReplay
    val streamed = StreamReplay.replayLatestPerPair(spark, sf("sf0.001"), nBatches = 3)
      .collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ccy_couple")
      .orderBy(col("event_time").desc, col("event_id").desc)
    val batch = Tables.rates(spark, sf("sf0.001"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("ccy_couple"), col("event_time"), col("rate"), col("event_id"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("windowed replay equals the batch time-bucket set under the final watermark") {
    import graft.model.Tables
    import graft.streaming.StreamReplay
    val dir = sf("sf0.001")
    val streamed = StreamReplay.replayWindowedStats(spark, dir)
      .collect().map(_.toSeq).toSet
    val rates = Tables.rates(spark, dir)
    val wmk = rates.agg((unix_micros(max(col("timestamp"))) - 60000000L).as("w"))
      .collect().head.getLong(0)
    val batch = rates
      .groupBy(window(col("timestamp"), "6 hours"), col("ccy_couple"))
      .agg(count(lit(1)).as("n_quotes"), max(col("rate")).as("max_rate"),
        min(col("rate")).as("min_rate"),
        max_by(col("rate"), struct(col("timestamp"), col("event_id"))).as("last_rate"))
      .select(unix_micros(col("window.start")).as("window_start"),
        unix_micros(col("window.end")).as("window_end"),
        col("ccy_couple"), col("n_quotes"), col("max_rate"), col("min_rate"),
        col("last_rate"))
      .where(col("window_end") <= wmk)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("session replay equals batch gap-sessionization under the final watermark") {
    import graft.model.Tables
    import graft.streaming.StreamReplay
    val dir = sf("sf0.001")
    val streamed = StreamReplay.replaySessionStats(spark, dir)
      .collect().map(_.toSeq).toSet
    val rates = Tables.rates(spark, dir)
    val wmk = rates.agg((unix_micros(max(col("timestamp"))) - 60000000L).as("w"))
      .collect().head.getLong(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ccy_couple").orderBy(col("timestamp"), col("event_id"))
    val batch = rates
      .withColumn("prev", lag(col("timestamp"), 1).over(w))
      .withColumn("news", when(col("prev").isNull ||
        unix_micros(col("timestamp")) - unix_micros(col("prev")) >= 1800000000L, 1)
        .otherwise(0))
      .withColumn("sid", sum(col("news")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("ccy_couple"), col("sid"))
      .agg(unix_micros(min(col("timestamp"))).as("session_start"),
        (unix_micros(max(col("timestamp"))) + 1800000000L).as("session_end"),
        count(lit(1)).as("n_events"),
        max_by(col("rate"), struct(col("timestamp"), col("event_id"))).as("last_rate"))
      .where(col("session_end") <= wmk)
      .select(col("session_start"), col("session_end"), col("ccy_couple"),
        col("n_events"), col("last_rate"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("stream-stream interval join matches across micro-batches, honors the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = RateStream.clickPurchaseIntervalJoin(
        clicks.toDS().toDF("user_id", "click_ts", "click_id", "click_value"),
        purchases.toDS().toDF("p_user_id", "p_ts", "p_id"))
      .select(col("user_id"), col("click_id"), col("p_id"))
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode(OutputMode.Append).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // batch 1: click only — goes into join state, nothing emits
      clicks.addData((1L, t("2024-01-16 00:00:00"), 10L, 5.0))
      q.processAllAvailable()
      assert(spark.table("ssjoin_out").isEmpty)
      // batch 2: matching purchase arrives LATER — state must still hold
      // the click; and a purchase outside the 30-minute window must not
      // match
      purchases.addData(
        (1L, t("2024-01-16 00:10:00"), 20L),   // in window → match
        (1L, t("2024-01-16 01:00:00"), 21L),   // past the window → no match
        (2L, t("2024-01-16 00:10:00"), 22L))   // other user → no match
      q.processAllAvailable()
      val rows = spark.table("ssjoin_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((1L, 10L, 20L)))
    } finally q.stop()
  }

  test("bounded dedup: expiry is non-strict at first-ts + delay, dups don't extend") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val q = in.toDS().toDF("doc_id", "timestamp")
      .withWatermark("timestamp", "1 minute")
      .dropDuplicatesWithinWatermark("doc_id")
      .writeStream.format("memory").queryName("ddw_spec")
      .outputMode(OutputMode.Append).start()
    try {
      def t(sec: Double) = new java.sql.Timestamp(1700000000000L + (sec * 1000).toLong)
      // key 1 first at 0s (expiry 60s), with an in-batch duplicate at 30s
      // that must NOT extend the expiry to 90s
      in.addData((1L, t(0)), (1L, t(30)), (2L, t(1)))
      q.processAllAvailable()
      // watermark lands EXACTLY at key 1's expiry (max 130s − 60s = 70s
      // ≥ 60s, non-strict) but before the would-be extended 90s
      in.addData((8L, t(130)))
      q.processAllAvailable()
      // re-delivery: emits because state expired at exactly-70 ≥ 60;
      // with strict eviction or dup-extension it would be suppressed
      in.addData((1L, t(80)))
      q.processAllAvailable()
      // key 2's state (expiry 61s) also expired; key 9 is brand new
      in.addData((2L, t(140)), (9L, t(141)))
      q.processAllAvailable()
      val rows = spark.table("ddw_spec").collect()
        .map(r => (r.getLong(0), (r.getTimestamp(1).getTime - 1700000000000L) / 1000))
        .toSet
      assert(rows == Set((1L, 0L), (2L, 1L), (8L, 130L), (1L, 80L),
        (2L, 140L), (9L, 141L)))
    } finally q.stop()
  }

  test("timer sessions: inline gap close, timer close boundary pinned") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(String, java.sql.Timestamp, Long)]
    val parsed = input.toDS().toDF("ccy_couple", "timestamp", "event_id")
    // gap 10 min (600 s), watermark delay 60 s
    val q = RateStream.sessionTimers(parsed, gapUs = 600000000L,
        watermark = "1 minute")
      .writeStream.format("memory").queryName("sesstimer_spec")
      .outputMode(OutputMode.Append).start()
    try {
      def t(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
      def emitted() = spark.table("sesstimer_spec").collect()
        .map(r => (r.getString(0),
          (r.getLong(1) - 1700000000000000L) / 1000000,
          (r.getLong(2) - 1700000000000000L) / 1000000,
          r.getLong(3))).toSet

      // A: two events 0s/30s (one session, timer at 630s), then a
      // same-batch gap event at 700s — the first session must close
      // INLINE in this batch, before any watermark movement
      input.addData(("A", t(0), 1L), ("A", t(30), 2L), ("A", t(700), 3L))
      q.processAllAvailable()
      assert(emitted() == Set(("A", 0L, 630L, 2L)))

      // B advances the watermark to 1 s BEFORE A's open-session expiry
      // (1359 − 60 = 1299 < 700 + 600): the timer must NOT fire yet
      input.addData(("B", t(1359), 4L))
      q.processAllAvailable()
      assert(emitted() == Set(("A", 0L, 630L, 2L)))

      // watermark EXACTLY at the expiry (1360 − 60 = 1300 = 700 + 600):
      // the timer fires at equality — expiry ≤ watermark, NON-STRICT
      // (the boundary this spec exists to pin)
      input.addData(("B", t(1360), 5L))
      q.processAllAvailable()
      assert(emitted().contains(("A", 700L, 1300L, 1L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("trailing-K list state: keep-K-largest merge survives out-of-order batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[RateUpdate]
    val q = RateStream.trailingKDigest(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("trailk_spec")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        RateUpdate("A", 100L, 1.0, 1L),
        RateUpdate("A", 300L, 3.0, 3L))
      q.processAllAvailable()
      // an out-of-order batch: 200 enters the buffer, 50 is too old to
      // matter once full — and 400 displaces 100
      input.addData(
        RateUpdate("A", 200L, 2.0, 2L),
        RateUpdate("A", 50L, 9.0, 0L),
        RateUpdate("A", 400L, 4.0, 4L))
      q.processAllAvailable()
      val last = spark.table("trailk_spec").orderBy(col("last_event_time"))
        .collect().last
      // final buffer = {400, 300, 200}: head 400/id 4, sum 9.0 × 10⁶
      assert(last.getLong(1) == 400L && last.getLong(2) == 4L)
      assert(last.getLong(3) == 3L)
      assert(last.getLong(4) == 9000000L)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("map-state day counts: entries accumulate across batches, argmax tiebreaks early") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[RateStream.DayTick]
    val q = RateStream.dayCountsTws(input.toDS())
      .writeStream.format("memory").queryName("daycnt_spec")
      .outputMode(OutputMode.Update).start()
    try {
      import RateStream.DayTick
      input.addData(DayTick("A", 10L, 1L), DayTick("A", 10L, 2L),
        DayTick("A", 11L, 3L))
      q.processAllAvailable()
      // second batch: day 11 catches up to day 10's count — the busiest
      // argmax must tiebreak to the EARLIER day (10)
      input.addData(DayTick("A", 11L, 4L), DayTick("A", 12L, 5L))
      q.processAllAvailable()
      val last = spark.table("daycnt_spec")
        .orderBy(col("total_ticks")).collect().last
      assert(last.getLong(1) == 3L) // days {10, 11, 12}
      assert(last.getLong(2) == 5L) // total ticks
      assert(last.getLong(3) == 10L && last.getLong(4) == 2L)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("left-outer join: null emission sits exactly at wm − window − 1µs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = RateStream.clickPurchaseIntervalJoin(
        clicks.toDS().toDF("user_id", "click_ts", "click_id", "click_value"),
        purchases.toDS().toDF("p_user_id", "p_ts", "p_id"),
        joinType = "left_outer")
      .select(col("click_id"), col("p_id"))
      .writeStream.format("memory").queryName("ssjoin_outer_out")
      .outputMode(OutputMode.Append).start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      // batch 1: a matched click, and unmatched clicks straddling the
      // eviction boundary the batch-2 watermark will set (wm = 01:59:00,
      // so state expires strictly below 01:29:00.000000 − 1µs)
      clicks.addData(
        (1L, t("2024-01-16 00:00:00"),        10L, 1.0),  // will match
        (1L, t("2024-01-16 01:28:59.999"),    11L, 1.0),  // below → null row
        (1L, t("2024-01-16 01:28:59.999999"), 12L, 1.0),  // AT wm−30min−1µs → held
        (1L, t("2024-01-16 01:29:00"),        13L, 1.0),  // above → held
        (1L, t("2024-01-16 01:58:00"),        14L, 1.0))  // tail → held
      purchases.addData((1L, t("2024-01-16 00:10:00"), 20L))
      q.processAllAvailable()
      // batch 2: advance BOTH side watermarks to 01:59:00 (policy = min)
      clicks.addData((2L, t("2024-01-16 02:00:00"), 15L, 1.0))
      purchases.addData((3L, t("2024-01-16 02:00:00"), 21L))
      q.processAllAvailable()
      val rows = spark.table("ssjoin_outer_out").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
      // the match emits with its purchase, never ALSO as a null row;
      // only the expired unmatched click gains a null row
      assert(rows == Set((10L, Some(20L)), (11L, None)))
    } finally q.stop()
  }

  test("composed-ingest replay: corrections win LWW, re-deliveries are inert") {
    import graft.streaming.StreamReplay
    val table = StreamReplay.replayIngestPipeline(spark).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        r.getDouble(2)).toMap
    // 4 pairs × their distinct quote dates
    assert(table.size == 13)
    // corrections from later deliveries overwrite (LWW through the merge)
    assert(table(("EUR/USD", "2024-01-11")) == 1.115)
    assert(table(("GBP/JPY", "2024-01-11")) == 185.75)
    // exact re-deliveries leave the original value
    assert(table(("EUR/USD", "2024-01-12")) == 1.12)
    assert(table(("AUD/CAD", "2024-01-11")) == 0.915)
    // the same-batch v5/v6 conflict resolves to the higher version
    assert(table(("AUD/CAD", "2024-01-16")) == 0.93)
  }

  test("checkpoint restart: resumed stream reads only new files, exactly-once overall") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val work = Files.createTempDirectory("chk_restart")
    val feed = work.resolve("feed"); Files.createDirectories(feed)
    val chk = work.resolve("chk").toString
    val log = work.resolve("seen").toString
    var n = 0
    def addFile(ids: Seq[Long]): Unit = {
      n += 1
      val tmp = work.resolve(s"stage$n")
      ids.map(i => (i, s"doc-$i")).toDF("doc_id", "text")
        .coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, feed.resolve(s"batch-$n.parquet"))
    }
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
        .option("maxFilesPerTrigger", "1")
        .parquet(feed.toString)
        .writeStream
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("doc_id").write.mode("append").parquet(log); ()
        }
        .start()
      q.awaitTermination()
    }
    addFile(Seq(1L, 2L, 3L)); addFile(Seq(4L, 5L))
    runOnce()
    // stream stopped; new data lands; a NEW query resumes the checkpoint
    addFile(Seq(6L, 7L, 8L))
    runOnce()
    val seen = spark.read.parquet(log).collect().map(_.getLong(0)).toSeq
    // exactly-once overall: the restart must not re-read batches 1-2
    assert(seen.sorted == (1L to 8L).toSeq, s"got ${seen.sorted.toList}")
  }

  test("entry contract: flagship query returns rows; every oracle key is a query") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("transformWithState latest-per-pair converges to the V1 state") {
    val dir = sf("sf0.001")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    val v1 = asSet(graft.streaming.StreamReplay.replayLatestPerPair(spark, dir))
    val v2 = asSet(graft.streaming.StreamReplay.replayLatestPerPairTws(spark, dir))
    assert(v1 == v2 && v1.nonEmpty)
    // the RocksDB override must not leak into the session
    assert(spark.conf.getOption(providerKey) == before)
  }
}
