package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

import graft.ingest.MergeOps

/** The reference's polling loop, made native (SURVEY §2.10): Task Scheduler
  * re-running a script each minute becomes a Structured Streaming
  * micro-batch pipeline; MySQL's `ON DUPLICATE KEY UPDATE` becomes
  * watermarked dedup + a foreachBatch merge; "latest rate per pair" becomes
  * explicit keyed state.
  *
  * Late-data note (SURVEY §7.4): the reference upserts late rows whenever
  * they arrive (last-write-wins, no ordering guarantee); the streaming path
  * drops rows later than the watermark. That divergence is inherent to
  * bounded state and is documented rather than papered over.
  */
object RateStream {

  case class RateUpdate(ccy_couple: String, event_time: Long, rate: Double,
      event_id: Long)
  case class LatestRate(ccy_couple: String, event_time: Long, rate: Double,
      event_id: Long)

  /** K1 streaming form: exactly-once-per-key within the watermark via
    * dropDuplicates on the natural key (Fx_1min.py:103-110's unique key).
    */
  def dedupWithinWatermark(parsed: DataFrame, tsCol: String = "timestamp",
      watermark: String = "10 minutes"): DataFrame =
    parsed.withWatermark(tsCol, watermark)
      .dropDuplicates("ccy_couple", "date")

  /** foreachBatch merge sink: each micro-batch upserts into a
    * date-partitioned parquet target with last-writer-wins on `keys`.
    * The merge is PARTITION-SCOPED (MergeOps.mergeIntoDatePartitioned):
    * only the date partitions the batch touches are read, merged, and
    * dynamically overwritten — per-batch cost is O(touched days), never
    * O(table). That matches the reference's minutely upsert, which only
    * ever touches ~one day's keys per run (Fx_1min.py:93-125); the
    * previous full-table-rewrite design was the one remaining O(table)
    * cost on the ingest hot path at warehouse scale.
    *
    * LWW ORDERING IS DETERMINISTIC, never wall-clock: the merge orders by
    * (`ingest_version` if the batch carries one, then the micro-batch id
    * as `ingest_batch`, then `orderCol`). The reference gets away with
    * `timestamp=CURRENT_TIMESTAMP` ordering (Fx_1min.py:103-110) because
    * MySQL serializes upserts; on a micro-batch engine a processing-time
    * version has millisecond granularity shared by a whole batch, so a
    * correction can TIE its original and lose the row_number coin flip
    * (the round-7 gate caught exactly that). The delivery version comes
    * from the payload file name (payloadFileStream); `ingest_batch` is
    * Spark's replayable monotone batch id — both are stable under
    * re-execution, so the merged table is a pure function of the feed.
    * An unversioned feed that delivers two CONFLICTING values for one
    * key inside one micro-batch remains inherently ambiguous (no
    * delivery order exists) — version your files to resolve it.
    *
    * CHECKPOINT-LINEAGE CAVEAT: `ingest_batch` is monotone only within
    * one checkpoint lineage. If the checkpoint is lost and batchId
    * restarts at 0, new UNVERSIONED deliveries (version 0) lose LWW to
    * rows already in the table carrying a higher ingest_batch. Versioned
    * feeds are immune (ingest_version dominates the ordering); for
    * unversioned feeds, keep the checkpoint as durable as the table.
    */
  def mergeBatchWriter(target: String, keys: Seq[String],
      orderCol: String,
      changelog: Option[String] = None): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val versioned = batch.withColumn("ingest_batch", lit(batchId))
      val ordering =
        (if (batch.columns.contains("ingest_version")) Seq(col("ingest_version"))
         else Seq.empty) ++ Seq(col("ingest_batch"), col(orderCol))
      MergeOps.mergeIntoDatePartitioned(target, versioned, keys,
        ordering, dateCol = "date",
        changelog = changelog, changelogBatchId = batchId)
  }

  /** S1 streaming stand-in: a file-drop directory of `<BASE>_<TARGET>.json`
    * FX_DAILY payloads consumed as a stream — the reference's polled REST
    * fetch becomes "payloads arrive, micro-batches flatten them". Pair
    * identity comes from the file name; the flatten is FxJson's.
    *
    * `ingest_version` is the delivery version parsed from the
    * `<PAIR>.v<n>.json` file name (0 when the name is unversioned) — the
    * durable record of delivery order the LWW merge needs. File mtimes
    * and processing timestamps both fail as versions (mtime granularity,
    * clock ties under load); the name survives re-execution byte-for-byte.
    */
  def payloadFileStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.types._
    val reader = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    val raw = reader.text(dir)
    // file names: <BASE>_<TARGET>[.v<n>].json — re-deliveries arrive as
    // new versioned files (a file stream processes each name once)
    val f = input_file_name()
    val pat = "([A-Z]{3})_([A-Z]{3})[^/]*\\.json"
    // regexp_extract yields '' (not null) on a non-match, and ANSI mode
    // makes cast('' as long) THROW — guard before casting so an
    // unversioned <PAIR>.json really does parse as version 0
    val ver = regexp_extract(f, "\\.v(\\d+)\\.json$", 1)
    graft.ingest.FxJson.parsePayloads(
      raw.select(col("value").as("payload"),
        regexp_extract(f, pat, 1).as("base_currency"),
        regexp_extract(f, pat, 2).as("target_currency"),
        when(ver =!= "", ver.cast("long")).otherwise(lit(0L))
          .as("ingest_version")),
      carryCols = Seq("ingest_version"))
  }

  /** The composed ingest pipeline, one call: payload file-drop source →
    * normalize → watermarked key dedup → foreachBatch merge into the
    * rates table. Returns the running query; the caller owns its
    * lifecycle. This is the reference's Task-Scheduler loop as a single
    * always-on streaming job. The replay knobs (`maxFilesPerTrigger`,
    * `trigger`, `checkpointDir`) default to the always-on production
    * shape; StreamReplay.replayIngestPipeline sets them to drive the SAME
    * composed pipeline one file per micro-batch to completion, which is
    * what lets the gate oracle-check the composition end to end.
    */
  def runIngestPipeline(spark: SparkSession, feedDir: String,
      tableDir: String, watermark: String = "10 minutes",
      maxFilesPerTrigger: Option[Int] = None,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      checkpointDir: Option[String] = None,
      changelogDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = payloadFileStream(spark, feedDir, maxFilesPerTrigger)
      .withWatermark("timestamp", watermark)
      // suppress EXACT re-deliveries (key + value) only: a corrected quote
      // for an existing key must reach the merge, where last-writer-wins
      // resolves it — deduplicating on the bare natural key here would
      // silently swallow corrections (the reference's upsert applies them)
      .dropDuplicates("ccy_couple", "date", "rate")
      .writeStream
      .outputMode("append")
      .foreachBatch(mergeBatchWriter(tableDir,
        Seq("ccy_couple", "date"), "timestamp", changelog = changelogDir))
    trigger.foreach(writer.trigger)
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Native session windows over the stream (the streaming form of
    * operators.Sessionize): a session closes `gap` after its last event,
    * then emits once the watermark passes — state per OPEN session only.
    * `last_rate` argmaxes under the TOTAL (ts, event_id) order (the input
    * must carry `event_id`), so equal-timestamp ties cannot make the
    * emitted value batching- or partitioning-dependent — which is what
    * lets the replay gate hash-check it against batch SQL.
    */
  def sessionWindowStats(parsed: DataFrame, tsCol: String = "timestamp",
      gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    parsed.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("ccy_couple"))
      .agg(count(lit(1)).as("n_events"),
        max_by(col("rate"), struct(col(tsCol), col("event_id"))).as("last_rate"))

  case class SessionEvent(ccy_couple: String,
      timestamp: java.sql.Timestamp, event_id: Long)
  case class SessionAgg(start: Long, last: Long, n: Long) // epoch micros
  case class SessionOut(ccy_couple: String, session_start: Long,
      session_end: Long, n_events: Long)

  /** Gap sessionization on the transformWithState TIMER surface — the
    * V2 API feature [[sessionWindowStats]]'s built-in operator hides:
    * explicit per-key EVENT-TIME timers. Within a batch a gap ≥ `gapUs`
    * closes the running session INLINE (emission is data-driven, no
    * watermark involved); the key's final open session is closed by its
    * registered timer at `last + gap` once the watermark passes it
    * (handleExpiredTimer). Every batch re-arms the single timer —
    * delete-then-register, so at most one per key lives in the store.
    *
    * Semantics are closed-form and deterministic under the ordered
    * replay: inline closes reproduce the batch lag/cumsum sessionize
    * exactly; timer closes add each key's LAST session iff its
    * millisecond-floored end is ≤ the watermark available to the final
    * batch (pinned empirically by the replay gate, like every other
    * watermark rule in this repo).
    */
  private class SessionTimerProcessor(gapUs: Long)
      extends StatefulProcessor[String, SessionEvent, SessionOut] {
    @transient private var st: ValueState[SessionAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionAgg]("session",
        Encoders.product[SessionAgg], TTLConfig.NONE)

    private def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

    override def handleInputRows(key: String, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      // per-key per-batch sort: bounded by the batch's rows for this key
      val sorted = rows.toSeq.sortBy(r => (micros(r.timestamp), r.event_id))
      val out = Seq.newBuilder[SessionOut]
      var cur = if (st.exists()) Some(st.get()) else None
      sorted.foreach { r =>
        val ts = micros(r.timestamp)
        cur match {
          case Some(c) if ts - c.last >= gapUs =>
            out += SessionOut(key, c.start, c.last + gapUs, c.n)
            cur = Some(SessionAgg(ts, ts, 1L))
          case Some(c) =>
            cur = Some(SessionAgg(c.start, math.max(c.last, ts), c.n + 1L))
          case None =>
            cur = Some(SessionAgg(ts, ts, 1L))
        }
      }
      cur.foreach { c =>
        st.update(c)
        getHandle.listTimers().foreach(t =>
          getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer((c.last + gapUs) / 1000L)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      // a stale timer (state since extended) must neither emit nor clear
      if (st.exists() &&
          (st.get().last + gapUs) / 1000L <= expiredTimerInfo.getExpiryTimeInMs()) {
        val c = st.get()
        st.clear()
        Iterator.single(SessionOut(key, c.start, c.last + gapUs, c.n))
      } else Iterator.empty
    }
  }

  case class TrailingDigest(ccy_couple: String, last_event_time: Long,
      last_event_id: Long, n_window: Long, sum_micro: Long)

  /** Trailing-K per-key digest on the V2 LIST-STATE surface: the state
    * is the key's K most recent events under the (event_time, event_id)
    * total order — a bounded buffer `ValueState` can't express and the
    * V1 API could only fake with one opaque blob. Each batch merges its
    * rows into the buffer (keep-K-largest — deterministic under ANY
    * batching, the top-k-merge argument) and emits the refreshed digest:
    * window size, exact half-up ×10⁶ rate sum, and the anchor event.
    * The per-key digest at the LAST emission equals the batch top-K
    * aggregate — the gate's argmax fold, same shape as the
    * latest-per-pair replay.
    */
  private class TrailingKProcessor(k: Int)
      extends StatefulProcessor[String, RateUpdate, TrailingDigest] {
    @transient private var buf: ListState[RateUpdate] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[RateUpdate]("trailing",
        Encoders.product[RateUpdate], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[RateUpdate],
        timerValues: TimerValues): Iterator[TrailingDigest] = {
      val existing = if (buf.exists()) buf.get().toSeq else Seq.empty
      val merged = (existing ++ rows)
        .sortBy(r => (-r.event_time, -r.event_id)).take(k)
      buf.put(merged.toArray)
      val head = merged.head
      // exact half-up micro-units: floor(rate·10⁶ + 0.5), summed as longs
      val sum = merged.map(r => math.floor(r.rate * 1e6 + 0.5).toLong).sum
      Iterator.single(TrailingDigest(key, head.event_time, head.event_id,
        merged.size.toLong, sum))
    }
  }

  /** Trailing-5 digest stream; RocksDB provider required (V2). */
  def trailingKDigest(updates: Dataset[RateUpdate],
      k: Int = 5): Dataset[TrailingDigest] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.ccy_couple)
      .transformWithState(new TrailingKProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  case class DayTick(ccy_couple: String, day: Long, event_id: Long)
  case class DayCountDigest(ccy_couple: String, n_days: Long,
      total_ticks: Long, busiest_day: Long, busiest_count: Long)

  private case class DaySummary(n_days: Long, total_ticks: Long,
      busiest_day: Long, busiest_count: Long)

  /** Per-key daily tick counts on the V2 MAP-STATE surface (completing
    * the state-type triad next to the ValueState latest and ListState
    * trailing-K): the state is a per-pair map day → count, incremented
    * per row — additive, so the final map is batching-invariant — plus
    * a small summary ValueState (distinct days, total ticks, busiest
    * day) maintained incrementally from the TOUCHED days only. Counts
    * never decrease, so an untouched day can never overtake the
    * incumbent busiest — comparing each touched day's refreshed count
    * against the incumbent under (count desc, day asc) keeps the argmax
    * exact. Per-batch work is therefore O(batch-touched days), not
    * O(state) — the point of MapState over one monolithic value.
    */
  private class DayCountProcessor
      extends StatefulProcessor[String, DayTick, DayCountDigest] {
    @transient private var counts: MapState[Long, Long] = _
    @transient private var summary: ValueState[DaySummary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[Long, Long]("daycounts",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      summary = getHandle.getValueState[DaySummary]("daysummary",
        Encoders.product[DaySummary], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[DayTick],
        timerValues: TimerValues): Iterator[DayCountDigest] = {
      var s = if (summary.exists()) summary.get()
        else DaySummary(0L, 0L, Long.MaxValue, 0L)
      rows.toSeq.groupBy(_.day).foreach { case (day, ts) =>
        val had = counts.containsKey(day)
        val next = (if (had) counts.getValue(day) else 0L) + ts.size
        counts.updateValue(day, next)
        val beats = next > s.busiest_count ||
          (next == s.busiest_count && day < s.busiest_day)
        s = DaySummary(s.n_days + (if (had) 0L else 1L),
          s.total_ticks + ts.size,
          if (beats) day else s.busiest_day,
          if (beats) next else s.busiest_count)
      }
      summary.update(s)
      Iterator.single(DayCountDigest(key, s.n_days, s.total_ticks,
        s.busiest_day, s.busiest_count))
    }
  }

  /** Daily-count digest stream; RocksDB provider required (V2). */
  def dayCountsTws(ticks: Dataset[DayTick]): Dataset[DayCountDigest] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.ccy_couple)
      .transformWithState(new DayCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** [[sessionWindowStats]]'s session set on the timer API. Requires the
    * RocksDB state store provider (see StreamReplay's scoped swap).
    */
  def sessionTimers(parsed: DataFrame, tsCol: String = "timestamp",
      gapUs: Long = 1800000000L,
      watermark: String = "1 minute"): Dataset[SessionOut] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.select(col("ccy_couple"), col(tsCol).as("timestamp"),
        col("event_id"))
      .withWatermark("timestamp", watermark)
      .as[SessionEvent]
      .groupByKey(_.ccy_couple)
      .transformWithState(new SessionTimerProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Tumbling-window per-pair aggregation with a watermark (the §2.10
    * extension): e.g. 30-second windows of rate activity. Append mode
    * emits a window only once its watermark passes — bounded state.
    * `last_rate` is a total argmax under (ts, event_id), as in
    * sessionWindowStats — deterministic under any batching.
    */
  def windowedRateStats(parsed: DataFrame, tsCol: String = "timestamp",
      windowLen: String = "30 seconds",
      watermark: String = "1 minute"): DataFrame =
    parsed.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("ccy_couple"))
      .agg(count(lit(1)).as("n_quotes"),
        max(col("rate")).as("max_rate"),
        min(col("rate")).as("min_rate"),
        max_by(col("rate"), struct(col(tsCol), col("event_id"))).as("last_rate"))

  /** STREAM-STREAM interval join (the §2.10 mechanism batch joins can't
    * replace): each purchase matched to the same user's clicks in the
    * preceding `window`. Both sides carry watermarks, so click state is
    * evicted once the watermark passes `click_ts + window` — state is
    * bounded by (users active inside one window), never by stream
    * length. Inner-join emission is match-driven (the watermark gates
    * eviction, not emission), so under chronological arrival every
    * qualifying pair is emitted exactly once — which is what makes the
    * replay oracle-checkable against the batch interval join.
    *
    * Inputs must carry distinct column names: clicks(user_id, click_ts,
    * click_id, click_value), purchases(p_user_id, p_ts, p_id).
    */
  def clickPurchaseIntervalJoin(clicks: DataFrame, purchases: DataFrame,
      window: String = "30 minutes",
      watermark: String = "1 minute",
      joinType: String = "inner"): DataFrame =
    clicks.withWatermark("click_ts", watermark)
      .join(purchases.withWatermark("p_ts", watermark),
        expr(s"""user_id = p_user_id
                 AND p_ts >= click_ts
                 AND p_ts <= click_ts + interval $window"""),
        joinType)

  /** Stateful latest-rate-per-pair (the ActiveRates/LatestRates semantics
    * as explicit keyed state): emits an update whenever a pair's newest
    * (event_time, event_id) advances. flatMapGroupsWithState keeps one
    * (event_time, rate, event_id) per key — constant state per pair, any
    * number of pairs. The event_id tiebreak makes the final state the
    * same total-order argmax the batch window (ORDER BY event_time DESC,
    * event_id DESC) computes, REGARDLESS of how rows are batched — which
    * is what lets StreamReplay oracle-check this operator against the
    * batch SQL instead of leaving it spec-only.
    */
  def latestPerPair(updates: Dataset[RateUpdate]): Dataset[LatestRate] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.ccy_couple)
      .flatMapGroupsWithState[LatestRate, LatestRate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[RateUpdate], state: GroupState[LatestRate]) =>
          val incoming = rows.maxByOption(r => (r.event_time, r.event_id))
          val current = state.getOption
          incoming match {
            case Some(r) if current.forall(c => c.event_time < r.event_time ||
                (c.event_time == r.event_time && c.event_id < r.event_id)) =>
              val next = LatestRate(key, r.event_time, r.rate, r.event_id)
              state.update(next)
              Iterator.single(next)
            case _ => Iterator.empty
          }
      }
  }

  /** The same latest-per-pair semantics on the arbitrary-stateful V2 API
    * (`transformWithState`, Spark 4): composable named state instead of
    * one opaque state value, timers available, RocksDB-backed. Semantics
    * are IDENTICAL to [[latestPerPair]] by construction (same advance
    * predicate, same emissions), so the replay gate can check the new
    * API against the same batch-argmax oracle.
    */
  private class LatestPerPairProcessor
      extends StatefulProcessor[String, RateUpdate, LatestRate] {
    @transient private var latest: ValueState[LatestRate] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[LatestRate]("latest",
        Encoders.product[LatestRate], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[RateUpdate],
        timerValues: TimerValues): Iterator[LatestRate] = {
      val incoming = rows.maxByOption(r => (r.event_time, r.event_id))
      val current = if (latest.exists()) Some(latest.get()) else None
      incoming match {
        case Some(r) if current.forall(c => c.event_time < r.event_time ||
            (c.event_time == r.event_time && c.event_id < r.event_id)) =>
          val next = LatestRate(key, r.event_time, r.rate, r.event_id)
          latest.update(next)
          Iterator.single(next)
        case _ => Iterator.empty
      }
    }
  }

  /** [[latestPerPair]] on the transformWithState API. Requires the
    * RocksDB state store provider (the V2 operator rejects the default
    * HDFS-backed provider) — see StreamReplay.withRocksDbStateStore.
    */
  def latestPerPairTws(updates: Dataset[RateUpdate]): Dataset[LatestRate] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.ccy_couple)
      .transformWithState(new LatestPerPairProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
