package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  case class RateUpdate(ccy_couple: String, event_time: Long, rate: Double)
  case class LatestRate(ccy_couple: String, event_time: Long, rate: Double)

  /** K1 streaming form: exactly-once-per-key within the watermark via
    * dropDuplicates on the natural key (Fx_1min.py:103-110's unique key).
    */
  def dedupWithinWatermark(parsed: DataFrame, tsCol: String = "timestamp",
      watermark: String = "10 minutes"): DataFrame =
    parsed.withWatermark(tsCol, watermark)
      .dropDuplicates("ccy_couple", "date")

  /** foreachBatch merge sink: each micro-batch upserts into a parquet
    * target with last-writer-wins on `keys`. The existing table is
    * materialized before overwrite (cache + count) so the read and the
    * rewrite never race; at warehouse scale this step is a transactional
    * table-format commit instead, but the merge RELATION is the same
    * MergeOps.merge plan.
    */
  def mergeBatchWriter(target: String, keys: Seq[String],
      orderCol: String): (DataFrame, Long) => Unit = { (batch, _) =>
    val spark = batch.sparkSession
    val merged =
      if (new java.io.File(target).exists()) {
        val existing = spark.read.parquet(target)
        MergeOps.merge(existing, batch.select(existing.columns.map(col): _*),
          keys, Seq(col(orderCol)))
      } else batch
    val materialized = merged.cache()
    materialized.count()
    materialized.write.mode("overwrite").parquet(target)
    materialized.unpersist()
  }

  /** S1 streaming stand-in: a file-drop directory of `<BASE>_<TARGET>.json`
    * FX_DAILY payloads consumed as a stream — the reference's polled REST
    * fetch becomes "payloads arrive, micro-batches flatten them". Pair
    * identity comes from the file name; the flatten is FxJson's.
    */
  def payloadFileStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(dir)
    // file names: <BASE>_<TARGET>[.version].json — re-deliveries arrive as
    // new versioned files (a file stream processes each name once)
    val f = input_file_name()
    val pat = "([A-Z]{3})_([A-Z]{3})[^/]*\\.json"
    graft.ingest.FxJson.parsePayloads(
      raw.select(col("value").as("payload"),
        regexp_extract(f, pat, 1).as("base_currency"),
        regexp_extract(f, pat, 2).as("target_currency")))
  }

  /** The composed ingest pipeline, one call: payload file-drop source →
    * normalize → watermarked key dedup → foreachBatch merge into the
    * rates table. Returns the running query; the caller owns its
    * lifecycle. This is the reference's Task-Scheduler loop as a single
    * always-on streaming job.
    */
  def runIngestPipeline(spark: SparkSession, feedDir: String,
      tableDir: String, watermark: String = "10 minutes")
      : org.apache.spark.sql.streaming.StreamingQuery =
    payloadFileStream(spark, feedDir)
      .withWatermark("timestamp", watermark)
      // suppress EXACT re-deliveries (key + value) only: a corrected quote
      // for an existing key must reach the merge, where last-writer-wins
      // resolves it — deduplicating on the bare natural key here would
      // silently swallow corrections (the reference's upsert applies them)
      .dropDuplicates("ccy_couple", "date", "rate")
      .writeStream
      .outputMode("append")
      .foreachBatch(mergeBatchWriter(tableDir,
        Seq("ccy_couple", "date"), "timestamp"))
      .start()

  /** Native session windows over the stream (the streaming form of
    * operators.Sessionize): a session closes `gap` after its last event,
    * then emits once the watermark passes — state per OPEN session only.
    */
  def sessionWindowStats(parsed: DataFrame, tsCol: String = "timestamp",
      gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    parsed.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("ccy_couple"))
      .agg(count(lit(1)).as("n_events"),
        max_by(col("rate"), col(tsCol)).as("last_rate"))

  /** Tumbling-window per-pair aggregation with a watermark (the §2.10
    * extension): e.g. 30-second windows of rate activity. Append mode
    * emits a window only once its watermark passes — bounded state.
    */
  def windowedRateStats(parsed: DataFrame, tsCol: String = "timestamp",
      windowLen: String = "30 seconds",
      watermark: String = "1 minute"): DataFrame =
    parsed.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("ccy_couple"))
      .agg(count(lit(1)).as("n_quotes"),
        max(col("rate")).as("max_rate"),
        min(col("rate")).as("min_rate"),
        max_by(col("rate"), col(tsCol)).as("last_rate"))

  /** Stateful latest-rate-per-pair (the ActiveRates/LatestRates semantics
    * as explicit keyed state): emits an update whenever a pair's newest
    * event time advances. flatMapGroupsWithState keeps one (event_time,
    * rate) per key — constant state per pair, any number of pairs.
    */
  def latestPerPair(updates: Dataset[RateUpdate]): Dataset[LatestRate] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.ccy_couple)
      .flatMapGroupsWithState[LatestRate, LatestRate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[RateUpdate], state: GroupState[LatestRate]) =>
          val incoming = rows.maxByOption(r => (r.event_time, r.rate))
          val current = state.getOption
          incoming match {
            case Some(r) if current.forall(_.event_time < r.event_time) =>
              val next = LatestRate(key, r.event_time, r.rate)
              state.update(next)
              Iterator.single(next)
            case _ => Iterator.empty
          }
      }
  }
}
