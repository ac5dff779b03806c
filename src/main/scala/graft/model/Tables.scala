package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders over the driver-generated parquet fixtures (TESTDATA.md)
  * plus the reference data model mapping (SURVEY.md §1).
  *
  * The reference's `exchange_rates` table
  * (/root/reference/update_exchange_rates.py:32-43) is re-expressed over the
  * synthetic `events` table: `user_id` plays the currency-pair key,
  * `value` the rate, `ts` both the quote event time and the ingestion
  * timestamp. This keeps every analysis operator testable against the
  * DuckDB oracle on the shared parquet tables.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Schema-adaptive `events` read. The driver has shipped `ts` both as
    * INT64 TIMESTAMP(NANOS) (which Spark only reads as raw longs, via the
    * legacy conf) and as TIMESTAMP_NTZ microseconds — branch on the dtype
    * the scan actually produces rather than hard-coding either era:
    *   - `LongType`  → nanos: truncate integrally to µs (`div` keeps the
    *     arithmetic exact at 1.7e18; matches DuckDB's ns→µs truncation).
    *   - `TimestampNTZType` → cast to session-TZ timestamp; the session is
    *     pinned UTC so the cast is value-stable and oracle-identical.
    *   - `TimestampType` → already what every downstream operator expects.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.parquet ts arrived as $other — the testdata generator " +
          "shipped a NEW physical type; teach Tables.events this era " +
          "first (every fx_*/rates/streaming query depends on it). A " +
          "silent cast here would turn one clear failure into dozens of " +
          "wrong-value results.")
    }
  }
  /** The text/vector corpora load SPREAD (see [[spread]]): essentially
    * every consumer of these two tables runs heavy per-row compute
    * (tokenization, regex normalization, signature hashing, vector
    * scoring) straight off the scan, and the fixture files are
    * single-row-group parquet — without the rebalance the whole map
    * stage of every dedup/similarity/curation pipeline runs on ONE core
    * regardless of the session's size. At warehouse scale the scan's
    * natural splits exceed the core count and no exchange is added.
    */
  def documents(s: SparkSession, d: String): DataFrame  =
    spread(load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    spread(load(s, d, "embeddings"))

  /** Scan partition count per fixture file, probed once per JVM — the
    * [[spread]] condition needs it and physical-planning the same tiny
    * scan on every loader call would be pure overhead.
    */
  private val scanParts =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Post-read rebalance guard for compute-heavy pipelines (the
    * input-skew remedy: an under-split input — one huge unsplittable
    * file, or a small single-row-group fixture — should be repartitioned
    * immediately after the read). The fixture tables are single-row-group
    * parquet, so every scan yields ONE task however many cores the
    * session has; a stage whose per-row work is heavy (signature
    * computation, media decode, scoring fan-out joins, iterative
    * training) then runs single-threaded. `spread` raises the stage's
    * parallelism to the session default ONLY when the scan
    * under-parallelizes: at warehouse scale the input's natural splits
    * exceed the core count and no exchange is added at all, so this is
    * scale-adaptive, not a local-mode constant. Row placement is the
    * only thing that changes — every gate's result is
    * partitioning-invariant by the oracle-hash contract (the driver
    * already re-runs the bench at a different core count).
    */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val parts = spreadKey(df) match {
      case Some(key) =>
        scanParts.computeIfAbsent(key, _ => df.rdd.getNumPartitions).intValue()
      case None => df.rdd.getNumPartitions
    }
    if (parts < want) df.repartition(want) else df
  }

  /** Memo key for [[spread]]'s partition probe: the scan's root paths —
    * stable per file set, independent of the plan object identity.
    * None for non-scan frames (probe uncached).
    */
  private def spreadKey(df: DataFrame): Option[String] =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.mkString(",")
          case _ => null
        }
    }.filter(_ != null)

  /** The reference rate-event schema (SURVEY.md §1.2). `event_time` is kept
    * in epoch MICROseconds (the reference uses ms, /root/reference/Fx_1min.py:73)
    * so that the synthetic microsecond-grain timestamps stay collision-free
    * and every argmax/window is deterministic.
    */
  val rateEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("event_time", LongType, nullable = false),
    StructField("ccy_couple", StringType, nullable = false),
    StructField("rate", DoubleType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false)))

  /** The reference row type (SURVEY §1.6) for the typed Dataset API. */
  final case class RateEvent(event_id: Long, event_time: Long,
      ccy_couple: String, rate: Double, date: java.sql.Date,
      timestamp: java.sql.Timestamp)

  /** Typed view: `Dataset[RateEvent]` with a case-class Encoder — use when
    * compile-time field checks matter; the DataFrame view is the default.
    */
  def ratesTyped(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[RateEvent] = {
    import spark.implicits._
    rates(spark, dir).as[RateEvent]
  }

  /** `events` viewed through the reference's `exchange_rates` model. */
  def rates(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id"),
      unix_micros(col("ts")).as("event_time"),
      col("user_id").cast(StringType).as("ccy_couple"),
      col("value").as("rate"),
      to_date(col("ts")).as("date"),
      col("ts").as("timestamp"))

  /** The same projection as DuckDB-dialect SQL, for composing oracle CTEs. */
  val ratesOracleCte: String =
    """rates AS (
      |  SELECT event_id,
      |         epoch_us(ts) AS event_time,
      |         CAST(user_id AS VARCHAR) AS ccy_couple,
      |         value AS rate,
      |         CAST(ts AS DATE) AS date,
      |         ts AS timestamp
      |  FROM events
      |)""".stripMargin
}
