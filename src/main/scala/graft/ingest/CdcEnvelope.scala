package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Interop with EXTERNAL change-data-capture feeds: the Debezium-style
  * JSON envelope (`op` c/u/d, `ts_ms`, nested `before`/`after` row
  * images) parsed schema-first with `from_json` and adapted onto the
  * engine's own changelog contract, so `operators.Cdc.applyChangelog`
  * replays it without knowing the wire format. This is the missing half
  * of the CDC story: the engine's OWN merges emit changelogs
  * (MergeOps.writeChangelog); real deployments also CONSUME someone
  * else's.
  *
  * Scale shape: envelope parsing is a pure narrow map (one from_json per
  * record, schema-on-read — no per-field re-parse); the apply is
  * Cdc.applyChangelog's single key-shuffle WindowGroupLimit. Malformed
  * envelopes follow the corrupt-record quarantine convention
  * (from_json null → routed out, never dropped silently).
  */
object CdcEnvelope {

  private val rowSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderpriority", StringType)))

  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType), StructField("ts_ms", LongType),
    StructField("before", rowSchema), StructField("after", rowSchema)))

  /** Deterministic stand-in feed (no egress): one envelope per order —
    * key%10==0 deletes, key%3==0 updates the price by +1000, the rest
    * insert. At production scale this column arrives from a Kafka topic;
    * everything downstream is identical.
    */
  def syntheticFeed(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val rowImage = struct(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice"), col("o_orderpriority"))
    val updated = struct(col("o_orderkey"), col("o_custkey"),
      (col("o_totalprice") + lit(1000.0)).as("o_totalprice"),
      col("o_orderpriority"))
    val op = when(pmod(col("o_orderkey"), lit(10)) === 0, lit("d"))
      .when(pmod(col("o_orderkey"), lit(3)) === 0, lit("u"))
      .otherwise(lit("c"))
    o.select(to_json(struct(
      op.as("op"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("ts_ms"),
      when(op =!= "c", rowImage).as("before"),
      when(op =!= "d", updated).otherwise(lit(null).cast(rowSchema))
        .as("after"))).as("payload"))
  }

  /** A parsed envelope is usable iff it carries an op, a version stamp,
    * and a key in at least one row image. PERMISSIVE `from_json` returns
    * an all-null struct (not a null struct) for garbage input, so a bare
    * `env IS NOT NULL` can never fire — the predicate must look inside.
    */
  private def wellFormed = col("env.op").isNotNull &&
    col("env.ts_ms").isNotNull &&
    coalesce(col("env.after.o_orderkey"), col("env.before.o_orderkey")).isNotNull

  /** One `from_json` per record, guaranteed. Without a fence the
    * optimizer pushes the well-formedness filter below this projection,
    * substituting a from_json(to_json(...)) roundtrip PER CONJUNCT into
    * the filter (the synthetic feed's serializer collapses in too) —
    * ~4 serialize+parse cycles per row instead of 1, measured 2× on the
    * envelope gate query. The no-op non-deterministic guard INSIDE the
    * env expression is the fence: PushDownPredicates cannot cross a
    * projection with a non-deterministic field, and — unlike a separate
    * fence column — it cannot be column-pruned away, because it IS the
    * consumed column. Cost: one monotonically_increasing_id and one
    * always-true branch per row.
    */
  private def parsed(payloads: DataFrame): DataFrame =
    payloads.select(col("payload"),
      when(monotonically_increasing_id() >= 0,
        from_json(col("payload"), envelopeSchema)).as("env"))

  /** The quarantine side: raw payloads whose envelope failed the
    * well-formedness contract, preserved verbatim for replay/inspection.
    */
  def quarantined(payloads: DataFrame): DataFrame =
    parsed(payloads).where(!wellFormed).select(col("payload"))

  /** Parse envelopes onto the engine's changelog contract
    * (keys + cdc_batch + change_type + new_*): the key comes from
    * whichever row image the op carries, the version stamp from ts_ms.
    */
  def parseEnvelopes(payloads: DataFrame): DataFrame = {
    parsed(payloads).where(wellFormed)
      .select(
        coalesce(col("env.after.o_orderkey"), col("env.before.o_orderkey"))
          .as("o_orderkey"),
        col("env.ts_ms").as("cdc_batch"),
        when(col("env.op") === "c", lit("insert"))
          .when(col("env.op") === "u", lit("update"))
          .otherwise(lit("delete")).as("change_type"),
        col("env.after.o_custkey").as("new_o_custkey"),
        col("env.after.o_totalprice").as("new_o_totalprice"),
        col("env.after.o_orderpriority").as("new_o_orderpriority"))
  }

  /** End-to-end: synthesize → parse → apply; the reconstructed state must
    * equal the direct relational definition of the same edits.
    */
  def appliedState(s: SparkSession, dir: String): DataFrame =
    graft.operators.Cdc.applyChangelog(
      parseEnvelopes(syntheticFeed(s, dir)),
      keys = Seq("o_orderkey"),
      values = Seq("o_custkey", "o_totalprice", "o_orderpriority"))
}
