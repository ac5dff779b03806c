package graft

import org.apache.spark.sql.functions._

import graft.fixtures.RateFixtures
import graft.ingest.MergeOps
import graft.operators.Scd2

/** SCD2 history invariants: intervals chain gaplessly per key, exactly
  * one open (current) interval per key, and the current rows reproduce
  * the destructive upsert's table — history is a strict superset of what
  * the reference keeps.
  */
class Scd2Spec extends SparkSuite {

  private val keys = Seq("ccy_couple", "date")

  private def hist = Scd2.history(RateFixtures.exchangeRates(spark),
    keys, "timestamp", col("event_id"))

  test("intervals chain: each version's valid_to is the next valid_from") {
    val rows = hist.select(col("ccy_couple"), col("date").cast("string"),
        unix_micros(col("valid_from")), unix_micros(col("valid_to")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    rows.groupBy(_._1).values.foreach { vs =>
      val sorted = vs.map(_._2).sortBy(_._1)
      sorted.zip(sorted.tail).foreach { case ((_, to), (from2, _)) =>
        assert(to.contains(from2)) // gapless chain
      }
      assert(sorted.init.forall(_._2.isDefined) && sorted.last._2.isEmpty)
    }
  }

  test("incremental maintenance: untouched buckets byte-identical, result = batch SCD2") {
    val root = graft.util.Scratch.dir("scd2_incr")
    val hist = root.resolve("history").toString
    val all = RateFixtures.exchangeRates(spark)
    def bucketFiles(): Map[String, Map[String, (Long, Long)]] = {
      val d = new java.io.File(hist)
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.startsWith("bucket="))
        .map(b => b.getName -> b.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> (f.lastModified(), f.length())).toMap).toMap
    }
    def apply(batch: org.apache.spark.sql.DataFrame): Unit =
      graft.operators.Scd2.applyVersionBatch(hist, batch, keys,
        "timestamp", "event_id", Seq("rate"))

    // batch 1: everything except EUR/USD — establishes several buckets
    apply(all.where(col("ccy_couple") =!= "EUR/USD"))
    val before = bucketFiles()
    assert(before.nonEmpty)

    // batch 2: only EUR/USD versions — buckets not hosting EUR keys must
    // stay byte-for-byte untouched (names, mtimes, sizes)
    apply(all.where(col("ccy_couple") === "EUR/USD"))
    val after = bucketFiles()
    val eurBuckets = after.keySet.diff(before.keySet) ++
      before.keySet.filter(b => before(b) != after(b))
    assert((before.keySet -- eurBuckets).forall(b => before(b) == after(b)))
    assert((before.keySet -- eurBuckets).nonEmpty) // some buckets untouched

    // batch 3: re-deliver EVERYTHING — idempotent, converges to batch SCD2
    apply(all)
    val got = spark.read.parquet(hist)
      .select(col("ccy_couple"), col("date"), col("rate"),
        unix_micros(col("valid_from")), unix_micros(col("valid_to")),
        col("is_current"))
      .collect().map(_.toSeq).toSet
    val expected = Scd2.history(all, keys, "timestamp", col("event_id"))
      .select(col("ccy_couple"), col("date"), col("rate"),
        unix_micros(col("valid_from")), unix_micros(col("valid_to")),
        col("is_current"))
      .collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("current rows = the upsert table (history strictly supersets it)") {
    val current = hist.where(col("is_current"))
      .select(col("ccy_couple"), col("date"), col("rate"))
      .collect().map(_.toSeq).toSet
    val upserted = MergeOps.upsertLatest(RateFixtures.exchangeRates(spark),
        keys, Seq(col("timestamp"), col("event_id")))
      .select(col("ccy_couple"), col("date"), col("rate"))
      .collect().map(_.toSeq).toSet
    assert(current == upserted)
    assert(hist.count() == RateFixtures.rows.size) // nothing dropped
  }

  test("temporal join: each fact meets exactly its own-instant version") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // key K versions: v1 @10:00 (rate 1.0), v2 @12:00 (2.0), v3 @14:00 (3.0)
    val versions = Seq(
      ("K", 1L, t("2024-01-01 10:00:00"), 1.0),
      ("K", 2L, t("2024-01-01 12:00:00"), 2.0),
      ("K", 3L, t("2024-01-01 14:00:00"), 3.0))
      .toDF("k", "event_id", "timestamp", "rate")
    val hist = Scd2.history(versions, Seq("k"), "timestamp", col("event_id"))
      .select(col("k"), col("rate"), col("valid_from"), col("valid_to"))
    val facts = Seq(
      ("K", 100L, t("2024-01-01 09:00:00")),  // before first version: drops
      ("K", 101L, t("2024-01-01 10:00:00")),  // ON v1's start → v1
      ("K", 102L, t("2024-01-01 11:59:59")),  // just before v2 → v1
      ("K", 103L, t("2024-01-01 12:00:00")),  // ON the boundary → v2 (half-open)
      ("K", 104L, t("2024-01-01 23:00:00")),  // open current interval → v3
      ("X", 105L, t("2024-01-01 12:00:00")))  // unknown key: drops
      .toDF("k", "fact_id", "fact_ts")
    val got = Scd2.temporalJoin(facts, hist, Seq("k"), "fact_ts")
      .select(col("fact_id"), col("rate")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).sorted
    assert(got.toSeq == Seq(101L -> 1.0, 102L -> 1.0, 103L -> 2.0,
      104L -> 3.0))
  }
}
