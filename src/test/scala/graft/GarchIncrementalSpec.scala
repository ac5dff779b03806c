package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.analysis.GarchIncremental

/** The order-dependent-incremental contracts, second instance: frontier
  * revision, marker idempotence, and the crash-window retry must all
  * hold for the GARCH recurrence exactly as [[ZigzagIncrementalSpec]]
  * pins them for the zigzag fold.
  */
class GarchIncrementalSpec extends SparkSuite {

  private def batch(rows: Seq[(String, String, Double, Long)]) = {
    import spark.implicits._
    rows.toDF("ccy_couple", "tss", "rate", "event_id")
      .withColumn("timestamp", to_timestamp(col("tss")))
      .select(col("ccy_couple"), col("timestamp"), col("rate"),
        col("event_id"))
  }

  /** Plain-Scala recompute of the recurrence over milli changes. */
  private def expectSigma(chgMilli: Seq[Long]): Double = {
    var s = 20000.0
    chgMilli.map(_.toDouble).foreach(r =>
      s = 1000.0 + 0.1 * (r * r) + 0.85 * s)
    s
  }

  test("a frontier close revised by a later batch folds at its final value") {
    val root = Files.createTempDirectory("gv_spec").toString
    // batch 1: day 1 @1.000, day 2 @1.300 (to be revised)
    GarchIncremental.applyBatch(spark, root, batch(Seq(
      ("Z", "2024-01-01 10:00:00", 1.000, 1L),
      ("Z", "2024-01-02 10:00:00", 1.300, 2L))), batchId = Some(0L))
    // batch 2: day 2 revised to 1.150 (later LWW), day 3 @0.900
    GarchIncremental.applyBatch(spark, root, batch(Seq(
      ("Z", "2024-01-02 15:00:00", 1.150, 3L),
      ("Z", "2024-01-03 10:00:00", 0.900, 4L))), batchId = Some(1L))
    val r = GarchIncremental.report(spark, root).collect().head
    // changes: +150 (1.000→1.150 REVISED, not +300), then −250
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == expectSigma(Seq(150L, -250L)))
  }

  test("re-delivered batch is a no-op under its marker") {
    val root = Files.createTempDirectory("gv_spec2").toString
    val b = batch(Seq(("Z", "2024-01-01 10:00:00", 1.000, 1L),
      ("Z", "2024-01-02 10:00:00", 1.200, 2L),
      ("Z", "2024-01-03 10:00:00", 1.100, 3L)))
    GarchIncremental.applyBatch(spark, root, b, batchId = Some(0L))
    GarchIncremental.applyBatch(spark, root, b, batchId = Some(0L))
    val r = GarchIncremental.report(spark, root).collect().head
    // folded once: +200, then −100 — a double-fold would shift n and σ²
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == expectSigma(Seq(200L, -100L)))
  }

  test("crash-window retry (state written, marker missing) re-folds from the pre-batch state") {
    val root = Files.createTempDirectory("gv_spec3").toString
    val b0 = batch(Seq(("Z", "2024-01-01 10:00:00", 1.000, 1L),
      ("Z", "2024-01-02 10:00:00", 1.100, 2L)))
    GarchIncremental.applyBatch(spark, root, b0, batchId = Some(0L))
    val b1 = batch(Seq(("Z", "2024-01-03 10:00:00", 1.050, 3L)))
    GarchIncremental.applyBatch(spark, root, b1, batchId = Some(1L))
    // simulate the crash: batch 1's work is on disk but its marker is
    // not — the retry must read only generations strictly below id 1
    Files.delete(java.nio.file.Paths.get(root, "_applied", "batch-1"))
    GarchIncremental.applyBatch(spark, root, b1, batchId = Some(1L))
    val r = GarchIncremental.report(spark, root).collect().head
    // +100 then −50, each folded exactly once despite the retry
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == expectSigma(Seq(100L, -50L)))
  }
}
