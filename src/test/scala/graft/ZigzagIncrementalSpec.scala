package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.analysis.ZigzagIncremental

/** The property the buffered frontier exists for: a later batch can
  * REVISE the newest day's close before it finalizes, and the folded
  * pivot must carry the revised value — folding eagerly at first sight
  * would bake in the stale close.
  */
class ZigzagIncrementalSpec extends SparkSuite {

  test("frontier day revised by a later batch folds at its final close") {
    import spark.implicits._
    val root = Files.createTempDirectory("zz_spec").toString
    def batch(rows: Seq[(String, String, Double, Long)]) =
      rows.toDF("ccy_couple", "tss", "rate", "event_id")
        .withColumn("timestamp", to_timestamp(col("tss")))
        .select(col("ccy_couple"), col("timestamp"), col("rate"),
          col("event_id"))

    // batch 1: day 1 @1000, day 2 @1300 (1300 will be revised)
    ZigzagIncremental.applyBatch(spark, root, batch(Seq(
      ("Z", "2024-01-01 10:00:00", 1000.0, 1L),
      ("Z", "2024-01-02 10:00:00", 1300.0, 2L))), batchId = Some(0L))
    // batch 2: day 2 revised DOWN to 1150 (later event wins LWW), day 3
    ZigzagIncremental.applyBatch(spark, root, batch(Seq(
      ("Z", "2024-01-02 15:00:00", 1150.0, 3L),
      ("Z", "2024-01-03 10:00:00", 900.0, 4L))), batchId = Some(1L))

    val out = ZigzagIncremental.report(spark, root).collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getInt(3))).toSet
    // anchor low at day 1; swing high at day 2 with the REVISED 1150000
    // (eager folding would have emitted 1300000); day 3 stays the open
    // frontier after its report-time fold confirms the high
    assert(out == Set(("2024-01-01", 1000000L, -1),
      ("2024-01-02", 1150000L, 1)))
  }

  test("re-delivered batch is a no-op under its marker") {
    import spark.implicits._
    val root = Files.createTempDirectory("zz_spec2").toString
    def batch(rows: Seq[(String, String, Double, Long)]) =
      rows.toDF("ccy_couple", "tss", "rate", "event_id")
        .withColumn("timestamp", to_timestamp(col("tss")))
        .select(col("ccy_couple"), col("timestamp"), col("rate"),
          col("event_id"))
    val b = batch(Seq(("Z", "2024-01-01 10:00:00", 1000.0, 1L),
      ("Z", "2024-01-02 10:00:00", 1200.0, 2L)))
    ZigzagIncremental.applyBatch(spark, root, b, batchId = Some(0L))
    ZigzagIncremental.applyBatch(spark, root, b, batchId = Some(0L))
    val out = ZigzagIncremental.report(spark, root).collect()
    assert(out.length == 1) // the single anchor-low pivot, not doubled
  }

  test("crash-window retry (state written, marker missing) re-folds from the pre-batch state") {
    import spark.implicits._
    val root = Files.createTempDirectory("zz_spec3").toString
    def batch(rows: Seq[(String, String, Double, Long)]) =
      rows.toDF("ccy_couple", "tss", "rate", "event_id")
        .withColumn("timestamp", to_timestamp(col("tss")))
        .select(col("ccy_couple"), col("timestamp"), col("rate"),
          col("event_id"))
    val b0 = batch(Seq(("Z", "2024-01-01 10:00:00", 1000.0, 1L),
      ("Z", "2024-01-02 10:00:00", 1200.0, 2L)))
    // day 3 finalizes day 2; day 4 crashes to become the new frontier
    val b1 = batch(Seq(("Z", "2024-01-03 10:00:00", 900.0, 3L),
      ("Z", "2024-01-04 10:00:00", 1400.0, 4L)))
    ZigzagIncremental.applyBatch(spark, root, b0, batchId = Some(0L))
    ZigzagIncremental.applyBatch(spark, root, b1, batchId = Some(1L))
    val clean = ZigzagIncremental.report(spark, root).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getInt(3))).toSet

    // simulate the crash window: state/b1 + pivots/b1 exist, marker gone
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "_applied", "batch-1"))
    ZigzagIncremental.applyBatch(spark, root, b1, batchId = Some(1L))
    val retried = ZigzagIncremental.report(spark, root).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getInt(3))).toSet
    // a global-max state read would fold day 2/3 twice and emit
    // duplicate or phantom pivots; the bounded read keeps it bit-equal
    assert(retried == clean)
  }
}
