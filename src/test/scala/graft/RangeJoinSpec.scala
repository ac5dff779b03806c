package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.RangeJoin

/** The two halves of the range-join contract: quantized results equal
  * the naive BETWEEN join exactly, and the plan is an equi-join — never
  * the nested-loop shape the declarative form degrades to.
  */
class RangeJoinSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def sides = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_event_id"),
        col("ts").as("p_ts"),
        (col("ts") + expr("INTERVAL 6 HOURS")).as("p_end"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_event_id"),
        col("ts").as("c_ts"))
    (purchases, clicks)
  }

  test("quantized range join equals the naive BETWEEN join, at several bucket widths") {
    val (purchases, clicks) = sides
    val naive = clicks.join(purchases,
        clicks("user_id") === purchases("user_id") &&
          col("c_ts") >= col("p_ts") && col("c_ts") <= col("p_end"))
      .select(col("p_event_id"), col("c_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty) // fixture must actually exercise the join
    // bucket width smaller than, equal to, and larger than the interval:
    // replication factor changes, the result must not
    for (bucket <- Seq(3600L, 6L * 3600, 24L * 3600)) {
      val fast = RangeJoin.pointInInterval(clicks, purchases,
          "c_ts", "p_ts", "p_end", Seq("user_id"), bucket * 1000000L)
        .select(col("p_event_id"), col("c_event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == naive, s"bucket=${bucket}s diverged")
    }
  }

  test("bounds are inclusive and each pair appears exactly once") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val intervals = Seq((1L, 10L, t("2024-01-01 00:00:00"), t("2024-01-01 01:00:00")))
      .toDF("k", "iv_id", "start_ts", "end_ts")
    // a malformed (end < start) interval must match nothing and must NOT
    // explode into a counted-down bucket range
    val reversed = Seq((1L, 99L, t("2024-01-02 00:00:00"), t("2024-01-01 00:00:00")))
      .toDF("k", "iv_id", "start_ts", "end_ts")
    val points = Seq(
      (1L, 100L, t("2024-01-01 00:00:00")),  // ON the start bound
      (1L, 101L, t("2024-01-01 01:00:00")),  // ON the end bound
      (1L, 102L, t("2024-01-01 00:30:00")),  // interior
      (1L, 103L, t("2024-01-01 01:00:00.001")), // just past the end
      (2L, 104L, t("2024-01-01 00:30:00")))  // wrong key
      .toDF("k", "pt_id", "pt_ts")
    // 10-minute buckets: the interval spans 7 buckets, interior points
    // must still match exactly once each
    val got = RangeJoin.pointInInterval(points,
        intervals.unionByName(reversed),
        "pt_ts", "start_ts", "end_ts", Seq("k"), 600000000L)
      .select(col("pt_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(100L, 101L, 102L))
  }

  test("interval overlap: exactly-once per pair across bucket widths, bounds inclusive") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // a1 spans many buckets and overlaps b1 over a multi-bucket window
    // (the duplicate-emission trap the canonical bucket must dodge);
    // a2 touches b1 at exactly one instant (inclusive bounds); a3 is
    // disjoint; key 2 must not cross-match
    val a = Seq(
      (1L, 11L, t("2024-01-01 00:00:00"), t("2024-01-01 06:00:00")),
      (1L, 12L, t("2024-01-01 08:00:00"), t("2024-01-01 08:30:00")),
      (1L, 13L, t("2024-01-02 00:00:00"), t("2024-01-02 01:00:00")),
      (2L, 14L, t("2024-01-01 01:00:00"), t("2024-01-01 02:00:00")))
      .toDF("k", "a_id", "a_start", "a_end")
    val b = Seq(
      (1L, 21L, t("2024-01-01 02:00:00"), t("2024-01-01 08:00:00")),
      (1L, 22L, t("2024-01-01 23:00:00"), t("2024-01-01 23:30:00")))
      .toDF("k", "b_id", "b_start", "b_end")
    val naive = a.join(b, Seq("k"))
      .where(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    assert(naive == Seq((11L, 21L), (12L, 21L))) // incl. the touch at 08:00
    Seq(600000000L, 3600000000L, 24L * 3600000000L).foreach { bucket =>
      val got = RangeJoin.intervalOverlap(a, b, "a_start", "a_end",
          "b_start", "b_end", Seq("k"), bucket)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
      assert(got == naive, s"bucket=$bucket") // sorted WITH duplicates:
      // a double emission would differ, not just a wrong set
    }
  }

  test("plan is a shuffle equi-join on (key, bucket) — no nested loop") {
    val (purchases, clicks) = sides
    val plan = RangeJoin.pointInInterval(clicks, purchases,
        "c_ts", "p_ts", "p_end", Seq("user_id"), 6L * 3600 * 1000000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"))
  }
}
