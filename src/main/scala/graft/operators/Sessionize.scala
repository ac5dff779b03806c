package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the batch form of the
  * streaming session-window extension SURVEY §2.10 names. One shuffle on the
  * session key; the session id is a running count of gap breaks, so the
  * whole operator is two window functions over the same (key, time) sort —
  * Catalyst collapses them into a single WindowExec.
  */
object Sessionize {

  /** Appends a `session_id` column: consecutive events of the same `key`
    * closer than `gapSeconds` apart share an id. `tiebreak` makes the sort
    * total when timestamps can collide (pass a unique event id).
    */
  def withSessionId(events: DataFrame, key: String, ts: String,
      gapSeconds: Long, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).asc, tiebreak.asc)
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("__prev_ts", lag(col(ts), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_micros(col(ts)) - unix_micros(col("__prev_ts")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev_ts", "__new_session")
  }

  /** TOP SESSION PATHS — the path-analysis staple of product analytics:
    * each session's first `maxSteps` events (in total (ts, tiebreak)
    * order) joined into a `>`-separated path string, then the `topK`
    * most frequent paths corpus-wide. A `row_number ≤ maxSteps` filter
    * (WindowGroupLimit) bounds each session BEFORE the collect, so a
    * pathological bot session never materializes an unbounded array in
    * one aggregation buffer; the collected (ts, tiebreak, step) structs
    * are still sorted in the buffer so reassembly is
    * shuffle-order-proof. The path relation is ≤ one row per session
    * and the final ranking is a digest. Ties rank by path string.
    */
  def topSessionPaths(events: DataFrame, key: String, ts: String,
      gapSeconds: Long, tiebreak: Column, stepCol: String,
      maxSteps: Int = 5, topK: Int = 10): DataFrame = {
    val stepW = Window.partitionBy(col(key), col("session_id"))
      .orderBy(col(ts).asc, tiebreak.asc)
    val paths = withSessionId(events, key, ts, gapSeconds, tiebreak)
      .withColumn("__rn", row_number().over(stepW))
      .where(col("__rn") <= maxSteps)
      .groupBy(col(key), col("session_id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col(ts), tiebreak, col(stepCol)))),
          x => x.getField(stepCol)), ">").as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path").asc)))
      .where(col("rank") <= topK)
  }

  /** Per-session rollup: bounds, size, and an exact (decimal-summed) value
    * total, so results hash-match any engine regardless of add order.
    */
  def sessionStats(events: DataFrame, key: String, ts: String,
      gapSeconds: Long, tiebreak: Column, valueCol: String): DataFrame =
    withSessionId(events, key, ts, gapSeconds, tiebreak)
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total_value"))
}
