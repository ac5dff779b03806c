package graft.ingest

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.util.Scratch

/** The date-partitioned rates layout (SURVEY §7.2) exercised end-to-end:
  * materialize rates once per (session, dir) under `p_date=<day>/`
  * directories, then answer day-granular cutoff queries with PARTITION
  * PRUNING — whole days of files are skipped at planning time (the scan's
  * PartitionFilters, asserted in PartitionPruningSpec) instead of being
  * read and row-filtered. At a 100 TB multi-year history this layout is
  * the difference between scanning the days before the cutoff and
  * scanning everything.
  */
object PartitionedRates {

  private val written =
    new ConcurrentHashMap[(SparkSession, String), String]()

  /** Rates materialized date-partitioned, once per (session, dir); the
    * scratch tree is deleted at JVM exit.
    */
  def partitionedPath(s: SparkSession, dir: String): String =
    written.computeIfAbsent((s, dir), _ => {
      val path = Scratch.dir("graft_rates_by_day").resolve("rates").toString
      MergeOps.writeDatePartitioned(Tables.rates(s, dir), path)
      path
    })

  /** Per-pair stats under the reference's day-granular cutoff
    * (Fx_1min.py:133-145 — `date` is a calendar day, so `date <= cutoff`
    * is exactly `p_date <= cutoff_day`), expressed as a partition filter
    * over the partitioned layout. No row-level filter remains: the
    * predicate prunes at the directory level.
    */
  def cutoffStats(s: SparkSession, dir: String,
      cutoffDay: String = "2024-01-20"): DataFrame =
    s.read.parquet(partitionedPath(s, dir))
      .where(col("p_date") <= to_date(lit(cutoffDay)))
      .groupBy(col("ccy_couple"))
      .agg(count(lit(1)).as("n_ticks"),
        max(col("rate")).as("max_rate"),
        max(col("event_time")).as("max_event_time"))

  /** DYNAMIC partition pruning over the same layout: the days to scan
    * arrive from a JOIN against a filtered dimension (here: the
    * month-start days, a stand-in for any trading-calendar dim), not
    * from a literal — so static pruning can't fire, and Catalyst
    * instead broadcasts the dim, builds a `dynamicpruning` InSubquery
    * into the scan's PartitionFilters, and skips every other day's
    * directories AT RUNTIME (asserted on the plan in
    * `PartitionPruningSpec`). At 100 TB this is the fact⋈calendar
    * pattern: the fact scan reads only the partitions the dim selects,
    * without the query author enumerating them.
    */
  def dppDayStats(s: SparkSession, dir: String,
      maxDayOfMonth: Int = 3): DataFrame = {
    val fact = s.read.parquet(partitionedPath(s, dir))
    val dim = Tables.rates(s, dir).select(col("date")).distinct()
      .where(dayofmonth(col("date")) <= maxDayOfMonth)
      .select(col("date").as("p_date"))
    fact.join(dim, "p_date")
      .groupBy(col("p_date"))
      .agg(count(lit(1)).as("n_ticks"),
        max(col("rate")).as("max_rate"),
        min(col("rate")).as("min_rate"))
  }
}
