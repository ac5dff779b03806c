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
}
