package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history: turn a mutation stream into
  * validity intervals. The reference's `ON DUPLICATE KEY UPDATE` table
  * (/root/reference/Fx_1min.py:93-125) DESTROYS history — every upsert
  * overwrites the previous rate unrecoverably. The warehouse-native
  * answer keeps every version with `[valid_from, valid_to)` bounds:
  * current state is `valid_to IS NULL` (recovering the upsert table),
  * and any as-of time is answerable with a range predicate.
  *
  * Shape at scale: ONE window (lead over the per-key version order) —
  * a single hash shuffle on the key columns, no self-join, no driver
  * loop. The per-key partition is the number of VERSIONS of one key
  * (bounded by update frequency, never by corpus size), so skew is the
  * hottest key's update count — the same bound the upsert itself has.
  */
object Scd2 {

  /** Expand `df` (one row per observed version) into SCD2 intervals.
    *
    * @param keys      entity identity columns
    * @param versionTs the observation/ingest timestamp column (becomes
    *                  valid_from)
    * @param tiebreak  total-order tiebreak within equal timestamps (an
    *                  event id) — without it interval bounds would be
    *                  nondeterministic under equal-ts updates
    */
  def history(df: DataFrame, keys: Seq[String], versionTs: String,
      tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionTs).asc, tiebreak.asc)
    df.withColumn("valid_from", col(versionTs))
      .withColumn("valid_to", lead(col(versionTs), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
