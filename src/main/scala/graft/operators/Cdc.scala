package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data capture between two table snapshots: emit each key once
  * with `change_type` ∈ {insert, update, delete} (unchanged keys are
  * dropped). This is the diff a downstream consumer applies to stay in
  * sync without re-reading the table — the warehouse complement to
  * MergeOps (which APPLIES changes, where this one RECOVERS them).
  *
  * Shape at scale: one full-outer shuffle join on the key columns and a
  * row-level comparison — no window, no driver state. Value comparison
  * is null-safe (`<=>` per column), so a value flipping to/from NULL is
  * an update, not an accidental "unchanged".
  */
object Cdc {

  /** Diff `newSnap` against `oldSnap` on `keys`, comparing `values`.
    * Output: key columns, old/new value columns (`old_`/`new_` prefixed),
    * change_type.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String], values: Seq[String]): DataFrame = {
    val o = values.foldLeft(oldSnap.select((keys ++ values).map(col): _*)) {
      (d, v) => d.withColumnRenamed(v, s"old_$v")
    }.withColumn("__in_old", lit(true))
    val n = values.foldLeft(newSnap.select((keys ++ values).map(col): _*)) {
      (d, v) => d.withColumnRenamed(v, s"new_$v")
    }.withColumn("__in_new", lit(true))
    val joined = o.join(n, keys, "full_outer")
    val unchanged: Column = values.map(v =>
      col(s"old_$v") <=> col(s"new_$v")).reduce(_ && _)
    joined.withColumn("change_type",
        when(col("__in_old").isNull, "insert")
          .when(col("__in_new").isNull, "delete")
          .when(unchanged, "unchanged")
          .otherwise("update"))
      .where(col("change_type") =!= "unchanged")
      .drop("__in_old", "__in_new")
  }

  /** The consumer side: reconstruct the table AS OF `upToBatch` from an
    * append-only changelog (rows shaped like [[snapshotDiff]] output plus
    * a `cdc_batch` stamp) — each key's newest change at or below the
    * cutoff wins; a key whose last change is a delete is absent. This is
    * CDC time travel: any historical state from one changelog scan,
    * without table snapshots. One shuffle on the key, WindowGroupLimit
    * top-1 — no global sort; (key, cdc_batch) is unique by construction
    * (one diff row per key per batch), so the order is total.
    */
  def applyChangelog(changelog: DataFrame, keys: Seq[String],
      values: Seq[String], upToBatch: Option[Long] = None): DataFrame = {
    val bounded = upToBatch.fold(changelog)(b =>
      changelog.where(col("cdc_batch") <= b))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("cdc_batch").desc)
    bounded.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .where(col("change_type") =!= "delete")
      .select(keys.map(col) ++ values.map(v => col(s"new_$v").as(v)): _*)
  }
}
