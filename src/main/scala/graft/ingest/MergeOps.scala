package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's two write disciplines (SURVEY.md §2.2), as relational
  * operators over immutable parquet instead of InnoDB index mutations.
  */
object MergeOps {

  /** K1 (/root/reference/Fx_1min.py:93-125): `INSERT … ON DUPLICATE KEY
    * UPDATE` on key (ccy_couple, date) — last-writer-wins. Spark shape:
    * keep, per key, the single row with the greatest `ordering` (ingestion
    * time, then a deterministic tiebreak). One hash-partition shuffle on
    * the key; WindowGroupLimit keeps it top-1 without a full sort spill.
    */
  def upsertLatest(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** K1 applied to a base+updates pair: union then resolve. `updates` wins
    * ties via the version column ordering the caller supplies.
    */
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String],
      ordering: Seq[Column]): DataFrame =
    upsertLatest(base.unionByName(updates), keys, ordering)

  /** K2 (/root/reference/update_exchange_rates.py:79-108): plain INSERT with
    * duplicate-key errors swallowed — i.e. insert-if-absent. A left-anti
    * join against the existing key set; broadcast when the key set is small.
    */
  def insertIfAbsent(newRows: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    newRows.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** SURVEY §7.2: the rates table is laid out date-partitioned, so cutoff
    * and date-range predicates become partition pruning (whole days of
    * files skipped at planning time) instead of row filters — the layout
    * that matters most at a 100 TB history. A day of updates rewrites one
    * partition, not the table (dynamic overwrite).
    */
  def writeDatePartitioned(df: DataFrame, path: String,
      dateCol: String = "date"): Unit =
    df.withColumn("p_date", to_date(col(dateCol)))
      .write.partitionBy("p_date")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(path)
}
