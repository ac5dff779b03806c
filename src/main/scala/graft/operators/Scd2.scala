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

  /** TEMPORAL dimension join — the warehouse join the history exists
    * for: each fact row meets the ONE dimension version valid at its
    * own event time (`valid_from <= ts < valid_to`, open current
    * version included), not at some global cutoff. With the entity key
    * in the join this is a plain hash equi-join; the interval predicate
    * is a residual that scans only the fact's key's version list, so
    * per-fact work is bounded by that key's update count — the same
    * bound the history itself has. (Keyless or mega-version cases
    * would reach for RangeJoin's bucket quantization instead.)
    * Intervals partition the timeline after a key's first version, so
    * each fact matches at most once; facts predating their key's first
    * version drop (inner semantics).
    */
  def temporalJoin(facts: DataFrame, history: DataFrame, keys: Seq[String],
      factTs: String): DataFrame =
    facts.join(history, keys)
      .where(col("valid_from") <= col(factTs)
        && (col("valid_to").isNull || col(factTs) < col("valid_to")))

  /** INCREMENTAL SCD2 maintenance: apply one batch of new versions to a
    * key-bucketed history table at O(touched buckets) per batch. The
    * history is laid out partitioned by `bucket` = hash(key) % nBuckets,
    * so a key's versions can never straddle partitions; a batch reads
    * ONLY the buckets its keys hash into (partition pruning), rebuilds
    * the lead() intervals over (existing ∪ new) versions of those
    * buckets, and dynamic-overwrites just them. Untouched buckets stay
    * byte-for-byte on disk (Scd2Spec). At warehouse scale nBuckets is
    * sized so a bucket ≪ the table — per-batch cost tracks the batch's
    * key spread, never the history size (the same O(touched partitions)
    * discipline as MergeOps.mergeIntoDatePartitioned, which maintains
    * CURRENT state where this maintains ALL states).
    *
    * Idempotent under re-delivery: versions dedup on (keys, tiebreak)
    * before the rebuild, and the interval recompute is a pure function
    * of the version set — so the crash-recovery contract is the same:
    * re-running a batch converges.
    */
  def applyVersionBatch(historyPath: String, batch: DataFrame,
      keys: Seq[String], versionTs: String, tiebreakCol: String,
      valueCols: Seq[String], nBuckets: Int = 8): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val bucketOf = pmod(hash(keys.map(col): _*), lit(nBuckets)).cast("int")
    val versionCols = keys ++ valueCols ++ Seq(versionTs, tiebreakCol)
    val newV = batch.select(versionCols.map(col): _*)
      .withColumn("bucket", bucketOf)

    val hPath = new org.apache.hadoop.fs.Path(historyPath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val touched = newV.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val existing =
      if (fs.exists(hPath))
        spark.read.parquet(historyPath)
          .where(col("bucket").isin(touched: _*))
          .select((versionCols :+ "bucket").map(col): _*)
      else newV.limit(0)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionTs).asc, col(tiebreakCol).asc)
    val rebuilt = existing.unionByName(newV)
      .dropDuplicates(keys :+ tiebreakCol)
      .withColumn("valid_from", col(versionTs))
      .withColumn("valid_to", lead(col(versionTs), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)

    // staging hop + dynamic overwrite of the touched buckets only — the
    // same swap (and recovery contract) as the date-partitioned merge
    val staging = new org.apache.hadoop.fs.Path(historyPath + "__staging")
    rebuilt.repartition(col("bucket"))
      .write.mode("overwrite").parquet(staging.toString)
    spark.read.parquet(staging.toString)
      .write.partitionBy("bucket")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(historyPath)
    fs.delete(staging, true)
    ()
  }
}
