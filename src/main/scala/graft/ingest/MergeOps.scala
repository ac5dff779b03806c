package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** K1 as an INCREMENTAL merge into a date-partitioned table: only the
    * date partitions the batch actually touches are read, merged, and
    * rewritten (dynamic partition overwrite); every other partition's
    * files are left byte-for-byte untouched. This is the scale-safe form
    * of the reference's per-run upsert (/root/reference/Fx_1min.py:93-125
    * touches ~one day's keys per run): cost is O(touched days), not
    * O(table) — at a 100 TB history the difference between rewriting one
    * day and rewriting three years per micro-batch.
    *
    * The (keys, dateCol) contract: `dateCol`'s day must be a function of
    * the merge key (here the key CONTAINS the date), so a key's rows can
    * never straddle partitions and the per-partition merge is exact.
    *
    * The merged result takes a hop through a staging directory before the
    * dynamic overwrite: Spark refuses to overwrite a path that is also a
    * read source of the same plan, and cache()-based self-overwrite (the
    * previous design) corrupts the target if any cached partition is
    * evicted mid-write. The staging write is also O(touched days). At
    * warehouse scale the equivalent is a transactional table-format
    * commit; on raw parquet the staging hop is what makes the swap safe.
    *
    * RECOVERY CONTRACT: the swap is not atomic across partitions, but a
    * crash anywhere (after the staging write, or mid-overwrite with some
    * partitions swapped and others stale) is repaired by RE-RUNNING THE
    * SAME BATCH MERGE — LWW over (partially-merged ∪ batch) is the same
    * per-key argmax as over (old ∪ batch), so the retry converges to the
    * identical table and re-overwrites any orphaned staging tree
    * (MergeOpsSpec "staging-swap crash recovery").
    */
  /** Append one micro-batch's change rows to `path`: the snapshotDiff
    * output plus the batch id. Sharded by the day of `dateCol` when the
    * diff carries one — a micro-batch spans ~a day so that still writes
    * one file per batch, but a backfill-sized replay through the same
    * writer fans out one task per touched day instead of funnelling
    * everything through a single coalesce(1) task. maxRecordsPerFile
    * bounds a skewed day; AQE drops the empty shuffle partitions.
    */
  // crash-duplicate tolerance: a mid-commit crash + retry can duplicate
  // changelog rows, but duplicates are BYTE-IDENTICAL full images and
  // every reader resolves per (key, cdc_batch) top-1 — identical rows
  // tie to an identical result, so plain append stays sound here
  // (additive partials use graft.util.BatchAppend instead)
  private def writeChangelog(path: String, diff: DataFrame,
      batchId: Long, dateCol: Option[String] = None): Unit = {
    val stamped = diff.withColumn("cdc_batch", lit(batchId))
    val sharded = dateCol.filter(diff.columns.contains) match {
      case Some(d) => stamped.repartition(to_date(col(d)))
      case None    => stamped.coalesce(1)
    }
    sharded.write.option("maxRecordsPerFile", 1000000L)
      .mode("append").parquet(path)
  }

  /** @param changelog when set, every merge also APPENDS the batch's
    *   change rows (insert/update, old_/new_ images, cdc_batch) to this
    *   path — the per-batch CDC feed downstream consumers apply to stay
    *   in sync without re-reading the table. The before/after images are
    *   relations the merge already computes (the overlap read and the
    *   staged result), so the changelog costs one extra diff of O(touched
    *   days), not a table scan; the diff itself is operators.Cdc's.
    *   Changelog rows are written BEFORE the destructive target swap, so
    *   a crash between the two yields at-least-once changelog delivery
    *   (the retry's re-merge then diffs against the already-applied state
    *   and re-emits nothing) — the conventional contract for a CDC feed.
    * @param changelogBatchId stamped on the rows as `cdc_batch`.
    */
  def mergeIntoDatePartitioned(target: String, batch: DataFrame,
      keys: Seq[String], ordering: Seq[Column],
      dateCol: String = "date",
      changelog: Option[String] = None,
      changelogBatchId: Long = 0L): Unit = {
    if (batch.isEmpty) return // empty micro-batch: nothing to merge
    val spark = batch.sparkSession
    val withP = batch.withColumn("p_date", to_date(col(dateCol)))

    val hPath = new org.apache.hadoop.fs.Path(target)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val hasPartitions = fs.exists(hPath) &&
      fs.listStatus(hPath).exists(_.getPath.getName.startsWith("p_date="))

    // the touched-day set is tiny by construction (a micro-batch spans
    // ~a day of keys); collecting it is what turns the read of the
    // existing side into partition PRUNING instead of a scan — and lets
    // the merge read ONLY the days that already exist on disk
    val touched = withP.select(col("p_date")).distinct()
      .collect().map(_.getDate(0)).toSeq
    if (touched.isEmpty) return
    val overlap =
      if (!hasPartitions) Seq.empty
      else touched.filter(d =>
        fs.exists(new org.apache.hadoop.fs.Path(hPath, s"p_date=$d")))

    def writePartitioned(df: DataFrame): Unit =
      df.repartition(col("p_date"))
        .write.partitionBy("p_date")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(target)

    // value columns the changelog diffs (everything but key + layout cols)
    def cdcValues(df: DataFrame): Seq[String] =
      df.columns.toIndexedSeq.filterNot(c => keys.contains(c) || c == "p_date")

    if (overlap.isEmpty) {
      // fast path — every touched day is NEW (the common case for a
      // time-ordered feed: each run appends fresh days, overlapping the
      // previous run on at most a boundary day). No existing data is
      // read, so no staging hop is needed; the in-batch upsert writes
      // one compacted file per day straight into fresh partition dirs.
      // persisted only when the changelog ALSO consumes it: otherwise the
      // changelog write and the table write would each re-execute the
      // upsert plan (dedup window included)
      val upserted0 = upsertLatest(withP, keys, ordering)
      val upserted = if (changelog.isDefined)
        upserted0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else upserted0
      try {
        changelog.foreach { cl =>
          // no before-image exists: every merged row is an insert. Stamp
          // the diff shape directly — snapshotDiff against an empty frame
          // would pay a full-outer join to discover that fact
          val values = cdcValues(upserted)
          writeChangelog(cl, upserted.select(
            keys.map(col) ++
              values.map(v => lit(null).cast(upserted.schema(v).dataType)
                .as(s"old_$v")) ++
              values.map(v => col(v).as(s"new_$v")) :+
              lit("insert").as("change_type"): _*),
            changelogBatchId, dateCol = Some(dateCol))
        }
        writePartitioned(upserted)
      } finally { if (changelog.isDefined) { upserted.unpersist(); () } }
    } else {
      // merge path — read ONLY the overlapping days' partitions, merge,
      // and swap via a staging hop: Spark refuses to overwrite a path
      // that is also a read source of the same plan, and cache()-based
      // self-overwrite corrupts the target if a cached partition is
      // evicted mid-write. The repartition by day keeps the swapped-in
      // partition at ONE compacted file per touched day, not
      // shuffle-partition-count × days splinters.
      // Align the LWW metadata columns BOTH ways before the union: a
      // target written before versioned ingest existed (no ingest_batch /
      // ingest_version) gets them backfilled as 0 — pre-versioning rows
      // predate any delivery order, so they lose LWW to any batch row —
      // and an unversioned batch merging into a versioned table gets
      // version 0 likewise. Without this the batch-side projection onto
      // existing.columns silently DROPS the ordering columns and the
      // window orderBy fails unresolved on the first overlapping day.
      val metaCols = Seq("ingest_version", "ingest_batch")
      // mergeSchema: without it parquet resolves the schema from ONE file
      // footer — on a mixed-schema table (some partitions written before
      // versioned ingest existed) a legacy footer would hide the real
      // ingest_version column and the backfill below would stamp 0L over
      // rows whose true versions are higher, letting a stale re-delivery
      // win LWW over an applied correction. The overlap read is O(touched
      // days), so the footer-merge cost is negligible.
      val existingRaw = spark.read.option("mergeSchema", "true").parquet(target)
        .where(col("p_date").isin(overlap: _*))
      val existing = metaCols
        .filter(c => withP.columns.contains(c) && !existingRaw.columns.contains(c))
        .foldLeft(existingRaw)((df, c) => df.withColumn(c, lit(0L)))
      val batchAligned = metaCols
        .filter(c => existing.columns.contains(c) && !withP.columns.contains(c))
        .foldLeft(withP)((df, c) => df.withColumn(c, lit(0L)))
      val merged = merge(existing,
        batchAligned.select(existing.columns.toIndexedSeq.map(col): _*),
        keys, ordering)
      val staging = new org.apache.hadoop.fs.Path(target + "__staging")
      merged.repartition(col("p_date"))
        .write.mode("overwrite").parquet(staging.toString)
      changelog.foreach { cl =>
        // before = the overlap days still on disk (this plan lazily reads
        // the PRE-overwrite files, which is why the changelog must be
        // written before the swap below); after = the staged merge result
        // (overlap days + the batch's new days — new-day keys fall out of
        // the full-outer diff as inserts)
        val after = spark.read.parquet(staging.toString)
        writeChangelog(cl, graft.operators.Cdc.snapshotDiff(
          existing, after, keys, cdcValues(after)), changelogBatchId,
          dateCol = Some(dateCol))
      }
      spark.read.parquet(staging.toString)
        .write.partitionBy("p_date")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(target)
      fs.delete(staging, true)
      ()
    }
  }

  /** Retention/expiry sweep: DELETE the rows matching `pred` from the
    * date-partitioned table at `target`, emitting `change_type='delete'`
    * rows (with their old_ images) to the changelog — the path an LWW
    * upsert can never produce (it only inserts/updates), completing the
    * CDC contract end-to-end: a consumer applying the changelog
    * ([[graft.operators.Cdc.applyChangelog]]) drops the retired keys.
    *
    * Shape at scale: the touched-day set is collected from a
    * PARTITION-PRUNED scan of `pred`'s matches (for a retention rule on
    * the date this prunes to the expiring tail, not the table), only
    * those days are read and rewritten, and a day left EMPTY by the
    * delete has its partition directory removed outright — dynamic
    * overwrite alone would leave the old files in place, silently
    * resurrecting the deleted rows. Cost is O(touched days); the same
    * staging hop + re-run crash recovery as the merge (re-running the
    * sweep after a partial swap deletes the same rows again and re-emits
    * nothing new to the changelog only if the caller re-stamps the same
    * batch id — the changelog write precedes the swap, so a crash
    * between them re-emits on retry: at-least-once, like the merge).
    */
  def deleteWhere(spark: SparkSession, target: String, pred: Column,
      keys: Seq[String], dateCol: String = "date",
      changelog: Option[String] = None,
      changelogBatchId: Long = 0L): Unit = {
    val full = spark.read.option("mergeSchema", "true").parquet(target)
    // bounded driver list: touched days only (a retention sweep touches
    // the expiring tail of the layout, the same list any planner holds)
    val touched = full.where(pred).select(col("p_date")).distinct()
      .collect().map(_.getDate(0)).toSeq
    if (touched.isEmpty) return
    val existing = full.where(col("p_date").isin(touched: _*))
    // SQL DELETE semantics: a row is deleted only where pred is TRUE; a
    // NULL-valued predicate keeps the row (bare `!pred` would drop it)
    val survivors = existing.where(!coalesce(pred, lit(false)))
    val staging = new org.apache.hadoop.fs.Path(target + "__staging")
    val hPath = new org.apache.hadoop.fs.Path(target)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    survivors.repartition(col("p_date"))
      .write.mode("overwrite").parquet(staging.toString)
    // explicit schema: a sweep that empties every touched day stages ZERO
    // part files, and a schema-inferred read of that dir would throw
    val staged = spark.read.schema(survivors.schema).parquet(staging.toString)
    changelog.foreach { cl =>
      val values = existing.columns.toIndexedSeq
        .filterNot(c => keys.contains(c) || c == "p_date")
      writeChangelog(cl,
        graft.operators.Cdc.snapshotDiff(existing, staged, keys, values),
        changelogBatchId, dateCol = Some(dateCol))
    }
    // swap: surviving days via dynamic overwrite; fully-emptied days by
    // removing the partition directory (nothing staged to overwrite them)
    val stagedDays = staged.select(col("p_date")).distinct()
      .collect().map(_.getDate(0)).toSet
    if (stagedDays.nonEmpty)
      staged.write.partitionBy("p_date")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(target)
    touched.filterNot(stagedDays).foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(hPath, s"p_date=$d"), true); ()
    }
    fs.delete(staging, true)
    ()
  }
}
