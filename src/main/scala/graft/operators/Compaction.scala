package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction for a date-partitioned parquet table: rewrite
  * each partition's file sprawl into ~`maxRecordsPerFile`-bounded files
  * without changing a single row. Streaming ingest (one merge per
  * micro-batch) and repeated dynamic overwrites accrete files; at
  * warehouse scale unbounded file counts degrade planning (listing,
  * footer reads) and scan parallelism long before data size does —
  * periodic compaction is the standard maintenance job.
  *
  * Shape: rows are assigned an EXACT within-day shard of
  * `maxRecordsPerFile` rows (distributed two-pass prefix sum, same
  * technique as Curation.packSequences) and shuffled by (day, shard) —
  * a hot day is written by ceil(day_rows/maxRecordsPerFile) tasks in
  * parallel instead of one straggler task buffering the whole day. The
  * per-day FILE COUNT is the canonical ceil(day_rows/maxRecordsPerFile):
  * each task's day-rows total k·maxRecordsPerFile plus at most one
  * remainder, so the writer's record bound emits exactly the ceil count
  * (when two shards share a task their rows interleave, so files are not
  * shard-pure — only the count is canonical, which is what compaction is
  * for). Rewrites go through the same dynamic-overwrite path as the
  * merge — only listed partitions are replaced, and the operation is
  * idempotent (re-compacting a compacted table is a no-op on content).
  */
object Compaction {

  /** Shuffle a `p_date`-carrying DataFrame so each day is spread over
    * ceil(day_rows / maxRecordsPerFile) tasks, each holding whole
    * `maxRecordsPerFile`-row shards. The within-day row index is a
    * distributed two-pass prefix sum keyed by the scan partition id —
    * never a `Window.partitionBy(day)` cumsum, which would put a hot
    * day's entire row stream on one task (the straggler this exists to
    * kill):
    *   pass 1: per-(day, scan-partition) counts — a map-side-combined
    *           aggregation to a tiny relation — then an exclusive
    *           running sum per day gives each scan partition's starting
    *           offset within its day;
    *   pass 2: broadcast the offsets back and row_number locally within
    *           each (day, scan-partition) group — parallel across scan
    *           partitions, no window partition ever exceeds a scan
    *           split.
    */
  def shardByDay(df: DataFrame, maxRecordsPerFile: Long): DataFrame = {
    val dataCols = df.columns.toIndexedSeq.map(col)
    // __mid orders rows within a (day, scan-partition) window group; any
    // unique-per-row order works (the shard assignment only needs a
    // bijective index), it just has to be SOME order for row_number
    val withPid = df.withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    val wOff = Window.partitionBy("p_date").orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withPid.groupBy(col("p_date"), col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("p_date"), col("__pid"), col("__off"))
    val wLocal = Window.partitionBy("p_date", "__pid").orderBy("__mid")
    withPid.join(broadcast(offsets), Seq("p_date", "__pid"))
      .withColumn("__shard", floor(
        (col("__off") + row_number().over(wLocal) - 1) / lit(maxRecordsPerFile)))
      .repartition(col("p_date"), col("__shard"))
      .select(dataCols: _*)
  }

  /** Compact `path` (a `p_date`-partitioned table) in place. Returns the
    * compacted row count for verification.
    */
  def compactDatePartitioned(spark: SparkSession, path: String,
      maxRecordsPerFile: Long = 1000000L): Long = {
    val df = spark.read.parquet(path)
    val staging = path + "__compact_staging"
    // the staging hop mirrors MergeOps.mergeIntoDatePartitioned: Spark
    // cannot overwrite its own read source, and the same re-run recovery
    // contract applies (content is unchanged, so a crashed compaction is
    // repaired by compacting again). The staging LAYOUT is discarded by
    // the sharded final write, so the copy is written STRAIGHT from the
    // scan — no repartition: shuffling the whole table to "balance" a
    // layout nobody reads would be the single largest cost of the
    // operator at scale, and the scan's bin-packed splits (≤
    // maxPartitionBytes each, small files coalesced) already yield
    // well-sized staging files at full parallelism.
    df.write.mode("overwrite").parquet(staging)
    val staged = spark.read.parquet(staging)
    val n = staged.count()
    // shard the final write: the canonical ceil(rows/maxRecordsPerFile)
    // files per partition, written by that many parallel tasks on a hot
    // day. shardByDay branches its input twice over nondeterministic
    // spark_partition_id/monotonically_increasing_id, which is safe here
    // ONLY because `staged` is a private immutable parquet dir (both
    // subtree scans see identical splits) — which is why the prefix sum
    // runs on staging rather than on the caller's arbitrary `df` plan.
    shardByDay(staged, maxRecordsPerFile)
      .write.partitionBy("p_date")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite").parquet(path)
    // Verify the DESTRUCTIVE write before dropping the recovery copy: a
    // divergence between shardByDay's two scans would silently drop rows
    // (inner join on __pid) and n — counted from staging — could not see
    // it. The post-write count is footer-metadata-only, near-free.
    val m = spark.read.parquet(path).count()
    require(m == n,
      s"compaction wrote $m rows, expected $n — staging kept at $staging")
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    n
  }
}
