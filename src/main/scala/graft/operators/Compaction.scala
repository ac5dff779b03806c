package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for a date-partitioned parquet table: rewrite
  * each partition's file sprawl into ~`maxRecordsPerFile`-bounded files
  * without changing a single row. Streaming ingest (one merge per
  * micro-batch) and repeated dynamic overwrites accrete files; at
  * warehouse scale unbounded file counts degrade planning (listing,
  * footer reads) and scan parallelism long before data size does —
  * periodic compaction is the standard maintenance job.
  *
  * Shape: one shuffle keyed by partition date (each day's rows gather on
  * one task group), then the writer's `maxRecordsPerFile` splits days
  * larger than the bound into multiple files. Rewrites go through the
  * same dynamic-overwrite path as the merge — only listed partitions are
  * replaced, and the operation is idempotent (re-compacting a compacted
  * table is a no-op on content).
  */
object Compaction {

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
    // repaired by compacting again)
    df.repartition(col("p_date"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .parquet(staging)
    val staged = spark.read.parquet(staging)
    val n = staged.count()
    // re-shuffle by day on the final write too: otherwise the staging
    // read's task layout (file boundaries, row-group splits) leaks into
    // the output file count — with one writer task per day the layout is
    // the canonical ceil(rows/maxRecordsPerFile) files per partition
    staged.repartition(col("p_date"))
      .write.partitionBy("p_date")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .mode("overwrite").parquet(path)
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    n
  }
}
