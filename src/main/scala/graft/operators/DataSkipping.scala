package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping index: per-file min/max column statistics
  * plus a scan planner that reads ONLY the files whose stat envelope can
  * intersect the query predicate — the table-format trick (Delta/Iceberg
  * style) that turns a clustered layout (sorted, Z-ordered, partitioned)
  * into actual I/O savings. Parquet row-group pruning already skips
  * WITHIN a file once it is opened; file-level stats skip the footer
  * read and task scheduling entirely, which at 100 TB (10^5 files) is
  * the difference between planning thousands of tasks and a handful.
  *
  * The index is tiny — one row per (file, column) envelope — and is
  * itself just a DataFrame, so it composes: persist it next to the
  * table, rebuild it incrementally for touched files after a merge, or
  * recompute in one cheap scan (map-side-combined min/max per file).
  *
  * Pruning is driver-side over the index relation: a bounded collect of
  * matching file NAMES (≤ the table's file count — the same list any
  * table format hands its planner), never of data rows.
  */
object DataSkipping {

  /** One scan builds the whole index: group by the file each row came
    * from, min/max the indexed columns. The aggregation combines
    * map-side (each task sees whole files, so a file's envelope usually
    * reduces locally to ONE partial row per column).
    */
  def buildStats(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame =
    statsOf(spark.read.parquet(path), cols)

  /** The per-file envelope aggregation — ONE definition, so the index
    * schema cannot drift between the full build and the incremental
    * refresh.
    */
  private def statsOf(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)

  /** Incremental index refresh after the table changed (a merge appended
    * or rewrote files): scan ONLY the files missing from the index and
    * append their envelopes; drop index rows whose files are gone.
    * O(changed files) — the full-corpus rebuild never recurs, which is
    * the difference between "stats index" and "stats I can't afford to
    * keep" at 10^5 files. The file-list diff is driver-side over file
    * NAMES (the same bounded list any table format's planner holds).
    */
  def refreshStats(spark: SparkSession, path: String, stats: DataFrame,
      cols: Seq[String]): DataFrame = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sessionState.newHadoopConf())
    // compare on the scheme-less path: input_file_name() renders
    // "file:///x" while Hadoop's Path.toUri renders "file:/x"
    def norm(uri: String) = new java.net.URI(uri).getPath
    // RECURSIVE listing: a partitioned table (the layout the merge
    // writes) keeps its files under partition dirs — a flat listStatus
    // would see no files, mark every indexed file deleted, and hand the
    // planner an empty index (= zero-row scans)
    val it = fs.listFiles(hadoopPath, true)
    val onDisk = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        onDisk += f.getPath.toUri.toString
    }
    val onDiskNorm = onDisk.map(norm).toSet
    val indexed = stats.select(col("file")).collect().map(_.getString(0))
    val indexedNorm = indexed.map(norm).toSet
    val added = onDisk.toSeq.filterNot(f => indexedNorm.contains(norm(f))).sorted
    val keptFiles = indexed.filter(f => onDiskNorm.contains(norm(f))).toSeq
    // survivors via LEFT SEMI join against a small file-name relation —
    // an `isin(keptFiles)` literal would embed every surviving path in
    // the plan (a multi-MB In-expression at the advertised 10^5-file
    // scale); the semi-join keeps the plan O(1) and broadcasts the list
    import spark.implicits._
    val kept = stats.join(broadcast(keptFiles.toDF("file")),
      Seq("file"), "left_semi")
    if (added.isEmpty) kept
    else kept.unionByName(statsOf(spark.read.parquet(added: _*), cols))
  }

  /** Files whose [min,max] envelope intersects [lo, hi] on `c` —
    * i.e. NOT (max < lo OR min > hi). Null-envelope files (all-null
    * column) cannot satisfy a range predicate and are skipped.
    */
  def candidateFiles(stats: DataFrame, c: String,
      lo: Any, hi: Any): Seq[String] =
    stats.where(!(col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi)))
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Range scan through the index: read only the candidate files, then
    * apply the exact predicate (stats prune at file granularity; the
    * residual filter — itself pushed into the parquet reader — does the
    * row-exact cut). Returns the same rows as a full-table filter, by
    * construction: a file outside the envelope cannot contain a
    * qualifying row.
    */
  def prunedRangeScan(spark: SparkSession, path: String, stats: DataFrame,
      c: String, lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(stats, c, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.where(col(c) >= lit(lo) && col(c) <= lit(hi))
  }
}
