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
    val (kept, added) = fileDiff(spark, path, stats)
    if (added.isEmpty) kept
    else kept.unionByName(statsOf(spark.read.parquet(added: _*), cols))
  }

  /** The index-vs-disk file diff shared by every index refresh: the
    * surviving index rows (semi-joined, never an In-literal) and the
    * unindexed on-disk files still to scan.
    */
  private def fileDiff(spark: SparkSession, path: String,
      index: DataFrame): (DataFrame, Seq[String]) = {
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
    val indexed = index.select(col("file")).collect().map(_.getString(0))
    val indexedNorm = indexed.map(norm).toSet
    val added = onDisk.toSeq.filterNot(f => indexedNorm.contains(norm(f))).sorted
    val keptFiles = indexed.filter(f => onDiskNorm.contains(norm(f))).toSeq
    // survivors via LEFT SEMI join against a small file-name relation —
    // an `isin(keptFiles)` literal would embed every surviving path in
    // the plan (a multi-MB In-expression at the advertised 10^5-file
    // scale); the semi-join keeps the plan O(1) and broadcasts the list
    import spark.implicits._
    val kept = index.join(broadcast(keptFiles.toDF("file")),
      Seq("file"), "left_semi")
    (kept, added)
  }

  /** Files whose [min,max] envelope intersects [lo, hi] on `c` —
    * i.e. NOT (max < lo OR min > hi). Null-envelope files (all-null
    * column) cannot satisfy a range predicate and are skipped.
    */
  def candidateFiles(stats: DataFrame, c: String,
      lo: Any, hi: Any): Seq[String] =
    stats.where(!(col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi)))
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Per-file BLOOM membership index — the POINT-lookup complement to
    * the min/max envelope. On a hash-clustered or unordered layout the
    * range envelope of every file spans the whole key domain and
    * [[candidateFiles]] prunes nothing; a Bloom index answers "can this
    * file contain THIS key?" regardless of layout order (the Delta/
    * Iceberg bloom-index trick). k hash probes per row via Spark's
    * seeded multi-arg xxhash64 chain (`xxhash64(seed, v)` — the same
    * family the Count-Min cells use), positions stored as a SORTED
    * DISTINCT array per file (the sparse form of the m-bit bitmap:
    * ≤ min(k·distinct, m) ints, saturating at m). One-sided by
    * construction: a file containing v has all k of v's positions, so a
    * miss is definitive; a spurious hit just reads one extra file.
    *
    * Build shape: one scan, k-way position fan-out, then a per-file
    * collect_set whose partial state is bounded by m — map-side
    * combinable, never larger than 4096 ints per file however many rows.
    */
  def buildBloom(spark: SparkSession, path: String, c: String,
      mBits: Int = 4096, k: Int = 3): DataFrame =
    bloomOf(spark.read.parquet(path), c, mBits, k)

  private def bloomOf(df: DataFrame, c: String, mBits: Int,
      k: Int): DataFrame = {
    val probes = array((0 until k).map(s =>
      pmod(xxhash64(lit(s), col(c)), lit(mBits.toLong))): _*)
    df.select(input_file_name().as("file"), explode(probes).as("p"))
      .groupBy(col("file"))
      .agg(sort_array(collect_set(col("p"))).as("bloom"))
  }

  /** Incremental Bloom-index refresh — [[refreshStats]]' discipline for
    * the membership index: scan ONLY files missing from the index,
    * append their position sets, drop rows for deleted files. A file's
    * bloom is immutable once written (parquet files never mutate), so
    * O(changed files) per refresh is exact, not approximate.
    */
  def refreshBloom(spark: SparkSession, path: String, bloom: DataFrame,
      c: String, mBits: Int = 4096, k: Int = 3): DataFrame = {
    val (kept, added) = fileDiff(spark, path, bloom)
    if (added.isEmpty) kept
    else kept.unionByName(
      bloomOf(spark.read.parquet(added: _*), c, mBits, k))
  }

  /** Files that may contain `v` on the indexed column: every one of the
    * k probe positions must be set. `v` MUST carry the indexed column's
    * exact dtype (xxhash64 is type-sensitive — probing an int literal
    * against a long column would miss everything); the probe positions
    * are computed through the engine itself (a 1-row plan) so the hash
    * chain can never drift from the build side.
    */
  def bloomCandidateFiles(spark: SparkSession, bloom: DataFrame,
      v: org.apache.spark.sql.Column, mBits: Int = 4096,
      k: Int = 3): Seq[String] = {
    val pos = spark.range(1).select(array((0 until k).map(s =>
      pmod(xxhash64(lit(s), v), lit(mBits.toLong))): _*).as("ps"))
      .head().getSeq[Long](0)
    bloom.where(pos.map(p => array_contains(col("bloom"), p))
        .reduce(_ && _))
      .select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** Point lookup through the Bloom index: read only the files whose
    * bloom admits the key, then apply the exact equality (pushed into
    * the parquet reader). Same rows as the full-table filter by the
    * one-sided-error contract.
    */
  def prunedPointScan(spark: SparkSession, path: String, bloom: DataFrame,
      c: String, v: org.apache.spark.sql.Column, mBits: Int = 4096,
      k: Int = 3): DataFrame = {
    val files = bloomCandidateFiles(spark, bloom, v, mBits, k)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.where(col(c) === v)
  }

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
