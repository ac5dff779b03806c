package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HilbertCode16, MortonCode16}

/** Z-order (Morton) clustering layout: rewrite a table range-partitioned
  * by the interleaved bit code of two columns, so every output file has
  * a tight min/max envelope on BOTH dimensions. Parquet readers skip
  * files (and row groups) whose column statistics exclude a predicate;
  * a single-column sort only narrows that envelope for its own column —
  * Z-order is the layout that makes `WHERE user_id = ? AND ts BETWEEN …`
  * skip on both at once. Layout maintenance, like Compaction: rows are
  * untouched (the gate hash-checks identity), the value is where they
  * land.
  *
  * Each dimension is rank-normalized to 16 bits with a min-max affine
  * map (one broadcast 1-row aggregate — no per-dimension global sort;
  * rank skew only degrades the envelope, never correctness). The write
  * is `repartitionByRange` on the code — the one global sort any
  * clustering layout fundamentally needs — into `nFiles` output files.
  */
object ZOrder {

  private def rank16(v: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0L)).otherwise(
      ((v.cast("double") - lo.cast("double"))
        / (hi.cast("double") - lo.cast("double")) * lit(65535.0))
        .cast("long"))

  /** The Morton sort key for two numeric columns given their min/max. */
  def mortonKey(a: Column, aMin: Column, aMax: Column,
      b: Column, bMin: Column, bMax: Column): Column =
    MortonCode16(rank16(a, aMin, aMax), rank16(b, bMin, bMax))

  /** The Hilbert sort key — same rank normalization, tighter locality:
    * consecutive codes are always grid neighbors, so range partitions
    * get strictly tighter worst-case envelopes than the Z-curve's
    * boundary jumps allow.
    */
  def hilbertKey(a: Column, aMin: Column, aMax: Column,
      b: Column, bMin: Column, bMax: Column): Column =
    HilbertCode16(rank16(a, aMin, aMax), rank16(b, bMin, bMax))

  /** Rewrite `df` z-ordered by (`c1`, `c2`) at `path`. Returns the
    * written row count.
    *
    * The output file count is DATA-SIZED: ceil(rows / targetRowsPerFile)
    * unless `nFiles` pins it explicitly. A constant count is a scale
    * trap both ways — at 100× the data each file is 100× oversized
    * (row-group pruning degrades to file-sized granularity), and on a
    * tiny table it splinters into skew-prone slivers. The extra count()
    * is footer-metadata-only on a parquet-backed input, negligible next
    * to the rewrite itself.
    */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
      targetRowsPerFile: Long = 1000000L,
      nFiles: Option[Int] = None): Long =
    writeClustered(df, c1, c2, path, mortonKey, targetRowsPerFile, nFiles)

  /** Rewrite `df` HILBERT-clustered by (`c1`, `c2`) at `path`. */
  def writeHilbertOrdered(df: DataFrame, c1: String, c2: String,
      path: String, targetRowsPerFile: Long = 1000000L,
      nFiles: Option[Int] = None): Long =
    writeClustered(df, c1, c2, path, hilbertKey, targetRowsPerFile, nFiles)

  private def writeClustered(df: DataFrame, c1: String, c2: String,
      path: String,
      keyOf: (Column, Column, Column, Column, Column, Column) => Column,
      targetRowsPerFile: Long,
      nFiles: Option[Int]): Long = {
    val files = nFiles.getOrElse(
      math.max(1L, (df.count() + targetRowsPerFile - 1) / targetRowsPerFile)
        .min(Int.MaxValue).toInt)
    val bounds = df.agg(
      min(col(c1)).as("min1"), max(col(c1)).as("max1"),
      min(col(c2)).as("min2"), max(col(c2)).as("max2"))
    val keyed = df.crossJoin(broadcast(bounds))
      .withColumn("__z", keyOf(col(c1), col("min1"), col("max1"),
        col(c2), col("min2"), col("max2")))
      .drop("min1", "max1", "min2", "max2")
    keyed.repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z")) // tight row-group envelopes too
      .drop("__z")
      .write.mode("overwrite")
      // belt for range skew (heavy duplicate __z values): even if a range
      // partition lands fat, no single file exceeds the target
      .option("maxRecordsPerFile", targetRowsPerFile.toString)
      .parquet(path)
    df.sparkSession.read.parquet(path).count()
  }
}
