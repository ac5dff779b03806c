package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Crash-safe per-batch parquet append for the LSM-maintenance family.
  *
  * A plain `mode("append")` under a batch marker has one unsound
  * window: parquet job commit moves task files into the destination one
  * by one, so a crash MID-COMMIT can leave a visible subset of the
  * batch's files — and because the marker was never created, the
  * retried batch appends the FULL batch again, double-counting the
  * subset (fatal for additive partials: token counts, line dfs, CMS
  * cells, index rows; the value-idempotent partials — KMV min-hashes,
  * HLL rho maxima, Bloom bit_or words — are immune and keep plain
  * append).
  *
  * The fix keeps readers untouched (they still see one flat directory
  * of parquet files): the batch writes to a dot-prefixed staging dir
  * (invisible to Spark readers), any leftovers of a crashed earlier
  * attempt of THIS batch are deleted, and the staged files are renamed
  * in under deterministic batch-prefixed names. Every step is
  * idempotent under retry: re-delivery first clears `b{id}-*`, so the
  * destination ends up with exactly one copy of the batch no matter
  * where a previous attempt died.
  */
object BatchAppend {

  def append(df: DataFrame, destDir: String, batchId: Option[Long]): Unit =
    batchId match {
      case None => df.write.mode("append").parquet(destDir)
      case Some(bid) =>
        val conf = df.sparkSession.sessionState.newHadoopConf()
        val dest = new Path(destDir)
        val fs = dest.getFileSystem(conf)
        val staging = new Path(destDir, s".staging-b$bid")
        df.write.mode("overwrite").parquet(staging.toString)
        fs.mkdirs(dest)
        Option(fs.globStatus(new Path(dest, s"b$bid-*")))
          .getOrElse(Array.empty)
          .foreach(st => fs.delete(st.getPath, false))
        val parts = fs.listStatus(staging)
          .filter(_.getPath.getName.startsWith("part-"))
          .sortBy(_.getPath.getName)
        parts.zipWithIndex.foreach { case (st, i) =>
          fs.rename(st.getPath, new Path(dest, s"b$bid-$i.parquet"))
          ()
        }
        fs.delete(staging, true)
        ()
    }
}
