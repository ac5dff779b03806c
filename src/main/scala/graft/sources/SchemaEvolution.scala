package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Schema-EVOLVED feed ingestion: a year of accumulated feed drops rarely
  * shares one parquet schema — early generations lack columns that later
  * ones added. The engine must read the whole history as ONE relation
  * with nulls where a generation predates a column, without rewriting
  * old files.
  *
  * Spark-native path: `spark.read.option("mergeSchema", true)` merges the
  * generations' footers at planning time and fills missing columns with
  * null — the declarative equivalent of a `unionByName(allowMissingColumns
  * = true)` over per-generation reads, but planned as a single
  * FileSourceScan so filter pushdown and column pruning still apply
  * across every generation.
  *
  * Shape at 100 TB: footer merging costs one footer read per FILE, so it
  * is paid at planning, not per row — fine for the 10^3..10^4 files of a
  * long-lived feed. (For 10^6-file lakes the production move is a table
  * format that tracks schema history in metadata; the read semantics this
  * operator pins — add-column evolution, null backfill — are exactly what
  * those formats implement.)
  */
object SchemaEvolution {

  private val genPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Three document-feed generations written with genuinely different
    * parquet schemas (gen1: doc_id+lang; gen2 adds source; gen3 adds
    * n_chars), memoized per sf dir. Deterministic doc_id % 3 assignment
    * so the oracle can recompute membership.
    */
  def generationsDir(s: SparkSession, dir: String): String =
    genPaths.computeIfAbsent(dir, _ => {
      val p = graft.util.Scratch.dir("graft_schema_evo").toString
      val base = Tables.documents(s, dir)
      base.where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$p/gen1")
      base.where(col("doc_id") % 3 === 1)
        .select(col("doc_id"), col("lang"), col("source"))
        .write.mode("overwrite").parquet(s"$p/gen2")
      base.where(col("doc_id") % 3 === 2)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$p/gen3")
      p
    })

  /** The full evolved history as one relation: later-generation columns
    * are null for rows written before the column existed.
    */
  def evolvedDocsRead(s: SparkSession, dir: String): DataFrame = {
    val root = generationsDir(s, dir)
    s.read.option("mergeSchema", "true")
      .parquet(s"$root/gen1", s"$root/gen2", s"$root/gen3")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }
}
