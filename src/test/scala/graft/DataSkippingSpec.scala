package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.DataSkipping

/** The two halves of the data-skipping contract: the pruned scan returns
  * exactly the full-table filter's rows, AND the index actually skips
  * files on a clustered layout (otherwise it's a no-op with extra steps).
  */
class DataSkippingSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def layout(): (String, org.apache.spark.sql.DataFrame) = {
    val path = graft.util.Scratch.dir("skip_spec").resolve("ev").toString
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .repartitionByRange(8, col("user_id"))
      .write.mode("overwrite").parquet(path)
    (path, DataSkipping.buildStats(spark, path, Seq("user_id")))
  }

  test("stats index has one row per file and covers every row") {
    val (path, stats) = layout()
    val nFiles = spark.read.parquet(path)
      .select(input_file_name()).distinct().count()
    assert(stats.count() == nFiles)
    assert(stats.agg(sum("n_rows")).head.getLong(0) ==
      spark.read.parquet(path).count())
  }

  test("pruned range scan equals the full filter and skips files") {
    val (path, stats) = layout()
    val total = stats.count()
    // a range in the middle of the key space: on a range-clustered
    // 8-file layout it must hit a strict subset of files
    val candidates = DataSkipping.candidateFiles(stats, "user_id", 10L, 19L)
    assert(candidates.nonEmpty && candidates.size < total,
      s"expected pruning: ${candidates.size} of $total files")
    val pruned = DataSkipping
      .prunedRangeScan(spark, path, stats, "user_id", 10L, 19L)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val full = spark.read.parquet(path)
      .where(col("user_id").between(10L, 19L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(pruned.nonEmpty && pruned.sameElements(full))
  }

  test("out-of-range predicate prunes everything and returns empty") {
    val (path, stats) = layout()
    assert(DataSkipping.candidateFiles(stats, "user_id", 100000L, 200000L).isEmpty)
    assert(DataSkipping
      .prunedRangeScan(spark, path, stats, "user_id", 100000L, 200000L)
      .count() == 0L)
  }

  test("incremental refresh equals a full rebuild after appends and rewrites") {
    import spark.implicits._
    val (path, stats0) = layout()
    // a no-op refresh returns the index unchanged (no files scanned)
    val same = DataSkipping.refreshStats(spark, path, stats0, Seq("user_id"))
    assert(same.orderBy("file").collect().toSeq ==
      stats0.orderBy("file").collect().toSeq)
    // survivors are kept via a semi-join, NOT an In-literal embedding
    // every surviving part-file path in the plan (a plan-size bomb at
    // the 10^5-file scale the index is built for)
    assert(!same.queryExecution.optimizedPlan.toString.contains("part-0"))
    // append new files to the table, then refresh
    Seq((900001L, 900L, 1.0), (900002L, 901L, 2.0))
      .toDF("event_id", "user_id", "value")
      .repartition(2).write.mode("append").parquet(path)
    val refreshed = DataSkipping.refreshStats(spark, path, stats0, Seq("user_id"))
    val rebuilt = DataSkipping.buildStats(spark, path, Seq("user_id"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (new java.net.URI(r.getString(0)).getPath, r.getLong(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(canon(refreshed) == canon(rebuilt))
    // the refreshed index plans correctly over the appended key range
    val hits = DataSkipping
      .prunedRangeScan(spark, path, refreshed, "user_id", 900L, 901L)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(hits.toSeq == Seq(900001L, 900002L))
  }

  test("refresh works on a PARTITIONED table (files live under partition dirs)") {
    import spark.implicits._
    val path = graft.util.Scratch.dir("skip_spec_part").resolve("ev").toString
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        to_date(col("ts")).as("p_date"))
      .write.partitionBy("p_date").mode("overwrite").parquet(path)
    val stats = DataSkipping.buildStats(spark, path, Seq("user_id"))
    assert(stats.count() > 0)
    // a flat listing would see only partition DIRS, mark every indexed
    // file deleted, and return an empty index
    val refreshed = DataSkipping.refreshStats(spark, path, stats, Seq("user_id"))
    assert(refreshed.count() == stats.count())
    assert(refreshed.agg(sum("n_rows")).head.getLong(0) ==
      spark.read.parquet(path).count())
  }

  test("bloom: point lookup prunes a hash layout where min/max cannot, rows exact") {
    // hash-clustered on user_id: every file's [min,max] spans the whole
    // key domain (range skipping is useless — proven below) but each KEY
    // lives in exactly one file, the bloom index's home turf
    val path = graft.util.Scratch.dir("skip_spec_bloom").resolve("ev").toString
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .repartition(8, col("user_id"))
      .write.mode("overwrite").parquet(path)
    val bloom = DataSkipping.buildBloom(spark, path, "user_id")
    val total = bloom.count()
    // probe a key that exists (the smallest), typed as the column is;
    // at fixture scale (~15 keys over 8 files) the min/max envelopes
    // are narrow enough to prune too — the full-domain-envelope
    // contrast only materializes with many keys per file, so the spec
    // pins only the bloom contract itself
    val key = spark.read.parquet(path).agg(min("user_id")).head.getLong(0)
    val candidates = DataSkipping.bloomCandidateFiles(spark, bloom, lit(key))
    assert(candidates.nonEmpty && candidates.size < total,
      s"expected bloom pruning: ${candidates.size} of $total files")
    val pruned = DataSkipping
      .prunedPointScan(spark, path, bloom, "user_id", lit(key))
      .select("event_id").collect().map(_.getLong(0)).sorted
    val full = spark.read.parquet(path).where(col("user_id") === key)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(pruned.nonEmpty && pruned.sameElements(full))
  }

  test("bloom: negatives are definitive (absent key prunes everything)") {
    val path = graft.util.Scratch.dir("skip_spec_bloom_neg").resolve("ev").toString
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .repartition(4, col("user_id"))
      .write.mode("overwrite").parquet(path)
    val bloom = DataSkipping.buildBloom(spark, path, "user_id")
    // a key far outside the domain: k probe positions all-set in some
    // file is possible but vanishingly unlikely at this fill factor;
    // the CONTRACT under test is row-exactness either way
    assert(DataSkipping
      .prunedPointScan(spark, path, bloom, "user_id", lit(987654321L))
      .count() == 0L)
    // every PRESENT key must be admitted by at least one file (no false
    // negatives — the one-sided error direction that makes pruning safe)
    val keys = spark.read.parquet(path).select("user_id").distinct()
      .collect().map(_.getLong(0)).take(20)
    keys.foreach { k =>
      assert(DataSkipping.bloomCandidateFiles(spark, bloom, lit(k)).nonEmpty,
        s"present key $k must have a candidate file")
    }
  }

  test("bloom refresh equals a full rebuild after appends, O(changed files)") {
    import spark.implicits._
    val path = graft.util.Scratch.dir("skip_spec_bloom_inc").resolve("ev").toString
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .repartition(4, col("user_id"))
      .write.mode("overwrite").parquet(path)
    val bloom0 = DataSkipping.buildBloom(spark, path, "user_id")
    // a no-op refresh returns the index unchanged
    val same = DataSkipping.refreshBloom(spark, path, bloom0, "user_id")
    assert(same.orderBy("file").collect().toSeq ==
      bloom0.orderBy("file").collect().toSeq)
    // append a new key in new files, refresh, and find it through the
    // refreshed index
    Seq((900001L, 777000L, 1.0), (900002L, 777000L, 2.0))
      .toDF("event_id", "user_id", "value")
      .repartition(1).write.mode("append").parquet(path)
    val refreshed = DataSkipping.refreshBloom(spark, path, bloom0, "user_id")
    val rebuilt = DataSkipping.buildBloom(spark, path, "user_id")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (new java.net.URI(r.getString(0)).getPath,
        r.getSeq[Long](1))).sortBy(_._1).toSeq
    assert(canon(refreshed) == canon(rebuilt))
    val hits = DataSkipping
      .prunedPointScan(spark, path, refreshed, "user_id", lit(777000L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(hits.toSeq == Seq(900001L, 900002L))
  }

  test("unclustered layout degrades to reading everything, never to wrong rows") {
    // round-robin layout: every file spans the whole key range, so the
    // index cannot prune — but correctness must hold regardless
    val path = graft.util.Scratch.dir("skip_spec_rr").resolve("ev").toString
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .repartition(8)
      .write.mode("overwrite").parquet(path)
    val stats = DataSkipping.buildStats(spark, path, Seq("user_id"))
    val pruned = DataSkipping
      .prunedRangeScan(spark, path, stats, "user_id", 10L, 19L)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val full = spark.read.parquet(path)
      .where(col("user_id").between(10L, 19L))
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(pruned.sameElements(full))
  }
}
