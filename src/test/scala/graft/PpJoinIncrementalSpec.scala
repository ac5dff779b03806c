package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.text.PpJoin

/** Mechanism-level checks of the incremental lossless similarity-join
  * index: batch-split equivalence against the one-shot PPJoin (a
  * DIFFERENT batching than the replay gate's round-robin split — the
  * invariance is over any partition of the corpus into batches, because
  * each J ≥ t pair is generated exactly in the batch where its later
  * member arrives), and batchId idempotence (foreachBatch is
  * at-least-once; a re-delivered epoch must not re-emit its pairs).
  */
class PpJoinIncrementalSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def pairMap(df: DataFrame) = df.collect().map { r =>
    (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
  }.toMap

  test("index maintained over doc_id-split batches equals the one-shot join") {
    // explicit file: URI — the index dir contract is the Hadoop FS API
    val index = "file:" +
      graft.util.Scratch.dir("ppjinc_spec").resolve("idx").toString
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // 3 uneven batches split by doc_id range, unlike the replay's
    // round-robin split — same converged pair set either way
    Seq(docs.where(col("doc_id") < 120),
      docs.where(col("doc_id") >= 120 && col("doc_id") < 300),
      docs.where(col("doc_id") >= 300))
      .foreach(b => PpJoin.appendJaccardIndexBatch(spark, index, b, dir))
    val incremental = pairMap(PpJoin.jaccardPairsFromIndex(spark, index))
    val oneShot = pairMap(PpJoin.pairs(spark, dir))
    assert(incremental == oneShot)
    assert(incremental.nonEmpty) // the fixture must actually have pairs
  }

  test("postings probe is partition-pruned to the batch's token buckets") {
    val index = graft.util.Scratch.dir("ppjinc_plan").resolve("idx").toString
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    PpJoin.appendJaccardIndexBatch(spark, index,
      docs.where(col("doc_id") < 200), dir, batchId = Some(0L))
    // the maintained layout IS bucket-partitioned directories
    val bucketDirs = new java.io.File(s"$index/postings").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty, "postings not partitioned by bucket")
    // and the pruned read resolves to a planning-time PartitionFilter —
    // a batch never opens buckets its prefix tokens do not hash into
    val plan = PpJoin.postingsPruned(spark, index, Array(3, 7))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters", 2)(1).takeWhile(_ != ']')
        .contains("bucket"),
      s"bucket filter did not become a partition filter:\n$plan")
    assert(!plan.contains("PushedFilters: [In(bucket"),
      s"bucket filter pushed as a DATA filter (scan not pruned):\n$plan")
  }

  test("containment index over doc_id-split batches equals the one-shot join") {
    val index = "file:" +
      graft.util.Scratch.dir("ctinc_spec").resolve("idx").toString
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // the ORDERED-pair twin: roles are directional, so the both-ways
    // batch probe (batch-as-contained vs all, existing-as-contained vs
    // batch) is what this asserts — a missed direction loses pairs
    Seq(docs.where(col("doc_id") < 120),
      docs.where(col("doc_id") >= 120 && col("doc_id") < 300),
      docs.where(col("doc_id") >= 300))
      .foreach(b => PpJoin.appendContainmentIndexBatch(spark, index, b, dir))
    val incremental = pairMap(PpJoin.containmentFromIndex(spark, index))
    val oneShot = pairMap(PpJoin.containment(spark, dir))
    assert(incremental == oneShot)
    assert(incremental.nonEmpty)
  }

  test("duplicated postings (crash-window replay) cannot change the converged pairs") {
    // the value-idempotence argument behind the plain partitioned
    // postings append, exercised end-to-end: duplicate every admitted
    // posting row mid-stream (what a crash between postings write and
    // marker creation leaves behind), then admit another batch — the
    // duplicates only duplicate candidate generation, which the verify
    // tail's distinct collapses
    val index = graft.util.Scratch.dir("ppjinc_dup").resolve("idx").toString
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    PpJoin.appendJaccardIndexBatch(spark, index,
      docs.where(col("doc_id") < 150), dir, batchId = Some(0L))
    PpJoin.appendJaccardIndexBatch(spark, index,
      docs.where(col("doc_id") >= 150 && col("doc_id") < 300), dir,
      batchId = Some(1L))
    // localCheckpoint breaks lineage from the source files so the
    // append does not read the directory it is writing into
    val posts = spark.read.parquet(s"$index/postings").localCheckpoint()
    posts.write.mode("append").partitionBy("bucket")
      .parquet(s"$index/postings")
    PpJoin.appendJaccardIndexBatch(spark, index,
      docs.where(col("doc_id") >= 300), dir, batchId = Some(2L))
    assert(pairMap(PpJoin.jaccardPairsFromIndex(spark, index)) ==
      pairMap(PpJoin.pairs(spark, dir)))
  }

  test("seeded random batchings converge to the same one-shot pair set") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val oneShot = pairMap(PpJoin.pairs(spark, dir))
    // two deterministic 4-way splits by md5(doc_id, seed) — arbitrary
    // interleavings, unlike the range split above and the replay's
    // round-robin; the later-member-arrival rule must hold for ANY
    // partition of the corpus into batches
    for (seed <- Seq("s1", "s2")) {
      val index = graft.util.Scratch.dir(s"ppjinc_rand_$seed")
        .resolve("idx").toString
      val part = pmod(conv(substring(md5(
        concat_ws("|", col("doc_id"), lit(seed))), 1, 6), 16, 10)
        .cast("long"), lit(4))
      (0 until 4).foreach { k =>
        PpJoin.appendJaccardIndexBatch(spark, index,
          docs.where(part === k), dir)
      }
      assert(pairMap(PpJoin.jaccardPairsFromIndex(spark, index)) == oneShot,
        s"random batching $seed diverged from the one-shot join")
    }
  }

  test("re-delivered batchId is a no-op (foreachBatch at-least-once)") {
    val index =
      graft.util.Scratch.dir("ppjinc_idem").resolve("idx").toString
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    PpJoin.appendJaccardIndexBatch(spark, index,
      docs.where(col("doc_id") < 300), dir, batchId = Some(0L))
    val once = pairMap(PpJoin.jaccardPairsFromIndex(spark, index))
    // sink restart re-delivers epoch 0: must not duplicate pair rows or
    // member rows (a double member append would double-generate every
    // later cross-batch candidate too)
    PpJoin.appendJaccardIndexBatch(spark, index,
      docs.where(col("doc_id") < 300), dir, batchId = Some(0L))
    assert(pairMap(PpJoin.jaccardPairsFromIndex(spark, index)) == once)
    PpJoin.appendJaccardIndexBatch(spark, index,
      docs.where(col("doc_id") >= 300), dir, batchId = Some(1L))
    val all = pairMap(PpJoin.jaccardPairsFromIndex(spark, index))
    assert(all == pairMap(PpJoin.pairs(spark, dir)))
  }
}
