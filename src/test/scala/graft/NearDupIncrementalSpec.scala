package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.text.NearDup

/** Mechanism-level checks of the incremental LSH index: batch-split
  * equivalence against the one-shot operator, and the cap-crossing
  * retraction rule (a bucket that outgrows the cap in a LATER batch must
  * retroactively drop the pairs earlier batches generated for it).
  */
class NearDupIncrementalSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def reportMap(df: DataFrame) = df.collect().map { r =>
    r.getLong(0) -> (r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -2.0 else r.getDouble(3))
  }.toMap

  test("index maintained over doc_id-split batches equals the one-shot report") {
    // explicit file: URI — the index dir contract is the Hadoop FS API,
    // not java.io.File (hdfs/s3a URIs must work the same way)
    val index = "file:" + graft.util.Scratch.dir("ndinc_spec").resolve("idx").toString
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // 4 uneven batches split by doc_id range — a different batching than
    // the replay's round-robin, same converged index
    Seq(docs.where(col("doc_id") < 50),
      docs.where(col("doc_id") >= 50 && col("doc_id") < 280),
      docs.where(col("doc_id") >= 280 && col("doc_id") < 300),
      docs.where(col("doc_id") >= 300))
      .foreach(b => NearDup.applyMinhashIndexBatch(spark, index, b))
    val incremental = reportMap(NearDup.minhashIndexReport(spark, index,
      Tables.documents(spark, dir).select(col("doc_id"))))
    val oneShot = reportMap(NearDup.minhashLsh(spark, dir))
    assert(incremental == oneShot)
  }

  test("a bucket crossing the cap in a later batch retracts its earlier pairs") {
    import spark.implicits._
    val index = graft.util.Scratch.dir("ndinc_cap").resolve("idx").toString
    def docs(ids: Seq[Long]) =
      ids.map(i => (i, "identical text shared by every doc")).toDF("doc_id", "text")
    // batch 1: 3 identical docs — bucket size 3 ≤ cap 4 → pairs exist
    NearDup.applyMinhashIndexBatch(spark, index, docs(Seq(1L, 2L, 3L)), maxBucket = 4)
    val ids = (1L to 5L).toDF("doc_id")
    val mid = NearDup.minhashIndexReport(spark, index, ids.where(col("doc_id") <= 3),
      maxBucket = 4).collect()
    assert(mid.forall(_.getLong(1) == 2L)) // each has the 2 others
    // batch 2: 2 more identical docs — every shared bucket now holds 5 > 4
    NearDup.applyMinhashIndexBatch(spark, index, docs(Seq(4L, 5L)), maxBucket = 4)
    val fin = NearDup.minhashIndexReport(spark, index, ids, maxBucket = 4).collect()
    // the final-size filter retracts EVERYTHING those buckets supported,
    // matching what the one-shot operator would compute over all 5 docs
    assert(fin.forall(r => r.getLong(1) == 0L && r.isNullAt(2)))
  }

  test("re-delivered batchId is a no-op (foreachBatch at-least-once)") {
    import spark.implicits._
    val index = graft.util.Scratch.dir("ndinc_idem").resolve("idx").toString
    def docs(ids: Seq[Long]) =
      ids.map(i => (i, "identical text shared by every doc")).toDF("doc_id", "text")
    NearDup.applyMinhashIndexBatch(spark, index, docs(Seq(1L, 2L, 3L)),
      maxBucket = 4, batchId = Some(0L))
    // sink restart re-delivers epoch 0: must not double-append band rows
    // (which would push the shared buckets to 6 > 4 and retract all pairs)
    NearDup.applyMinhashIndexBatch(spark, index, docs(Seq(1L, 2L, 3L)),
      maxBucket = 4, batchId = Some(0L))
    val ids = (1L to 3L).toDF("doc_id")
    val rep = NearDup.minhashIndexReport(spark, index, ids, maxBucket = 4).collect()
    assert(rep.forall(_.getLong(1) == 2L))
  }
}
