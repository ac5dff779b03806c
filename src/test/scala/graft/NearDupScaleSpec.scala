package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.{NearDup, TextFunctions}

/** Scale-safety and value-compatibility checks for the near-dup family:
  * the single-pass signature expressions must reproduce the dataflow
  * formulations bit-for-bit, and every candidate self-join must stay
  * bounded on an adversarial (all-identical) corpus.
  */
class NearDupScaleSpec extends SparkSuite {

  private def normCol = TextFunctions.normText(col("text"))

  /** The retired dataflow minhash (posexplode → lead window → min agg),
    * kept here as the independent reference implementation.
    */
  private def dataflowMinhash(docsRaw: DataFrame, nHashes: Int = 32): DataFrame = {
    val toks = docsRaw.select(col("doc_id"),
      posexplode(split(normCol, " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val sh = toks
      .select(col("doc_id"), col("pos"),
        lead("tok", 1).over(w).as("t1"), lead("tok", 2).over(w).as("t2"),
        col("tok"))
      .where(col("t2").isNotNull || col("pos") === 0)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("sh"))
    val withBase = sh.select(col("doc_id"), xxhash64(col("sh")).as("hb"))
    val hashCols = (0 until nHashes).map(j =>
      xxhash64(col("hb"), lit(j)).as(s"h$j"))
    withBase.select(col("doc_id") +: hashCols: _*)
      .groupBy("doc_id")
      .agg(min(col("h0")).as("m0"),
        (1 until nHashes).map(j => min(col(s"h$j")).as(s"m$j")): _*)
      .select(col("doc_id"),
        array((0 until nHashes).map(j => col(s"m$j")): _*).as("mh"))
  }

  /** The retired dataflow simhash (explode → token counts → 64 bit sums). */
  private def dataflowSimhash(docsRaw: DataFrame): DataFrame = {
    val tokens = docsRaw
      .select(col("doc_id"), explode(split(normCol, " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$j")
    }
    tokens.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  test("MinHashSignature expression == dataflow minhash on real docs") {
    val docs = graft.model.Tables.documents(spark, sf("sf0.001")).limit(200)
    val got = NearDup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val exp = dataflowMinhash(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, sig) => assert(sig == exp(id), s"doc $id") }
  }

  test("MinHashSignature expression == dataflow minhash on edge docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""), (2L, "one"), (3L, "one two"), (4L, "one two three"),
      (5L, "  spaced   out\ttabs\nnewlines  "), (6L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val got = NearDup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val exp = dataflowMinhash(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == exp)
  }

  test("SimHash64 expression == dataflow simhash on real + edge docs") {
    import spark.implicits._
    val real = graft.model.Tables.documents(spark, sf("sf0.001")).limit(200)
      .select(col("doc_id"), col("text"))
    val edge = Seq((10001L, ""), (10002L, "one"), (10003L, "one one one two"))
      .toDF("doc_id", "text")
    val docs = real.unionAll(edge)
    val gotMap = docs.select(col("doc_id"),
        graft.functions.SimHash64(normCol).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expMap = dataflowSimhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotMap == expMap)
  }

  test("all candidate self-joins stay bounded on an all-identical corpus") {
    import spark.implicits._
    // 200 identical docs: every band bucket / simhash chunk / trigram
    // bucket is one 200-doc bucket — above maxBucket=50, so candidate
    // generation must DROP it and complete with zero pairs rather than
    // generate 200*199 of them.
    val clones = (0L until 200L).map(i => (i, "the same document text over and over"))
      .toDF("doc_id", "text")
    val mh = NearDup.minhashSignatures(clones).persist()
    assert(NearDup.minhashCandidatePairs(mh, maxBucket = 50).count() == 0)
    val sh = clones.select(col("doc_id"),
      graft.functions.SimHash64(normCol).as("simhash"))
    assert(NearDup.simhashCandidatePairs(sh, maxBucket = 50).count() == 0)
    // with the cap above the bucket size, the full pairing appears
    assert(NearDup.minhashCandidatePairs(mh, maxBucket = 300).count() == 200L * 199L)
    mh.unpersist()
  }

  test("recall property: LSH candidates cover exact-Jaccard>=0.8 pairs (sf0.001)") {
    val m = NearDup.minhashRecallCheck(spark, sf("sf0.001")).collect().head
    assert(m.getLong(1) == 0, s"minhash violations: $m")
    val sh = NearDup.simhashRecallCheck(spark, sf("sf0.001")).collect().head
    assert(sh.getLong(1) == 0, s"simhash violations: $sh")
  }
}
