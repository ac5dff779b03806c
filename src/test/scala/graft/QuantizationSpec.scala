package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.similarity.Similarity

/** Int8 quantization evidence: codes are bounded with the max element
  * pinned to ±127, and the quantized cosine tracks the exact cosine
  * within the quantization error envelope on real vectors.
  */
class QuantizationSpec extends SparkSuite {

  test("codes bounded in [-127,127]; nonzero vectors hit ±127; zero-safe") {
    val q8 = Similarity.withInt8Codes(Tables.embeddings(spark, sf("sf0.001")))
      .select(col("vec_id"), col("q8"))
    val stats = q8.select(
      max(array_max(transform(col("q8"), x => abs(x)))).as("gmax"),
      min(array_max(transform(col("q8"), x => abs(x)))).as("gmin"))
      .collect().head
    assert(stats.getInt(0) == 127) // the max-|v| element maps to ±127
    assert(stats.getInt(1) == 127) // every (nonzero) vector hits the rail
    // zero vector → all-zero codes, no division blowup
    import spark.implicits._
    val z = Seq((0L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val zc = Similarity.withInt8Codes(z).select(col("q8"), col("nq")).collect().head
    assert(zc.getSeq[Int](0).forall(_ == 0) && zc.getLong(1) == 0L)
  }

  test("quantized cosine tracks exact cosine within the int8 error envelope") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val qk = Similarity.quantizedTopK(spark, sf("sf0.001"))
    val withExact = qk.join(
        emb.select(col("vec_id").as("qid"), col("embedding").as("qe")), "qid")
      .join(emb.select(col("vec_id"), col("embedding").as("ce")), "vec_id")
      .select(col("q_cos"),
        Similarity.cosine(col("qe"), col("ce")).as("exact"))
      .collect()
    assert(withExact.nonEmpty)
    // per-element relative quantization error ≤ 1/254; the cosine of
    // 64-dim vectors moves well under 0.02 for that perturbation
    withExact.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.02,
        s"q_cos ${r.getDouble(0)} vs exact ${r.getDouble(1)}")
    }
  }

  test("pq: codebook shape, complete top-k, nonnegative ADC, deterministic") {
    import graft.similarity.Similarity
    val dir = sf("sf0.001")
    val (m, k, d) = (8, 8, 8)
    val cb = Similarity.pqCodebooks(spark, dir, m, k).collect()
    // every subspace trains ≤ k cells of dimension d (a cell can empty
    // out mid-training, never grow)
    val bySub = cb.groupBy(_.getInt(0))
    assert(bySub.keySet == (0 until m).toSet)
    bySub.values.foreach { cells =>
      assert(cells.length <= k && cells.nonEmpty)
      cells.foreach(r => assert(r.getSeq[Float](2).length == d))
    }
    val out = Similarity.pqTopK(spark, dir, m, k).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 5L).toSet)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length == 10)
      assert(!rs.exists(_.getLong(1) == qid))         // self excluded
      rs.foreach(r => assert(r.getDouble(2) >= 0.0))  // ADC is a sum of L2²
      val ranked = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(ranked.zip(ranked.tail).forall { case (a, b) => a <= b })
    }
    // deterministic end to end: a second full run reproduces the bytes
    val again = Similarity.pqTopK(spark, dir, m, k).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
