package graft

import graft.similarity.Similarity

/** MMR diversified rerank: a planted redundant candidate must lose its
  * raw rank-2 spot to a farther-but-novel one.
  */
class MmrSpec extends SparkSuite {

  test("two-stage retrieval with a corpus-wide candidate set equals brute force") {
    val dir = sf("sf0.001")
    // candK >= corpus: stage 1 filters nothing, so the exact rerank
    // must reproduce the brute ranking row for row
    val two = Similarity.twoStageTopK(spark, dir, nQueries = 3,
      candK = 100000, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val brute = Similarity.bruteForceTopK(spark, dir, nQueries = 3, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3).toLong)).toSet
    assert(two == brute && two.nonEmpty)
  }

  test("greedy MMR skips the duplicate of the first pick") {
    import spark.implicits._
    def vec(xs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f)
      xs.foreach { case (i, v) => a(i) = v }
      a
    }
    // q along axis 0; v1 ≈ q but tilted (so v3's sim-to-v1 < its qcos);
    // v2 duplicates v1 (raw rank 2, pure redundancy); v3 is farther
    // from q but novel
    val rows = Seq(
      (0L, 0L, vec(0 -> 1f)),
      (1L, 0L, vec(0 -> 0.9f, 1 -> 0.43589f)),
      (2L, 0L, vec(0 -> 0.9f, 1 -> 0.43589f)),
      (3L, 0L, vec(0 -> 0.6f, 2 -> 0.8f)))
    val d = graft.util.Scratch.dir("mmr_fixture")
    rows.toDF("vec_id", "label", "embedding").write.mode("overwrite")
      .parquet(d.resolve("embeddings.parquet").toString)

    val out = Similarity.mmrTopK(spark, d.toString, legK = 50, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // step 1: relevance argmax, id tiebreak between the twins → v1;
    // step 2: v2's mmr = .5·qcos − .5·1 (duplicate) loses to v3's
    // .5·0.6 − .5·0.54 — diversity overrides raw rank
    assert(out == Map(1L -> 1L, 2L -> 3L))

    // the plain ranking would have kept the duplicate at rank 2
    val raw = Similarity.bruteForceTopK(spark, d.toString, nQueries = 1, k = 2)
      .collect().map(r => r.getAs[Long]("vec_id")).toSeq
    assert(raw == Seq(1L, 2L))
  }
}
