package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Spherical k-means training (the IVF training step, SURVEY §7.2 item 6
  * extension): determinism and shape — the properties the DuckDB oracle
  * relies on to replay the whole loop.
  */
class KmeansSpec extends SparkSuite {

  test("training is deterministic and produces <= k full-width centroids") {
    val dir = sf("sf0.001")
    val c1 = Similarity.kmeansCentroids(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val c2 = Similarity.kmeansCentroids(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(c1 == c2) // bit-identical across runs (decimal-exact means)
    assert(c1.size <= 8 && c1.nonEmpty)
    assert(c1.values.forall(_.length == 64))
  }

  test("iterating moves centroids off their seeds (training actually runs)") {
    val dir = sf("sf0.001")
    val seed = graft.model.Tables.embeddings(spark, dir)
      .where(col("vec_id") < 8)
      .select(col("vec_id").cast("int"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val trained = Similarity.kmeansCentroids(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    // at least one surviving cell's centroid differs from its seed vector
    assert(trained.exists { case (cell, c) =>
      seed.get(cell).exists(s => s != c) })
  }

  test("IVF over trained cells returns k ranked neighbors per query") {
    val res = Similarity.ivfKmeansTopK(spark, sf("sf0.001")).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rows =>
      assert(rows.length == 5)
      assert(rows.map(_.getInt(4)).sorted.sameElements(1 to 5))
      // ranked by descending rounded cosine
      val byRank = rows.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
