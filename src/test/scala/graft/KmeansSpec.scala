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

  test("on a separable corpus training reaches a fixpoint: extra iterations are no-ops") {
    import spark.implicits._
    // 4 well-separated direction clusters in 64 dims: member m of cluster
    // c points along axis c with small deterministic jitter elsewhere.
    // vec_ids interleave clusters so the k lowest-id seeds (0..3) land in
    // distinct clusters.
    val vecs = (0 until 200).map { m =>
      val c = m % 4
      val e = Array.tabulate(64)(d =>
        (if (d == c) 10f else 0f) + ((m * 31 + d * 7) % 13) * 0.01f)
      (m.toLong, c.toLong, e)
    }.toDF("vec_id", "label", "embedding")
    val d = graft.util.Scratch.dir("kmeans_fixpoint")
    vecs.write.mode("overwrite").parquet(d.resolve("embeddings.parquet").toString)

    def cells(iters: Int) = Similarity.kmeansCentroids(spark, d.toString,
        k = 4, iters = iters).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val at2 = cells(2)
    val at3 = cells(3)
    // converged: the assignment is stable, so one more Lloyd step
    // reproduces the centroids bit-for-bit (update is a pure function of
    // the assignment, assignment a pure function of the centroids)
    assert(at2 == at3)
    assert(at2.size == 4 && at2.values.forall(_.length == 64))
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

  test("SemDeDup flags within-cell near-copies and keeps id-minimal exemplars") {
    import spark.implicits._
    // 4 separated direction clusters; per cluster: a seed (ids 0..3, the
    // k-means seeds), a near-copy of the seed (ids 4..7 — must be
    // flagged), and an in-cell but angled member (ids 8..11, cosine to
    // the seed 10/sqrt(725) ~= 0.371 < 0.45 — must NOT be flagged).
    val vecs = (0 until 12).map { m =>
      val c = m % 4
      val e = Array.fill(64)(0f)
      e(c) = 10f
      if (m >= 4 && m < 8) e(10 + c) = 0.01f        // near-copy jitter
      if (m >= 8) e(32 + c) = 25f                   // angled member
      (m.toLong, c.toLong, e)
    }.toDF("vec_id", "label", "embedding")
    val d = graft.util.Scratch.dir("semdedup_fixture")
    vecs.write.mode("overwrite").parquet(d.resolve("embeddings.parquet").toString)

    def run() = Similarity.semanticDedup(spark, d.toString, cells = 4,
        iters = 2, threshold = 0.45).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val flags = run()
    assert(flags == run()) // deterministic
    assert(flags.size == 12)
    (0 until 4).foreach { c =>
      assert(!flags(c.toLong), s"seed $c is its cell's id-minimal exemplar")
      assert(flags(c.toLong + 4), s"near-copy ${c + 4} must be flagged")
      assert(!flags(c.toLong + 8), s"angled member ${c + 8} is below threshold")
    }
  }

  test("matryoshka recall: prefix-signal 1.0, tail-only signal degrades") {
    import spark.implicits._
    // front-loaded: vectors differ only in dims 0..15 (the MRL shape) →
    // the 16-prefix ranking equals the full ranking, recall 1.0
    def vecs(offset: Int) = (0 until 12).map { m =>
      val e = Array.fill(64)(0f)
      e(offset + (m % 4)) = 10f
      e(offset + ((m / 4) % 4)) += 3f
      (m.toLong, (m % 4).toLong, e)
    }
    val dF = graft.util.Scratch.dir("mrl_front")
    vecs(0).toDF("vec_id", "label", "embedding").write.mode("overwrite")
      .parquet(dF.resolve("embeddings.parquet").toString)
    val front = Similarity.matryoshkaRecall(spark, dF.toString,
      nQueries = 3, topK = 5).collect()
    assert(front.nonEmpty)
    front.foreach(r => assert(r.getDouble(3) == 1.0,
      s"front-loaded signal must retrieve perfectly: $r"))
    // tail-only: all signal in dims 40+; the 16-prefix is all-zero →
    // prefix cosine degenerates and recall must drop below 1 somewhere
    val dT = graft.util.Scratch.dir("mrl_tail")
    vecs(40).toDF("vec_id", "label", "embedding").write.mode("overwrite")
      .parquet(dT.resolve("embeddings.parquet").toString)
    val tail = Similarity.matryoshkaRecall(spark, dT.toString,
      nQueries = 3, topK = 5).collect()
    assert(tail.exists(_.getDouble(3) < 1.0),
      "tail-only signal cannot retrieve perfectly from the prefix")
  }

  test("incremental SemDeDup: batching-invariant, idempotent, equals one-shot flags") {
    val dir = sf("sf0.001")
    val emb = graft.model.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val oneShot = Similarity.semanticDedup(spark, dir).collect()
      .map(_.toString).sorted.toSeq
    def flags(splits: Seq[org.apache.spark.sql.DataFrame],
        tag: String): (String, Seq[String]) = {
      val idx = graft.util.Scratch.dir(s"semidx_$tag").toString
      splits.zipWithIndex.foreach { case (b, i) =>
        Similarity.appendSemanticIndexBatch(spark, idx, b, dir,
          batchId = Some(i.toLong))
      }
      (idx, Similarity.semanticDedupFromIndex(spark, idx).collect()
        .map(_.toString).sorted.toSeq)
    }
    val (_, a) = flags(Seq(emb), "one")
    val (i3, b) = flags(Seq(emb.where(col("vec_id") < n / 4),
      emb.where(col("vec_id") >= n / 4 && col("vec_id") < n / 2),
      emb.where(col("vec_id") >= n / 2)), "three")
    assert(a == oneShot && a.nonEmpty)
    assert(b == oneShot)
    // re-delivered batch is a no-op
    Similarity.appendSemanticIndexBatch(spark, i3,
      emb.where(col("vec_id") < n / 4), dir, batchId = Some(0L))
    assert(Similarity.semanticDedupFromIndex(spark, i3).collect()
      .map(_.toString).sorted.toSeq == oneShot)
  }

  test("incremental ANN index: batching-invariant, idempotent, serves one-shot top-k") {
    val dir = sf("sf0.001")
    val emb = graft.model.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val half = emb.count() / 2
    val oneShot = Similarity.ivfKmeansTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    def build(splits: Seq[org.apache.spark.sql.DataFrame],
        tag: String): String = {
      val idx = graft.util.Scratch.dir(s"annidx_$tag").toString
      splits.zipWithIndex.foreach { case (b, i) =>
        Similarity.appendIvfIndexBatch(spark, idx, b, dir,
          batchId = Some(i.toLong))
      }
      idx
    }
    // two different batchings must yield identical index CONTENTS
    val idxA = build(Seq(emb), "one")
    val idxB = build(Seq(emb.where(col("vec_id") < half),
      emb.where(col("vec_id") >= half)), "two")
    def contents(idx: String) = spark.read.parquet(s"$idx/cells")
      .select("cell", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(contents(idxA) == contents(idxB))
    // re-delivered batch is a no-op (row count unchanged)
    val before = spark.read.parquet(s"$idxA/cells").count()
    Similarity.appendIvfIndexBatch(spark, idxA, emb, dir,
      batchId = Some(0L))
    assert(spark.read.parquet(s"$idxA/cells").count() == before)
    // the maintained index serves the one-shot answer exactly
    val fromIdx = Similarity.ivfTopKFromIndex(spark, idxB, dir).collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(fromIdx == oneShot)
    assert(oneShot.nonEmpty)
  }

  test("ANN index deletes: LWW tombstones, re-adds revive, reads skip dead entries") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val emb = graft.model.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val idx = graft.util.Scratch.dir("annidx_del").toString
    Similarity.appendIvfIndexBatch(spark, idx, emb, dir, batchId = Some(0L))
    val all = spark.read.parquet(s"$idx/cells").select("vec_id")
      .as[Long].collect().toSet
    // no tombstones yet: live view is the whole index
    assert(Similarity.liveIvfIndex(spark, idx).select("vec_id")
      .as[Long].collect().toSet == all)
    // delete ids % 10 == 7 at seq 100
    Similarity.deleteFromIvfIndexBatch(spark, idx,
      emb.where(col("vec_id") % 10 === 7).select(col("vec_id")),
      batchId = Some(100L))
    val afterDel = Similarity.liveIvfIndex(spark, idx).select("vec_id")
      .as[Long].collect().toSet
    assert(afterDel == all.filterNot(_ % 10 == 7))
    // re-delivered delete batch is a no-op (marker namespace)
    val tombBefore = spark.read.parquet(s"$idx/tombstones").count()
    Similarity.deleteFromIvfIndexBatch(spark, idx,
      emb.select(col("vec_id")), batchId = Some(100L))
    assert(spark.read.parquet(s"$idx/tombstones").count() == tombBefore)
    // re-add half of the deleted at a LATER seq: LWW revives them, and
    // each revived id has exactly ONE live entry (the old one stays dead)
    Similarity.appendIvfIndexBatch(spark, idx,
      emb.where(col("vec_id") % 20 === 7), dir, batchId = Some(200L))
    val live = Similarity.liveIvfIndex(spark, idx).select("vec_id")
      .as[Long].collect().toSeq
    assert(live.toSet == all.filterNot(_ % 20 == 17))
    assert(live.size == live.toSet.size, "one live entry per id")
    // the served top-k equals the one-shot search over the retained set
    val retained = emb.where(!(col("vec_id") % 20 === 17))
    val expect = Similarity.ivfSearchAssignedForTest(spark, dir, retained)
      .collect().map(_.toSeq).toSet
    val got = Similarity.ivfTopKFromIndex(spark, idx, dir)
      .collect().map(_.toSeq).toSet
    assert(got == expect && got.nonEmpty)
  }
}
