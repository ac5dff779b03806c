package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.similarity.Similarity

/** Int8 quantization evidence: codes are bounded with the max element
  * pinned to ±127, and the quantized cosine tracks the exact cosine
  * within the quantization error envelope on real vectors.
  */
class QuantizationSpec extends SparkSuite {

  test("mips: ranks by inner product not cosine; augmented norms all equal M") {
    import spark.implicits._
    // q = vec 0. Candidate 1 is PERFECTLY aligned but short (dot 0.5);
    // candidate 2 is misaligned but long (dot 2.0). Cosine prefers 1,
    // MIPS must prefer 2. All vectors land in the same probe region for
    // tiny dims only by luck, so give every vector the same direction
    // component large enough that one plane can't separate q from the
    // candidates entirely — then assert on the returned ORDER.
    val dim = 4
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.5f, 0.0f, 0.0f, 0.0f)), // cos=1, dot=0.5
      (2L, Array(2.0f, 2.0f, 0.0f, 0.0f)), // cos≈.71, dot=2.0
      (3L, Array(0.0f, 0.0f, 0.0f, 3.5f))) // orthogonal: dot 0
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.mipsTopKFrom(emb, nQueries = 1, k = 4,
      nPlanes = 0, maxBucket = 100, dim = dim) // 0 planes → one bucket
      .orderBy(col("rank")).collect()
    assert(out.nonEmpty && out.head.getLong(1) == 2L) // the long vector wins
    val ips = out.map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(ips(2L) == 2.0 && ips(1L) == 0.5 && ips(3L) == 0.0)
    // augmentation invariant on real data: every augmented vector has
    // norm² = M² (up to the float quantization of the extra coordinate)
    val e = Tables.embeddings(spark, sf("sf0.001"))
      .withColumn("nsq", Similarity.dotDouble(col("embedding"), col("embedding")))
    val m2 = e.agg(max(col("nsq"))).collect().head.getDouble(0)
    val augNorms = e.select(
      (col("nsq") + pow(sqrt(lit(m2) - col("nsq")).cast("float"), 2.0))
        .as("an")).collect().map(_.getDouble(0))
    augNorms.foreach(an => assert(math.abs(an - m2) / m2 < 1e-6))
  }

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

  test("ivfpq: candidates confined to probed cells; ADC agrees with pqTopK") {
    val dir = sf("sf0.001")
    val out = Similarity.ivfPqTopK(spark, dir).collect()
    assert(out.nonEmpty)
    // every returned row's cell is one of its query's nprobe=2 probes
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    def lv(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue
    val probed = Similarity
      .ivfProbes(queries, Similarity.labelCentroids(emb), nprobe = 2)
      .select(col("qid"), col("label")).collect()
      .map(r => (lv(r, 0), lv(r, 1))).toSet
    out.foreach { r =>
      assert(probed.contains((lv(r, 0), lv(r, 1))),
        s"qid ${lv(r, 0)} returned unprobed cell ${lv(r, 1)}")
      assert(!r.isNullAt(2) && lv(r, 2) != lv(r, 0)) // self excluded
    }
    // the ADC score is the SAME function pqTopK computes: for every
    // (qid, vec_id) the exhaustive run also ranks, distances must match
    val pqAdc = Similarity.pqTopK(spark, dir, topK = 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      val key = (lv(r, 0), lv(r, 2))
      pqAdc.get(key).foreach(d => assert(d == r.getDouble(3),
        s"ADC drift for $key: pq $d vs ivfpq ${r.getDouble(3)}"))
    }
  }

  // the engine's exact arithmetic in plain Scala: integer covariance by
  // moment identity, 8 power steps folding contributions in ascending-k
  // order, L∞ normalization
  private def driverPca(emb: Array[Array[Float]]): (Array[Double], Double) = {
    val n = emb.length; val d = 64
    val q = emb.map(_.map(x => (x.toDouble * 1000.0).toLong))
    val s1 = Array.tabulate(d)(j => q.map(_(j)).sum)
    val c = Array.tabulate(d, d)((j, k) =>
      n.toLong * q.map(r => r(j) * r(k)).sum - s1(j) * s1(k))
    var v = Array.fill(d)(1.0)
    var mx = 0.0
    for (_ <- 1 to 8) {
      val w = Array.tabulate(d)(j =>
        (0 until d).foldLeft(0.0)((acc, k) => acc + c(j)(k).toDouble * v(k)))
      mx = w.map(math.abs).max
      v = w.map(_ / mx)
    }
    (v, mx)
  }

  test("pca power: driver recompute matches fold-for-fold, eigenvalue positive") {
    val emb = Tables.embeddings(spark, sf("sf0.001")).select("embedding")
      .collect().map(_.getSeq[Float](0).toArray)
    val (v, mx) = driverPca(emb)
    val out = Similarity.pcaPower(spark, sf("sf0.001")).collect()
    assert(out.length == 64)
    out.foreach { r =>
      val j = r.getLong(0).toInt - 1
      assert(r.getDouble(1) == v(j), s"loading dim ${j + 1}")
      assert(r.getDouble(2) == mx, "lambda")
    }
    assert(mx > 0.0 && v.exists(x => math.abs(x) == 1.0))
  }

  test("incremental pca: batching-invariant, idempotent, equals one-shot") {
    val dir = sf("sf0.001")
    val emb = Tables.embeddings(spark, dir)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val n = emb.count()
    val oneShot = Similarity.pcaPower(spark, dir).collect()
      .map(_.toString).toSeq
    def report(splits: Seq[org.apache.spark.sql.DataFrame],
        tag: String): (String, Seq[String]) = {
      val d = graft.util.Scratch.dir(s"pcainc_$tag").toString
      splits.zipWithIndex.foreach { case (b, i) =>
        Similarity.appendPcaMomentBatch(spark, d, b, batchId = Some(i.toLong))
      }
      (d, Similarity.pcaPowerFromPartials(spark, d)
        .collect().map(_.toString).toSeq)
    }
    import org.apache.spark.sql.functions.col
    val (_, a) = report(Seq(emb), "one")
    val (d3, b) = report(Seq(emb.where(col("vec_id") < n / 4),
      emb.where(col("vec_id") >= n / 4 && col("vec_id") < n / 2),
      emb.where(col("vec_id") >= n / 2)), "three")
    assert(a == oneShot && a.nonEmpty)
    assert(b == oneShot)
    // re-delivered batch is a no-op
    Similarity.appendPcaMomentBatch(spark, d3,
      emb.where(col("vec_id") < n / 4), batchId = Some(0L))
    assert(Similarity.pcaPowerFromPartials(spark, d3)
      .collect().map(_.toString).toSeq == oneShot)
  }

  test("pca project: scores are exact index-ordered folds; top-k order correct") {
    val rows = Tables.embeddings(spark, sf("sf0.001"))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val (v, _) = driverPca(rows.map(_._2))
    val scores = rows.map { case (id, e) =>
      val q = e.map(x => (x.toDouble * 1000.0).toLong)
      id -> (0 until 64).foldLeft(0.0)((acc, i) => acc + q(i).toDouble * v(i))
    }.toMap
    val expectTop = scores.toSeq.sortBy { case (id, sc) => (-math.abs(sc), id) }
      .take(10)
    val out = Similarity.pcaProject(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.toSeq == expectTop)
  }
}
