package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.multimodal.Multimodal
import graft.similarity.Similarity

class FunctionsSpec extends SparkSuite {

  test("native cosine_sim expression matches the HOF baseline bit-for-bit") {
    val emb = graft.model.Tables.embeddings(spark, sf("sf0.001")).limit(50)
    val pairs = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .where(col("vec_id") < col("b_id")).limit(200)
    val diff = pairs.select(
      (GraftFunctions.cosine_sim(col("embedding"), col("b")) -
        Similarity.cosineHof(col("embedding"), col("b"))).as("d"))
      .agg(max(abs(col("d")))).collect().head.getDouble(0)
    assert(diff == 0.0)
  }

  test("cosine_sim and pct_change are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       pct_change(1.16, 1.12) AS p""".stripMargin).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDecimal(1).toPlainString == "3.57")
  }

  test("whole-stage codegen covers the cosine_sim projection") {
    val emb = graft.model.Tables.embeddings(spark, sf("sf0.001"))
    val df = emb.select(GraftFunctions.cosine_sim(col("embedding"),
      col("embedding")).as("c"))
    // execute first (through THIS frame's own QueryExecution): the
    // loader's input rebalance makes AQE wrap the plan, and codegen
    // markers only appear on the FINALIZED plan
    df.collect()
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    // (any stage index — the input rebalance may precede it)
    assert("""\*\(\d+\) Project""".r.findFirstIn(
      df.queryExecution.executedPlan.toString).isDefined,
      df.queryExecution.executedPlan.toString)
  }

  test("rolling_hash64: codegen'd, deterministic, sensitive to every byte") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT rolling_hash64('abc') AS a, rolling_hash64('abc') AS a2,
        |       rolling_hash64('abd') AS b, rolling_hash64(CAST(NULL AS STRING)) AS n
        |""".stripMargin).collect().head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
    assert(r.isNullAt(3))
  }

  test("optimizer rule folds self-intersection to size(x), null-preserving") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT sorted_intersect_count(a, a) AS n,
        |       sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>),
        |                              CAST(NULL AS ARRAY<BIGINT>)) AS nn
        |FROM VALUES (array(1L, 2L, 3L)) AS t(a)""".stripMargin)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("sorted_intersect_count"), plan) // folded away
    val r = df.collect().head
    assert(r.getLong(0) == 3L)
    assert(r.isNullAt(1))
  }

  test("multimodal decode: schema, batching, and deterministic stub output") {
    val meta = Multimodal.decodeMeta(
      Multimodal.mediaFromDocuments(spark, sf("sf0.001")), batchSize = 7)
    val rows = meta.collect()
    assert(rows.length == 500)
    assert(rows.forall(m => m.byte_len > 0 && m.width >= 64 && m.width < 256))
    assert(rows.forall(_.feature.length == 8))
    // deterministic: same input → same features
    val again = Multimodal.decodeMeta(
      Multimodal.mediaFromDocuments(spark, sf("sf0.001"))).collect()
    assert(rows.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("frame sampling: every-2nd frame, window arithmetic, driver-recomputed hash") {
    val dir = sf("sf0.001")
    val fs = Multimodal.frameSamples(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4)))
    assert(fs.nonEmpty)
    // only video docs (doc_id % 3 == 2), frame_idx even, offsets = idx*stride
    assert(fs.forall { case (id, i, off, flen, _) =>
      id % 3 == 2 && i % 2 == 0 && flen > 0 && (i == 0 || off % i == 0) })
    // driver-side recompute for one document
    val docId = fs.head._1
    val text = graft.model.Tables.documents(spark, dir)
      .where(col("doc_id") === docId).select(col("text"))
      .collect().head.getString(0)
    val bytes = text.getBytes("UTF-8")
    val frames = 1 + bytes.length % 8
    val stride = bytes.length / frames
    val mine = fs.filter(_._1 == docId).sortBy(_._2)
    assert(mine.map(_._2).toSeq == (0 until frames by 2).toSeq)
    mine.foreach { case (_, i, off, flen, h) =>
      assert(off == i * stride)
      var hh = 1125899906842597L
      (off until math.min(off + stride, bytes.length)).foreach(j =>
        hh = 31 * hh + (bytes(j) & 0xFF))
      assert(h == hh && flen == math.min(off + stride, bytes.length) - off)
    }
  }

  test("scene cuts: deltas match a driver recompute; flags are the threshold rule") {
    val dir = sf("sf0.001")
    val sc = Multimodal.sceneCuts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(sc.nonEmpty)
    assert(sc.forall { case (id, i, _, d, _) => id % 3 == 2 && i >= 1 && d >= 0 })
    // independent recompute for one video: byte sums per stride window
    val docId = sc.head._1
    val bytes = graft.model.Tables.documents(spark, dir)
      .where(col("doc_id") === docId).select(col("text"))
      .collect().head.getString(0).getBytes("UTF-8")
    val frames = 1 + bytes.length % 8
    val stride = bytes.length / frames
    val sums = (0 until frames).map(i =>
      (i * stride until i * stride + stride).map(bytes(_) & 0xFF).map(_.toLong).sum)
    val mine = sc.filter(_._1 == docId).sortBy(_._2)
    assert(mine.map(_._2).toSeq == (1 until frames).toSeq)
    mine.foreach { case (_, i, s, d, cut) =>
      assert(s == sums(i))
      assert(d == math.abs(sums(i) - sums(i - 1)))
      assert(cut == (d > stride.toLong * 16))
    }
  }

  test("video keyframes: one max-sum frame per shot, shots partition the cut flags") {
    val dir = sf("sf0.001")
    val sc = Multimodal.sceneCuts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(4)))
    val kf = Multimodal.videoKeyframes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5), r.getInt(6))))
      .toMap
    assert(kf.nonEmpty)
    // driver recompute: running cut count = shot id; keyframe = max sum,
    // frame-idx-asc tiebreak; shot extent and size must match
    sc.groupBy(_._1).foreach { case (doc, rows) =>
      var shot = 0L
      val tagged = rows.sortBy(_._2).map { case (_, i, s, cut) =>
        if (cut) shot += 1
        (shot, i, s)
      }
      tagged.groupBy(_._1).foreach { case (sid, fs) =>
        val best = fs.minBy { case (_, i, s) => (-s, i) }
        val (ki, ks, n, lo, hi) = kf((doc, sid))
        assert((ki, ks) == ((best._2, best._3)))
        assert(n == fs.length && lo == fs.map(_._2).min && hi == fs.map(_._2).max)
      }
    }
  }

  test("audio windows: integer energy/peak match a driver recompute") {
    val dir = sf("sf0.001")
    val ws = Multimodal.audioWindows(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getInt(4)))
    assert(ws.nonEmpty)
    // only audio docs, contiguous window indexing, exact offsets
    assert(ws.forall { case (id, i, off, e, p) =>
      id % 3 == 1 && off == i * 200 && e >= 0 && p >= 0 && p <= 128 })
    val docId = ws.head._1
    val bytes = graft.model.Tables.documents(spark, dir)
      .where(col("doc_id") === docId).select(col("text"))
      .collect().head.getString(0).getBytes("UTF-8")
    val mine = ws.filter(_._1 == docId).sortBy(_._2)
    assert(mine.map(_._2).toSeq == (0 until bytes.length / 200).toSeq)
    mine.foreach { case (_, i, off, e, p) =>
      val cs = (off until off + 200).map(j => (bytes(j) & 0xFF) - 128)
      assert(e == cs.map(c => c.toLong * c).sum)
      assert(p == cs.map(math.abs).max)
    }
  }

  test("mm_features pins the decoded feature vector to a driver-side stub run") {
    val dir = sf("sf0.001")
    val row = Multimodal.featureTable(spark, dir)
      .where(col("doc_id") === 0).collect().head
    // recompute doc 0's feature sum OFF Spark: same stub, driver-side
    val text = graft.model.Tables.documents(spark, dir)
      .where(col("doc_id") === 0).select(col("text")).collect().head.getString(0)
    val rec = Multimodal.MediaRecord(0L, "image", text.getBytes("UTF-8"))
    val sum = Multimodal.stubDecode(rec).feature
      .foldLeft(0.0)((acc, x) => acc + x.toDouble)
    val expected = BigDecimal(sum)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[String]("kind") == "image") // doc_id 0 % 3 == 0
    assert(row.getAs[Double]("feature_sum") == expected)
  }

  test("audio segments: contiguous voiced runs, consistent bounds, no overlap") {
    val segs = Multimodal.audioSegments(spark, sf("sf0.001")).collect()
    assert(segs.nonEmpty)
    segs.foreach { r =>
      val (s0, s1, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(s0 <= s1 && n == s1 - s0 + 1) // a segment IS a contiguous run
      assert(r.getLong(4) > 0L)            // voiced ⇒ positive energy
    }
    // segments of one doc never overlap (islands are maximal)
    segs.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getLong(2) + 1 < b.getLong(1)) // gap of ≥1 quiet window
      }
    }
  }

  test("word lift: counts consistent, lift positive and bounded by independence") {
    val out = SparkEntry.queries("text_word_lift")(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (na, nb, nab) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nab >= 1L && nab <= math.min(na, nb)) // co-occurrence bound
      val lift = r.getDouble(5)
      assert(lift > 0.0)
    }
  }

  test("crossmodal: driver-side encoder replay, k rows per image, rank order sound") {
    val dir = sf("sf0.001")
    val out = Multimodal.crossModalTopK(spark, dir, k = 3).collect()
    val images = graft.model.Tables.documents(spark, dir)
      .where(col("doc_id") % 3 === 0).count()
    assert(out.length == images * 3) // every image retrieves exactly k
    // rank 1 must dominate rank 3 within a doc
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.head.getDouble(2) >= sorted.last.getDouble(2))
    }
    // driver-side recompute of doc 0's encoder output → cosine vs the
    // rank-1 vector must equal the engine's score
    val text = graft.model.Tables.documents(spark, dir)
      .where(col("doc_id") === 0).select(col("text")).collect().head.getString(0)
    val bytes = text.getBytes("UTF-8")
    val v = Array.tabulate(64) { i =>
      var h = 1125899906842597L + i
      var j = i
      while (j < bytes.length) { h = 31 * h + (bytes(j) & 0xFF); j += 64 }
      ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
    val top = out.filter(r => r.getLong(0) == 0L && r.getInt(3) == 1).head
    val emb = graft.model.Tables.embeddings(spark, dir)
      .where(col("vec_id") === top.getLong(1)).select(col("embedding"))
      .collect().head.getSeq[Float](0)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    v.indices.foreach { i =>
      val a = v(i).toDouble; val b = emb(i).toDouble
      dot += a * b; nx += a * a; ny += b * b
    }
    val cos = BigDecimal(dot / math.sqrt(nx * ny))
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getDouble(2) == cos)
  }

  test("phash: identical payloads collide, near payloads land close, far ones far") {
    val base = ("the quick brown fox " * 40).getBytes("UTF-8")
    val near = base.clone(); near(5) = 'X'.toByte // one-byte edit
    val far = ("completely different payload content! " * 25).getBytes("UTF-8")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (hb, hn, hf) = (Multimodal.phash(base), Multimodal.phash(near),
      Multimodal.phash(far))
    assert(ham(hb, hb) == 0)
    // a one-byte edit perturbs one grid cell -> at most a few dHash bits
    assert(ham(hb, hn) <= 7)
    assert(ham(hb, hf) > 7)
  }

  test("phash near-dup: every image emits a row; recall exact at Hamming <= 7") {
    val dir = sf("sf0.001")
    val res = Multimodal.phashNearDup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toMap
    val nImages = graft.model.Tables.documents(spark, dir)
      .where(col("doc_id") % 3 === 0).count()
    assert(res.size == nImages)
    // pigeonhole recall: brute-force every pair on the driver; any pair
    // within Hamming 7 must be flagged on both endpoints (bucket caps
    // can only drop degenerate buckets, which a <=7 pair cannot fully
    // occupy at this corpus size — assert no cap interference outright)
    val hashes = res.view.mapValues(_._1).toMap
    for (a <- hashes.keys; b <- hashes.keys if a < b) {
      val d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if (d <= 7) {
        assert(res(a)._3, s"$a within $d of $b must be flagged")
        assert(res(b)._3, s"$b within $d of $a must be flagged")
        assert(res(a)._2 <= d && res(b)._2 <= d)
      }
    }
    // the flag branch is live in both directions on the fixture
    assert(res.values.exists(_._3) && res.values.exists(!_._3))
  }

  test("cdc: chunks reconstruct the payload; boundaries resync after a prefix edit") {
    val text = (1 to 400).map(i => s"w${i % 97}").mkString(" ")
    val base = text.getBytes("UTF-8")
    val segs = Multimodal.cdcSegments(base, 16, 64).toSeq
    // contiguous cover of the payload, no gaps or overlaps
    assert(segs.head._2 == 0)
    segs.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 + a._3 == b._2)
      case _ =>
    }
    assert(segs.last._2 + segs.last._3 == base.length)
    // determinism
    assert(Multimodal.cdcSegments(base, 16, 64).toSeq == segs)
    // THE CDC property: a prefix insertion shifts every byte, yet the
    // chunk-hash sets re-converge because boundaries are content-local
    // (fixed-stride framing shares ~nothing after a 3-byte shift)
    val edited = ("xy " + text).getBytes("UTF-8")
    val eSegs = Multimodal.cdcSegments(edited, 16, 64).toSeq
    // boundaries re-align as a pure +3 shift past the edit
    val baseCuts = segs.map(s => s._2 + s._3)
    val eCuts = eSegs.map(s => s._2 + s._3).toSet
    assert(baseCuts.count(c => eCuts.contains(c + 3)) == baseCuts.size)
    // the DISTINCT hash sets re-converge: only the chunk spanning the
    // edit can differ (the periodic fixture collapses repeats, so
    // compare distinct sets, not positional chunk counts)
    val baseH = segs.map(_._4).toSet
    val shared = baseH intersect eSegs.map(_._4).toSet
    assert(shared.size >= baseH.size - 1 && shared.size >= 3,
      s"only ${shared.size} of ${baseH.size} distinct chunk hashes survived")
  }

  test("cdc clusters: every thresholded pair shares a min-id cluster; sizes agree") {
    val dir = sf("sf0.001")
    val pairs = Multimodal.cdcNearDup(spark, dir)
      .where(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty, "fixture must yield at least one >=0.5 pair")
    val rows = Multimodal.cdcClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val label = rows.map(t => t._1 -> t._2).toMap
    // both endpoints of every surviving pair carry the same label
    pairs.foreach { case (a, b) => assert(label(a) == label(b)) }
    // cluster_id is the component's min doc_id, and every member of a
    // cluster is reachable: hash-min guarantees label <= id, and the
    // label itself must be a member of its own cluster
    rows.foreach { case (id, cid, _) => assert(cid <= id) }
    val members = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    members.foreach { case (cid, ms) => assert(ms.contains(cid)) }
    // cluster_size matches the actual member count on every row
    rows.foreach { case (_, cid, sz) => assert(sz == members(cid).size.toLong) }
    // only docs with at least one surviving pair appear at all
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(rows.map(_._1).toSet == paired)
    // an unsatisfiable threshold exercises the empty-edge path cleanly
    assert(Multimodal.cdcClusters(spark, dir, minJaccard = 2.0).count() == 0L)
  }

  test("audio landmarks: identical payloads pair at 1.0, clips survive, disjoint don't") {
    import spark.implicits._
    // audio docs are doc_id % 3 == 1; 1 and 4 identical, 7 disjoint,
    // 10 a 60% CLIP of 1 — the constellation property: the clip keeps
    // the shared-prefix landmarks where fixed whole-payload hashing
    // keeps nothing
    val t = (1 to 400).map(i => s"w${(i * 7) % 97}").mkString(" ")
    val other = (1 to 400).map(i => s"q${(i * 11) % 89}").mkString(" ")
    val clip = t.substring(0, (t.length * 6) / 10)
    val docs = Seq((1L, t), (4L, t), (7L, other), (10L, clip))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("x"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val d = graft.util.Scratch.dir("audio_fp_fixture")
    docs.write.mode("overwrite")
      .parquet(d.resolve("documents.parquet").toString)
    val fp = Multimodal.audioFingerprints(spark, d.toString)
    val pairs = Multimodal.audioNearDup(fp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs((1L, 4L)) == 1.0, "identical payloads at jaccard 1")
    assert(pairs.contains((1L, 10L)) && pairs((1L, 10L)) > 0.3,
      s"clip must keep most of the constellation: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 7L || p._2 == 7L),
      "disjoint content never pairs")
  }

  test("video near-dup: identical payloads pair at jaccard 1, disjoint never pair") {
    import spark.implicits._
    // pad so len % 8 == 7 → the stub demuxer sees 8 frames (a payload
    // at len % 8 == 0 is a single frame and can never share TWO hashes)
    def pad(t0: String): String = {
      var t = t0
      while (t.getBytes("UTF-8").length % 8 != 7) t += "x"
      t
    }
    val text = pad((1 to 300).map(i => s"v${i % 89}").mkString(" "))
    // doc_id % 3 == 2 → video kind; 2 and 5 identical, 8 disjoint
    val docs = Seq(
      (2L, text, "en", "s", 0L),
      (5L, text, "en", "s", 0L),
      (8L, pad((1 to 300).map(i => s"z${i % 83}").mkString(" ")), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = graft.util.Scratch.dir("vnd_fixture")
    docs.write.mode("overwrite").parquet(d.resolve("documents.parquet").toString)
    val out = Multimodal.videoNearDup(spark, d.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // the corpus derives a frame-0-perturbed re-encode for each EVEN
    // video (ids 2 and 8 → +VideoDerivedOffset); with 8 frames the
    // copy shares 7 and jaccards at 7/9 with its source — and with
    // anything identical to its source
    val d2 = 2L + Multimodal.VideoDerivedOffset
    val d8 = 8L + Multimodal.VideoDerivedOffset
    assert(out.keySet == Set((2L, 5L), (2L, d2), (5L, d2), (8L, d8)))
    assert(out((2L, 5L))._2 == 1.0) // identical frame sets
    assert(out((2L, d2)) == ((7L, 7.0 / 9.0)))
    assert(out((8L, d8)) == ((7L, 7.0 / 9.0)))
  }
}
