package graft

import java.util.Locale

import graft.model.Tables
import graft.text.TfIdf

/** tf-idf against a full driver recompute: same tokenizer, same linear
  * idf, same (score desc, token asc) cut — every emitted row and rank
  * must agree exactly.
  */
class TfIdfSpec extends SparkSuite {

  test("hybrid RRF fuses exactly the two legs' ranks and respects the cut") {
    val dir = sf("sf0.001")
    import org.apache.spark.sql.functions._
    // independent leg recomputes (driver-side fusion of engine legs)
    val lexRanks = TfIdf.bm25Scored(spark, dir, Seq("hash", "join", "stream"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        BigDecimal(r.getAs[Double]("score"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy { case (id, sc) => (-sc, id) }
      .take(50).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val denseRanks = graft.similarity.Similarity
      .bruteForceTopK(spark, dir, nQueries = 1, k = 50).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("rank").toLong).toMap
    val expected = (lexRanks.keySet ++ denseRanks.keySet).toSeq.map { id =>
      val rrf = lexRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        denseRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, lexRanks.get(id), denseRanks.get(id), rrf)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(20)
    val got = graft.text.HybridRetrieval.rrfTopK(spark, dir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3))).toSeq
    assert(got == expected)
    // fusion is meaningful only if it mixes legs — guard the fixture
    assert(got.exists(_._2.isEmpty) || got.exists(_._3.isEmpty)
      || got.exists(g => g._2.nonEmpty && g._3.nonEmpty))
  }

  test("RAG context pack: MMR picks in step order, running budget cut exact") {
    val dir = sf("sf0.001")
    val rows = graft.text.HybridRetrieval.ragContext(spark, dir, k = 8,
      budget = 200L).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(3), r.getLong(4),
        r.getBoolean(5))).sortBy(_._1)
    assert(rows.nonEmpty && rows.map(_._1).toSeq == (1L to rows.length))
    assert(rows.map(_._2).distinct.length == rows.length) // no repeats
    // cum_tokens is the exact running sum; included is the budget cut
    var run = 0L
    rows.foreach { case (_, _, nTok, cum, inc) =>
      run += nTok
      assert(cum == run)
      assert(inc == (cum <= 200L))
    }
    // the budget actually bites on this fixture
    assert(rows.exists(!_._5) && rows.exists(_._5))
  }

  test("top terms match a driver recompute of linear tf-idf") {
    val dir = sf("sf0.001")
    val got = TfIdf.topTerms(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"),
        r.getAs[Double]("score"), r.getAs[Long]("rank"))).toSet

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase(Locale.ROOT).split("\\s+")
        .filter(_.nonEmpty).groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong }
    }.toMap
    val df: Map[String, Long] = tf.values.flatMap(_.keys).toSeq
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val n = docs.length.toDouble
    val expected = tf.flatMap { case (id, terms) =>
      terms.toSeq.map { case (tok, f) =>
        (tok, f, df(tok), f.toDouble * n / df(tok).toDouble)
      }.sortBy { case (tok, _, _, score) => (-score, tok) }
        .take(5).zipWithIndex.map { case ((tok, f, d, score), i) =>
          (id, tok, f, d, score, (i + 1).toLong)
        }
    }.toSet
    assert(got == expected)
  }

  test("bm25 top-k matches a driver recompute, same rational idf and order") {
    val dir = sf("sf0.001")
    val terms = Seq("hash", "join", "stream")
    val (k1, b) = (1.2, 0.75)
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase(Locale.ROOT).split("\\s+")
        .filter(_.nonEmpty).groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong }
    }.toMap
    val withTokens = tf.filter(_._2.nonEmpty)
    val nDocs = withTokens.size.toDouble
    val avgdl = withTokens.values.map(_.values.sum).sum.toDouble / nDocs
    val df = terms.map(t => t -> tf.values.count(_.contains(t)).toDouble).toMap
    val expected = tf.toSeq.map { case (id, m) =>
      val dl = m.values.sum.toDouble
      val cs = terms.map { t =>
        m.get(t).map { f =>
          (nDocs - df(t) + 0.5) / (df(t) + 0.5) *
            (f.toDouble * (k1 + 1.0)) /
            (f.toDouble + k1 * ((1.0 - b) + b * dl / avgdl))
        }
      }
      (id, cs.map(_.getOrElse(0.0)).reduceLeft(_ + _), cs)
    }.filter(_._3.exists(_.isDefined))
      .sortBy { case (id, score, _) => (-score, id) }.take(50)
      .map { case (id, score, cs) =>
        (id, score, cs.map(_.map(Double.box).orNull).toList) }
    val got = TfIdf.bm25TopK(spark, dir).collect().map { r =>
      (r.getLong(0), r.getDouble(1),
        (2 to 4).map(i =>
          if (r.isNullAt(i)) null else Double.box(r.getDouble(i))).toList)
    }.toList
    assert(got == expected.toList)
  }

  test("phrase search: positional adjacency, per-doc occurrence counts") {
    import spark.implicits._
    import graft.text.PhraseSearch
    // "x y" occurs 3 times across the corpus (twice in doc 1, once in
    // doc 3) and is the top bigram; doc 2 never matches
    val docs = Seq(
      (1L, "x y x y z"), (2L, "a b"), (3L, "x y q"))
      .toDF("doc_id", "text")
    val out = PhraseSearch.topBigramMatches(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L) == (("x", "y", 2L)))
    assert(out(3L) == (("x", "y", 1L)))
    // postings carry raw-array 0-based positions
    val p = PhraseSearch.postings(
      docs.where(org.apache.spark.sql.functions.col("doc_id") === 1L))
      .collect().map(r => r.getInt(1) -> r.getString(2)).toMap
    assert(p == Map(0 -> "x", 1 -> "y", 2 -> "x", 3 -> "y", 4 -> "z"))
  }
}
