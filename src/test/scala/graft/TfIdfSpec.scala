package graft

import java.util.Locale

import graft.model.Tables
import graft.text.TfIdf

/** tf-idf against a full driver recompute: same tokenizer, same linear
  * idf, same (score desc, token asc) cut — every emitted row and rank
  * must agree exactly.
  */
class TfIdfSpec extends SparkSuite {

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
}
