package graft

import graft.text.{Bpe, WordPiece}

class WordPieceSpec extends SparkSuite {

  private def types(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("word", "freq")
  }

  test("the likelihood rule diverges from BPE's frequency rule") {
    // "aaab": pair counts (a,a)=20, (a,b)=10; symbol counts a=30, b=10.
    // BPE picks (a,a) (most frequent). WordPiece compares
    // 20/(30·30) = 1/45 against 10/(30·10) = 1/30 and picks (a,b) —
    // the rare-symbol pair with the higher likelihood lift.
    val t = types("aaab" -> 10L)
    val wp = WordPiece.trainMergesFrom(spark, t, 2)
      .orderBy("step").collect()
    assert(wp.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("a", "b"), ("a", "ab")))
    val bpe = Bpe.trainMergesFrom(spark, t, 1).collect()
    assert((bpe.head.getString(1), bpe.head.getString(2)) == ("a", "a"))
  }

  test("the selection evidence columns carry the deciding counts") {
    val wp = WordPiece.trainMergesFrom(spark, types("aaab" -> 10L), 1)
      .collect().head
    // (a,b): pair count 10, left count a=30, right count b=10
    assert((wp.getLong(3), wp.getLong(4), wp.getLong(5)) == (10L, 30L, 10L))
  }

  test("equal scores tie-break to the lexicographically smallest pair") {
    // (u,v) and (x,y) have identical counts everywhere — the total
    // order must pick (u,v)
    val wp = WordPiece.trainMergesFrom(
      spark, types("xy" -> 5L, "uv" -> 5L), 1).collect().head
    assert((wp.getString(1), wp.getString(2)) == ("u", "v"))
  }

  test("training stops cleanly when no pairs remain") {
    // single-symbol words have no adjacent pairs after the first merge
    val wp = WordPiece.trainMergesFrom(spark, types("ab" -> 3L), 5)
      .orderBy("step").collect()
    assert(wp.length == 1)
    assert((wp.head.getString(1), wp.head.getString(2)) == ("a", "b"))
  }

  test("the overflow guard fails loud past the 2^21 symbol-mass bound") {
    val big = types("abcdefghij" -> (1L << 18))
    val e = intercept[IllegalArgumentException] {
      WordPiece.trainMergesFrom(spark, big, 1)
    }
    assert(e.getMessage.contains("overflow"))
  }
}
