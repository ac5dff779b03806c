package graft

import org.apache.spark.sql.DataFrame

import graft.text.NearDup

/** Pins the exact-substring span semantics (anchor diagonals +
  * gaps-and-islands) on hand-built corpora: offsets and lengths of the
  * maximal shared token runs, island splitting at a single-token edit,
  * the minSpan floor, and the hot-anchor cap guard.
  */
class SubstringSpansSpec extends SparkSuite {

  private def writeDocs(name: String, docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = graft.util.Scratch.dir(name).toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  // globally unique filler so no accidental anchor collisions
  private def toks(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  private val shared = toks("s", 30)

  test("one maximal shared run is reported with both start offsets") {
    val a = (toks("a", 10) ++ shared.take(15) ++ toks("b", 10)).mkString(" ")
    val b = (toks("c", 5) ++ shared.take(15) ++ toks("d", 20)).mkString(" ")
    val dir = writeDocs("subspan_one", Seq(1L -> a, 2L -> b))
    assert(rows(NearDup.substringSpans(spark, dir)) ==
      Set((1L, 2L, 10L, 5L, 15L)))
  }

  test("a single-token edit splits the run into two islands") {
    val a = shared.mkString(" ")                       // s0..s29
    val b = (shared.take(15) ++ Seq("EDIT") ++ shared.drop(16)).mkString(" ")
    val dir = writeDocs("subspan_split", Seq(1L -> a, 2L -> b))
    // verbatim runs: s0..s14 (15 tokens, both at pos 0) and s16..s29
    // (14 tokens, both at pos 16)
    assert(rows(NearDup.substringSpans(spark, dir)) ==
      Set((1L, 2L, 0L, 0L, 15L), (1L, 2L, 16L, 16L, 14L)))
  }

  test("runs under minSpan are not reported") {
    val a = (toks("a", 10) ++ shared.take(11) ++ toks("b", 10)).mkString(" ")
    val b = (toks("c", 10) ++ shared.take(11) ++ toks("d", 10)).mkString(" ")
    val dir = writeDocs("subspan_short", Seq(1L -> a, 2L -> b))
    assert(NearDup.substringSpans(spark, dir, minSpan = 12).isEmpty)
  }

  test("anchors over the corpus-wide cap are dropped whole") {
    // 60 identical 20-token docs: every anchor occurs 60 > 50 times
    val text = shared.take(20).mkString(" ")
    val dir = writeDocs("subspan_cap",
      (1L to 60L).map(i => i -> text))
    assert(NearDup.substringSpans(spark, dir).isEmpty)
    // with the cap lifted, all 60*59/2 pairs report the full-doc span
    val lifted = NearDup.substringSpans(spark, dir, maxAnchor = 100)
    assert(lifted.count() == 60L * 59 / 2)
    assert(rows(lifted.limit(1)).forall {
      case (_, _, as, bs, len) => as == 0L && bs == 0L && len == 20L })
  }

  test("minSpan below the shingle width is rejected") {
    intercept[IllegalArgumentException] {
      NearDup.substringSpans(spark, "/nonexistent", w = 8, minSpan = 7)
    }
  }
}
