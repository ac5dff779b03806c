package graft

import graft.text.TextRank

class TextRankSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("the bridging passage outranks the periphery") {
    // chunk 0 and chunk 2 each share 4 words with chunk 1 and nothing
    // with each other — all in-mass flows to the center
    val d = docs(1L ->
      ("a b c d e f g h " + // chunk 0
       "a b c d q r s t " + // chunk 1 (bridge)
       "q r s t u v w x")) // chunk 2
    val out = TextRank.topPassagesFrom(d).collect()
      .map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(out(1L) == 1L) // rank 1 = the bridge chunk
    assert(out(2L) != 1L)
  }

  test("an isolated single-chunk doc converges to bare teleport") {
    val out = TextRank.topPassagesFrom(docs(7L -> "hello world"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((7L, 0L, 1L)))
    assert(r.getDouble(3) == 0.15)
  }

  test("per-doc graphs are independent: adding a doc never moves another's ranks") {
    val base = docs(1L -> ("x y z w a b c d " +
      "a b c d e f g h " +
      "e f g h p q r s"))
    val both = docs(
      1L -> ("x y z w a b c d " +
        "a b c d e f g h " +
        "e f g h p q r s"),
      2L -> "x y z w x y z w x y z w a b c d")
    def ranks(d: org.apache.spark.sql.DataFrame) =
      TextRank.topPassagesFrom(d).where("doc_id = 1").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(ranks(base) == ranks(both))
  }
}
