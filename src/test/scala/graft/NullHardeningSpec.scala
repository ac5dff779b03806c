package graft

import org.apache.spark.sql.functions._

import graft.text.{NearDup, TextFunctions}

/** Degenerate-input hardening for the text operators: nulls, empty, and
  * whitespace-only documents must flow through (null-propagate or produce
  * sane zeros), never throw — a 100 TB corpus always contains them.
  */
class NullHardeningSpec extends SparkSuite {

  private def weird = {
    import spark.implicits._
    Seq(
      (1L, "normal text with several words here"),
      (2L, ""),
      (3L, "   "),
      (4L, null.asInstanceOf[String]),
      (5L, "x")
    ).toDF("doc_id", "text")
  }

  test("text stats survive empty/whitespace/null documents") {
    val out = weird.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("toks"),
      TextFunctions.subwordCount(col("text")).as("subs"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.qualityScore(col("text")).as("q"))
      .collect().sortBy(_.getLong(0))
    assert(out.length == 5)
    assert(out(0).getInt(1) == 6)
    assert(out(3).isNullAt(1) && out(3).isNullAt(3)) // null text → null stats
    assert(out(1).isNullAt(4)) // empty doc → null quality, not a crash
    // empty/whitespace fingerprints agree (both canonicalize to "")
    assert(out(1).getString(3) == out(2).getString(3))
  }

  test("minhash signatures handle sub-shingle-length and null docs") {
    val sigs = NearDup.minhashSignatures(weird).collect()
    // null text yields no tokens → no signature row; the rest sign fine
    assert(sigs.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 5L))
    assert(sigs.forall(_.getSeq[Long](1).length == 32))
  }

  test("langid stays total on degenerate docs") {
    val scores = graft.text.TextFunctions.langMarkers.map { case (l, _) =>
      l -> TextFunctions.langScore(col("text"), l) }.toMap
    val out = weird.select(col("doc_id"),
      TextFunctions.langPredict(scores).as("lang")).collect()
    assert(out.count(r => !r.isNullAt(1)) >= 4) // all non-null docs predicted
  }
}
