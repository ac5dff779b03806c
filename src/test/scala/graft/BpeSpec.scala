package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE tokenizer training against the classic hand-worked example
  * (low×5, lower×2, newest×6, widest×3 — Sennrich et al. 2016 §3.2):
  * merge order and counts are fully determined, including the
  * lexicographic tiebreaks, so the learned table is asserted exactly.
  */
class BpeSpec extends SparkSuite {

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val d = graft.util.Scratch.dir("bpe_fixture")
    Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(d.resolve("documents.parquet").toString)
    d.toString
  }

  test("learned merges match the hand computation, tiebreaks included") {
    val merges = Bpe.trainMerges(spark, fixtureDir, iters = 4)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pair counts: (e,s)=9 (newest+widest) ties (s,t)=9 -> 'e' < 's';
    // then (es,t)=9; then (l,o)=7 ties (o,w)=7 -> 'l' < 'o'; then (lo,w)=7
    assert(merges.toSeq == Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L)))
  }

  test("training is deterministic across runs") {
    val a = Bpe.trainMerges(spark, fixtureDir, iters = 4).collect().toSeq
    val b = Bpe.trainMerges(spark, fixtureDir, iters = 4).collect().toSeq
    assert(a == b)
  }

  test("tokenizeWith replays the merges: 'lowest' -> [low, est]") {
    import spark.implicits._
    val merges = Seq("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w")
    val toks = Bpe.tokenizeWith(Seq("lowest", "newer", "aaa").toDF("word"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(toks("lowest") == List("low", "est"))
    // merges that don't apply leave characters intact ('newer': only
    // none of the four pairs occur adjacently except... check by hand:
    // n e w e r -> (e,s) no, (es,t) no, (l,o) no, (lo,w) no)
    assert(toks("newer") == List("n", "e", "w", "e", "r"))
    // greedy non-overlap: merge (a,a) on "aaa" would give [aa, a]; with
    // this merge list 'aaa' stays single chars
    assert(toks("aaa") == List("a", "a", "a"))
  }

  test("merge fold is greedy left-to-right non-overlapping") {
    import spark.implicits._
    val toks = Bpe.tokenizeWith(Seq("aaaa", "aaa").toDF("word"),
      Seq("a" -> "a")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(toks("aaa") == List("aa", "a"))
    assert(toks("aaaa") == List("aa", "aa"))
  }

  test("incremental word-type partials: fold equals one-shot; re-delivery no-ops") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val counts = graft.util.Scratch.dir("bpe_partials").toString
    val docs = graft.model.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val batches = Seq(
      docs.where(col("doc_id") % 3 === 0),
      docs.where(col("doc_id") % 3 === 1),
      docs.where(col("doc_id") % 3 === 2))
    batches.zipWithIndex.foreach { case (b, i) =>
      Bpe.appendWordTypeBatch(spark, counts, b, batchId = Some(i.toLong)) }
    // at-least-once re-delivery of every batch must change nothing
    batches.zipWithIndex.foreach { case (b, i) =>
      Bpe.appendWordTypeBatch(spark, counts, b, batchId = Some(i.toLong)) }
    val incr = Bpe.trainMergesFrom(spark,
      Bpe.wordTypesFromPartials(spark, counts), iters = 4).collect().toSeq
    val oneShot = Bpe.trainMerges(spark, dir, iters = 4).collect().toSeq
    assert(incr == oneShot)
    assert(incr.nonEmpty)
  }

  test("MaxMatch takes the longest prefix greedily and falls back per character") {
    import spark.implicits._
    val words = Seq("abcd", "fastest", "x9y").toDF("word")
    val vocab = ('a' to 'z').map(_.toString) ++ Seq("ab", "abc", "cd", "fast", "st")
    val got = Bpe.maxMatchTokenize(words, vocab).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // greedy prefers "abc" over the globally nicer ab|cd split —
    // longest-match semantics, not optimal segmentation
    assert(got("abcd") == List("abc", "d"))
    assert(got("fastest") == List("fast", "e", "st"))
    // '9' is out of vocabulary: single-character fallback keeps going
    assert(got("x9y") == List("x", "9", "y"))
  }

  test("corpus that runs out of pairs stops early with the merges it found") {
    import spark.implicits._
    val d = graft.util.Scratch.dir("bpe_tiny")
    Seq((0L, "ab ab cd")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(d.resolve("documents.parquet").toString)
    val merges = Bpe.trainMerges(spark, d.toString, iters = 8).collect()
    // (a,b)=2 then (c,d)=1 and then nothing left to merge
    assert(merges.length == 2)
    assert(merges.map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      == Seq(("a", "b", 2L), ("c", "d", 1L)))
  }
}
