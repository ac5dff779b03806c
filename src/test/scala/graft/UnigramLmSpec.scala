package graft

import org.apache.spark.sql.functions._

import graft.text.UnigramLm

/** The unigram-LM Viterbi rules, pinned on hand-computable fixtures:
  * minimal total integer cost, then fewest pieces, then the
  * longest-LAST-piece order the longest-first strict-better chain
  * produces — plus the coverage property (single chars always in
  * vocabulary ⇒ every word segments, and the segmentation concatenates
  * back to the word).
  */
class UnigramLmSpec extends SparkSuite {

  private def seg(word: String, vocab: Map[String, Long]): (String, Long, Long) = {
    import spark.implicits._
    val costs = map(vocab.toSeq.sortBy(_._1)
      .flatMap { case (p, c) => Seq(lit(p), lit(c)) }: _*)
    val r = Seq(word).toDF("word")
      .select(UnigramLm.viterbi(col("word"), costs).as("s"))
      .select(col("s.seg"), col("s.np"), col("s.c")).head()
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  test("viterbi picks the min-cost segmentation over a hand vocab") {
    val vocab = Map[String, Long]("a" -> 5L, "b" -> 5L, "c" -> 5L,
      "ab" -> 3L, "abc" -> 4L)
    // abc|ab = 4+3 = 7 beats ab|c|ab = 11 and all-chars = 25
    assert(seg("abcab", vocab) == (("abc|ab", 2L, 7L)))
  }

  test("cost tie broken by fewer pieces") {
    val vocab = Map[String, Long]("a" -> 3L, "b" -> 3L, "ab" -> 6L)
    // 'ab' (cost 6, 1 piece) vs 'a|b' (cost 6, 2 pieces)
    assert(seg("ab", vocab) == (("ab", 1L, 6L)))
  }

  test("full (cost, pieces) tie keeps the longest LAST piece") {
    val vocab = Map[String, Long]("a" -> 2L, "aa" -> 4L, "aaa" -> 6L)
    // a|aaa, aa|aa, aaa|a all cost 8 with 2 pieces; the longest-first
    // strict-better chain at the final position keeps a|aaa
    assert(seg("aaaa", vocab) == (("a|aaa", 2L, 8L)))
  }

  test("driver-side EM equals the distributed formulation bit for bit") {
    // rebuild the pre-hoist distributed loop from the public pieces
    // (seedCounts / segmented / usageCounts) and require the collected
    // artifact to match trainLoop's driver fold EXACTLY — this is the
    // hash-gate contract the hoist must preserve
    val types = UnigramLm.trainTypes(spark, sf("sf0.001")).localCheckpoint()
    assert(UnigramLm.trainLoop(types) == distributedEm(types))
  }

  test("EM parity holds on supplementary (non-BMP) characters") {
    import spark.implicits._
    // 𝕒 (U+1D552) and 😀 (U+1F600) are surrogate PAIRS in UTF-16:
    // String.length counts them as 2 where Spark's length/substr count
    // 1 — the driver fold must slice by code point or the paths diverge
    val types = Seq(("x𝕒y", 5L), ("𝕒𝕒", 3L),
      ("ab😀", 4L), ("😀😀ab", 2L),
      ("plain", 6L))
      .toDF("word", "freq").localCheckpoint()
    val trained = UnigramLm.trainLoop(types)
    assert(trained == distributedEm(types))
    // the single-char backbone counts CODE POINTS: 𝕒 and 😀 are chars
    val singles = trained.map(_._1)
      .filter(p => p.codePointCount(0, p.length) == 1).toSet
    assert(singles.contains("𝕒") && singles.contains("😀"))
  }

  test("trainLoop fails loudly past its collected-digest bound") {
    import spark.implicits._
    val big = spark.range(UnigramLm.MaxTrainTypes + 1)
      .select(concat(lit("w"), col("id")).as("word"), lit(1L).as("freq"))
    val e = intercept[IllegalArgumentException](UnigramLm.trainLoop(big))
    assert(e.getMessage.contains("cap the relation upstream"))
  }

  private def distributedEm(
      types: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] = {
      val seed = UnigramLm.seedCounts(types)
      val chars0 = seed.where(length(col("piece")) === 1)
      val mult0 = seed.where(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece").asc).limit(UnigramLm.SeedMultis)
      var counts: Seq[(String, Long)] = chars0.unionAll(mult0).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortBy { case (p, c) => (-c, p) }
      var result: Seq[(String, Long, Long)] = Seq.empty
      for (it <- 1 to UnigramLm.Iters) {
        val total = counts.map(_._2).sum
        def bl(x: Long) = 64L - java.lang.Long.numberOfLeadingZeros(math.max(x, 1L))
        val vc = counts.map { case (p, c) => (p, c, bl(total) - bl(c) + 1L) }
        val usage = UnigramLm.usageCounts(UnigramLm.segmented(types,
          vc.map(t => (t._1, t._3)))).collect()
          .map(r => (r.getString(0), r.getLong(1))).toMap
        if (it < UnigramLm.Iters) {
          // "char" means ONE CODE POINT — Spark's length(piece) === 1,
          // which counts surrogate pairs as a single char
          def cpLen(p: String) = p.codePointCount(0, p.length)
          val chars = counts.collect { case (p, _) if cpLen(p) == 1 =>
            (p, usage.getOrElse(p, 0L)) }
          val multis = usage.toSeq
            .filter { case (p, c) => cpLen(p) > 1 && c > 0 }
            .sortBy { case (p, c) => (-c, p) }.take(UnigramLm.KeepMultis)
          counts = chars ++ multis
        } else {
          result = vc.map { case (p, _, cost) => (p, usage.getOrElse(p, 0L), cost) }
        }
      }
      result
  }

  test("trained artifact: coverage, char backbone, bounded vocab") {
    val dir = sf("sf0.001")
    val vocab = UnigramLm.trainedVocab(spark, dir)
    val pieces = vocab.map(_._1).toSet
    assert(vocab.nonEmpty)
    // every piece distinct, vocabulary bounded by chars + KeepMultis
    assert(vocab.size == pieces.size)
    assert(vocab.count(_._1.length > 1) <= UnigramLm.KeepMultis)
    assert(vocab.forall(_._3 >= 1L)) // costs are positive integers
    // chars survive pruning: every multi-char piece is buildable
    val chars = pieces.filter(_.length == 1)
    assert(pieces.forall(_.forall(ch => chars.contains(ch.toString))))

    // inference: every word reconstructs from its segmentation
    val toks = UnigramLm.tokenizeTable(spark, dir).collect()
    assert(toks.nonEmpty)
    assert(toks.forall(r =>
      r.getString(1).replace("|", "") == r.getString(0)))
    // and multi-char pieces actually get used somewhere
    assert(toks.exists(r => r.getString(1).split('|').exists(_.length > 1)))
  }

  test("tokenizer stats: both families, shared char mass, ratio >= 1") {
    val out = UnigramLm.tokenizerStats(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set("bpe", "unigram"))
    // identical type table on both sides: same types, same char mass
    assert(out("bpe")._1 == out("unigram")._1)
    assert(out("bpe")._2 == out("unigram")._2)
    // a token is at least one char, so compression ratio >= 1
    assert(out.values.forall(v => v._4 >= 1.0 && v._3 >= 1L))
  }
}
