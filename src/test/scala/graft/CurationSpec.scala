package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.text.{Curation, NearDup}

/** Curation-operator properties: determinism, bounds, and the cluster
  * invariants the dedup pipeline depends on.
  */
class CurationSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("hash sample is deterministic and roughly the target fraction") {
    val a = Curation.hashSample(spark, dir).collect().map(_.getLong(0)).sorted
    val b = Curation.hashSample(spark, dir).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    val n = Tables.documents(spark, dir).count().toDouble
    // 26/256 ≈ 10.2% target; allow generous binomial slack at small n
    assert(a.length / n > 0.04 && a.length / n < 0.20)
  }

  test("train/val/test split covers every doc exactly once, ~75/12.5/12.5") {
    val split = Curation.trainValTest(spark, dir)
    val n = Tables.documents(spark, dir).count()
    assert(split.count() == n)
    val frac = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n.toDouble).toMap
    assert(frac.keySet == Set("train", "val", "test"))
    assert(frac("train") > 0.6 && frac("train") < 0.9)
  }

  test("group split never straddles; doc-level split demonstrably leaks") {
    val rep = Curation.groupSplit(spark, dir).collect()
    assert(rep.nonEmpty)
    // the guarantee: every (lang, source) group lands in exactly one split
    assert(rep.forall(_.getLong(4) == 1L))
    // the leak it prevents: at least one multi-doc group straddles splits
    // under the per-doc rule
    assert(rep.exists(r => r.getLong(2) > 1L && r.getLong(3) > 1L))
    // the group split is one of the three classes
    assert(rep.forall(r => Set("train", "val", "test")(r.getString(5))))
  }

  test("stupid backoff: held-out half scored, backoff arm provably fires") {
    import org.apache.spark.sql.functions._
    val out = Curation.backoffLmScore(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
    val nEval = docs.where(col("doc_id") % 2 === 1 && size(col("t")) >= 2)
      .count()
    assert(out.length.toLong == nEval)
    // a bigram score is a conditional frequency, the backoff arm a
    // discounted unigram frequency — both in [0, 1]
    assert(out.forall { r =>
      val v = r.getDouble(2); v >= 0.0 && v <= 1.0 && r.getLong(1) >= 1L
    })
    // non-vacuity: the eval half contains bigrams the train half never
    // saw, so the backoff arm actually executes
    def bigrams(d: org.apache.spark.sql.DataFrame) =
      d.where(size(col("t")) >= 2)
        .select(explode(sequence(lit(0), size(col("t")) - 2)).as("i"), col("t"))
        .select(element_at(col("t"), col("i") + 1).as("w1"),
          element_at(col("t"), col("i") + 2).as("w2"))
    val unseen = bigrams(docs.where(col("doc_id") % 2 === 1))
      .join(bigrams(docs.where(col("doc_id") % 2 === 0)).distinct(),
        Seq("w1", "w2"), "left_anti").count()
    assert(unseen > 0L)
  }

  test("kneser-ney: hand-computed interpolated scores, unseen rules pinned") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // train doc 0: "a b a c" — c2: ab=1 ba=1 ac=1; c1: a(n1=2,t1=2)
    // b(1,1); cont: a=1 b=1 c=1; nb=3 bigram types
    val toks = Seq(
      (0L, Seq("a", "b", "a", "c")),
      (1L, Seq("a", "b", "d")), // eval: seen (a,b) + unseen-w2 (b,d)
      (3L, Seq("z", "q")))      // eval: unseen context z, unseen cont q
      .toDF("doc_id", "t")
    val out = Curation.knLmScoreOf(toks).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // (a,b): (1−0.75)/2 + (0.75·2/2)·(1/3) = 0.125 + 0.25 = 0.375
    // (b,d): 0 + (0.75·1/1)·(0/3) = 0 → doc mean = 0.1875
    assert(out(1L)._1 == 2L)
    assert(math.abs(out(1L)._2 - 0.1875) < 1e-9)
    // unseen context falls to the continuation prob alone; q never
    // continues anything → 0
    assert(out(3L) == ((1L, 0.0)))
  }

  test("FIM split: cut points, coin, and PSM bytes reproduce an independent recompute") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fixtures = Seq((7L, "hello world infilling"), (8L, "abc"),
      (9L, ""), (10L, "x"))
    val out = Curation.fimSplitOf(fixtures.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    fixtures.foreach { case (id, text) =>
      val h = md5hex(id.toString)
      val applied = Integer.parseInt(h.substring(0, 1), 16) < 8
      val l = text.length.toLong
      val p1 = java.lang.Long.parseLong(h.substring(1, 16), 16) % (l + 1)
      val p2 = java.lang.Long.parseLong(h.substring(16, 31), 16) % (l + 1)
      val (lo, hi) = (math.min(p1, p2).toInt, math.max(p1, p2).toInt)
      val psm = s"<PRE>${text.substring(0, lo)}" +
        s"<SUF>${text.substring(hi)}<MID>${text.substring(lo, hi)}"
      val expect =
        if (applied) (true, lo.toLong, (hi - lo).toLong, l - hi, md5hex(psm))
        else (false, l, 0L, 0L, md5hex(text))
      assert(out(id) == expect, s"doc $id")
    }
    // both coin arms exercised across the fixture ids
    assert(out.values.exists(_._1) && out.values.exists(!_._1))
  }

  test("span corruption reproduces an independent greedy recompute") {
    import spark.implicits._
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // enough ids × words that both coin arms and the in-span branch fire
    val fixtures = (1L to 40L).map(id =>
      id -> "the quick brown fox jumps over the lazy dog again and again")
    val out = Curation.spanCorruptionOf(fixtures.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    fixtures.foreach { case (id, text) =>
      val words = text.toLowerCase.trim.split("\\s+")
      var nf = 1; var k = 0; var m = 0
      val inp = new StringBuilder; val tgt = new StringBuilder
      for (i <- 1 to words.length) {
        val w = words(i - 1)
        if (i < nf) { m += 1; tgt.append(" " + w) }
        else if (md5hex(s"$id:$i").charAt(0) == '0') {
          inp.append(s" <X$k>"); tgt.append(s" <X$k> $w")
          k += 1; m += 1; nf = i + 3
        } else inp.append(" " + w)
      }
      val expect = (words.length.toLong, k.toLong, m.toLong,
        md5hex(inp.toString.dropWhile(_ == ' ')),
        md5hex(tgt.toString.dropWhile(_ == ' ')))
      assert(out(id) == expect, s"doc $id")
    }
    // the fold's three branches are all live across the fixture
    assert(out.values.exists(_._2 > 0) && out.values.exists(_._2 == 0))
    assert(out.values.exists(v => v._3 > v._2)) // in-span continuations
  }

  test("source quota never exceeds the cap and keeps full small groups") {
    val q = Curation.sourceQuota(spark, dir, quota = 20)
    val byGroup = q.groupBy("lang", "source").count().collect()
    assert(byGroup.forall(_.getLong(2) <= 20))
    // groups smaller than the quota survive whole
    val sizes = Tables.documents(spark, dir)
      .groupBy("lang", "source").count()
      .withColumnRenamed("count", "total")
    val kept = q.groupBy("lang", "source").count()
    val joined = sizes.join(kept, Seq("lang", "source"), "left_outer").collect()
    assert(joined.forall { r =>
      val total = r.getLong(2); val k = if (r.isNullAt(3)) 0L else r.getLong(3)
      k == math.min(total, 20L)
    })
  }

  test("PII redaction is the identity on PII-free text") {
    val r = Curation.redactPii(spark, dir)
      .join(Tables.documents(spark, dir), "doc_id")
      .where(col("n_emails") === 0 && col("n_phones") === 0)
      .where(col("redacted_fp") =!= md5(col("text")))
    assert(r.count() == 0)
  }

  test("weighted sample: deterministic, accepts exactly u < quality") {
    val rows = Curation.weightedSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    val again = Curation.weightedSample(spark, dir).collect().map(_.getLong(0))
    assert(rows.map(_._1).sorted.sameElements(again.sorted))
    assert(rows.forall { case (_, u, w) => u < w && u >= 0.0 && u < 1.0 })
    // the prior bites: some docs kept, some dropped
    val n = Tables.documents(spark, dir).count()
    assert(rows.length > 0 && rows.length < n)
    // acceptance decisions recompute off-Spark: u is the scaled 8-hex-digit
    // md5 prefix of doc_id — a doc is in the sample iff u < its quality
    rows.foreach { case (id, u, _) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      assert(java.lang.Long.parseLong(hex, 16) / 4294967296.0 == u)
    }
  }

  test("top tokens are ranked by a total (count desc, token asc) order") {
    val rows = Curation.topTokens(spark, dir, k = 20).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.zip(rows.tail).forall { case ((ta, na), (tb, nb)) =>
      na > nb || (na == nb && ta < tb) })
  }

  test("sequence packing: contiguous fill, driver-recomputed offsets agree") {
    val budget = 512
    val packed = Curation.packSequences(spark, dir, budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // recompute the greedy fill off Spark: per lang in doc_id order
    val expected = packed.groupBy(_._2).toSeq.flatMap { case (_, docs) =>
      var off = 0L
      docs.sortBy(_._1).toSeq.map { case (id, lang, n, _) =>
        val pid = off / budget; off += n; (id, lang, n, pid)
      }
    }.toSet
    assert(packed.toSet == expected)
    // packs are contiguous: within a lang, pack_id is non-decreasing
    packed.groupBy(_._2).values.foreach { docs =>
      val ordered = docs.sortBy(_._1).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
    }
  }

  test("clusters stay bounded on an adversarial all-identical corpus") {
    import spark.implicits._
    // 600 identical docs in one (lang, source) bucket: the 500-doc bucket
    // cap drops the bucket whole, so the pair graph — and therefore the
    // cluster relation — is EMPTY rather than one quadratic mega-cluster.
    // At 100 TB this is the property that keeps CC from melting down on
    // boilerplate-dominated corpora.
    val docs = (0 until 600)
      .map(i => (i.toLong, "en", "web", "the same boilerplate text"))
      .toDF("doc_id", "lang", "source", "text")
    val pairs = graft.text.NearDup.ngramJaccardPairs(spark, dirFromDf(docs), 0.5)
    assert(pairs.count() == 0)
  }

  /** Write an ad-hoc documents table to scratch so table-loading
    * operators can run against it.
    */
  private def dirFromDf(docs: org.apache.spark.sql.DataFrame): String = {
    val d = graft.util.Scratch.dir("curation_adv")
    docs.write.mode("overwrite").parquet(d.resolve("documents.parquet").toString)
    d.toString
  }

  test("chunking: starts every stride, short tail kept, text reconstructs") {
    import spark.implicits._
    val d = dirFromDf(Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" "), "en", "s", 0L),
      (2L, "only three tokens", "en", "s", 0L),
      (3L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val chunks = Curation.chunkDocs(spark, d, window = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byDoc = chunks.groupBy(_._1)
    // 100 tokens → starts 0/48/96 → lengths 64/52/4
    assert(byDoc(1L).sortBy(_._2).map(_._4).toSeq == Seq(64L, 52L, 4L))
    // chunk 0 is the document prefix; the tail chunk is the suffix
    assert(byDoc(1L).minBy(_._2)._3 ==
      (1 to 64).map(i => s"t$i").mkString(" "))
    assert(byDoc(1L).maxBy(_._2)._3 == "t97 t98 t99 t100")
    // short and empty docs still yield exactly one chunk
    assert(byDoc(2L).toSeq == Seq((2L, 0L, "only three tokens", 3L)))
    assert(byDoc(3L).map(t => (t._2, t._4)).toSeq == Seq((0L, 1L)))
  }

  test("decontamination flags exactly the train docs sharing an eval 5-gram") {
    import spark.implicits._
    // md5 first nibbles: 1→c 2→c 4→a (train, <= 'd'); 3→e 5→e (eval)
    val shared = "a b c d e f g h"
    val d = dirFromDf(Seq(
      (1L, shared, "en", "s", 0L),              // train, identical to eval doc 3
      (2L, "z y x w v u t s", "en", "s", 0L),   // train, disjoint
      (4L, "a b c", "en", "s", 0L),             // train, too short for a 5-gram
      (3L, shared, "en", "s", 0L),              // eval
      (5L, "p q r s t u v w", "en", "s", 0L))   // eval
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Curation.decontaminate(spark, d, n = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet == Set(1L, 2L, 4L))       // eval docs never emitted
    assert(out(1L) == (4L, true))               // 8 tokens → 4 shared 5-grams
    assert(out(2L) == (0L, false))
    assert(out(4L) == (0L, false))
  }

  test("contamination pairs: containment attributes the leak to the right eval doc") {
    import spark.implicits._
    // nibbles: 1→c 2→c (train); 3→e 5→e (eval). doc 1 = eval doc 3 plus
    // two extra tokens: 6 train 5-grams, 4 shared with doc 3, none with 5
    val shared = "a b c d e f g h"
    val d = dirFromDf(Seq(
      (1L, shared + " i j", "en", "s", 0L),
      (2L, "z y x w v u t s", "en", "s", 0L),
      (3L, shared, "en", "s", 0L),
      (5L, "p q r s t u v w", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = Curation.contaminationPairs(spark, d, n = 5, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set((1L, 3L)))      // the only leaking pair
    assert(out((1L, 3L)) == (4L, 4.0 / 6.0)) // 4 of doc 1's 6 grams leak
  }

  test("rake keywords: degree/freq hand example, stopword split, phrase tiebreak") {
    import spark.implicits._
    // runs: [deep learning] | of | [deep models]
    // deep: freq 2, degree 2+2=4 → 2.0; learning/models: freq 1, degree 2 → 2.0
    // both phrases score 4.0 (4_000_000 micro) — tie broken phrase-asc
    val d = dirFromDf(Seq(
      (1L, "deep learning of deep models", "en", "s", 0L),
      (2L, "the of and", "en", "s", 0L))  // all stopwords → no phrases
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = graft.text.TextFunctions.textRakeKeywords(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set((1L, 1L), (1L, 2L)))
    assert(out((1L, 1L)) == (("deep learning", 2L, 4000000L)))
    assert(out((1L, 2L)) == (("deep models", 2L, 4000000L)))
  }

  test("winnowing: exact windowed rightmost-argmin, shared runs share a fingerprint") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog tonight"
    val b = "intro words then the quick brown fox jumps over the lazy dog tonight"
    val c = "completely different vocabulary with no overlap at all here"
    val d = dirFromDf(Seq((1L, a), (2L, b), (3L, c), (4L, "too short"))
      .map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = graft.text.TextFunctions.textWinnowing(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver recompute: trigram rolling hashes, every window of 4, pick
    // the rightmost min, dedupe
    def rh(t: String): Long = {
      var h = 1125899906842597L
      t.getBytes("UTF-8").foreach(bb => h = 31 * h + (bb & 0xFF)); h
    }
    def winnow(text: String, w: Int = 4): Set[(Long, Long)] = {
      val tk = text.toLowerCase.trim.split("\\s+").toSeq
      val hs = tk.sliding(3).filter(_.size == 3).map(g => rh(g.mkString(" "))).toVector
      if (hs.isEmpty) Set.empty
      else (0 to math.max(hs.length - w, 0)).flatMap { j =>
        val win = hs.slice(j, math.min(j + w, hs.length))
        val m = win.min
        val p = j + win.lastIndexOf(m)
        Some((p.toLong, hs(p)))
      }.toSet
    }
    Seq(1L -> a, 2L -> b, 3L -> c).foreach { case (id, t) =>
      assert(out.filter(_._1 == id).map(r => (r._2, r._3)).toSet == winnow(t),
        s"doc $id")
    }
    assert(!out.exists(_._1 == 4L)) // < 3 tokens → no trigrams
    // the winnowing guarantee: docs sharing a ≥ w+2-token run share a
    // fingerprint HASH; the disjoint doc shares none
    val fp = out.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).toSet }
    assert((fp(1L) & fp(2L)).nonEmpty)
    assert((fp(1L) & fp(3L)).isEmpty)
  }

  test("secret scan: tainted ids fire the right detector, clean docs stay clean") {
    import spark.implicits._
    // ids: 3 → hex key; 5 → AWS key; 38 ≡ 3 (mod 7) AND ≡ 5 (mod 11)
    // → both; 1 → clean
    val d = dirFromDf(Seq(1L, 3L, 5L, 38L)
      .map(id => (id, "plain words only", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = graft.text.TextFunctions.textSecretScan(spark, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((0L, 0L, false)))
    assert(out(3L) == ((1L, 0L, true)))
    assert(out(5L) == ((0L, 1L, true)))
    assert(out(38L) == ((1L, 1L, true)))
  }

  test("dsir margin: exact discriminant matches a driver recompute, target scores positive") {
    import spark.implicits._
    // en docs share vocab {aa cc}; the de doc uses disjoint {xx} — the
    // discriminant must select the en docs and reject the de doc.
    // Tokens chosen bucket-collision-free (buckets 197/5/165) so the
    // sign argument is clean; a collision only blurs the margin, it
    // never breaks the exact-recompute assert
    val rows = Seq(
      (1L, "aa cc aa", "en", "s", 0L),
      (2L, "cc aa", "en", "s", 0L),
      (3L, "xx xx xx", "de", "s", 0L))
    val d = dirFromDf(rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    def rh(t: String): Long = {
      var h = 1125899906842597L
      t.getBytes("UTF-8").foreach(b => h = 31 * h + (b & 0xFF)); h
    }
    val toks = rows.map { case (id, t, lang, _, _) =>
      (id, lang, t.split(" ").toSeq.map(w => rh(w) & 255L)) }
    val all = toks.flatMap(_._3)
    val tgt = toks.filter(_._2 == "en").flatMap(_._3)
    def cnt(xs: Seq[Long]) = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (cr, ct) = (cnt(all), cnt(tgt))
    val expect = toks.map { case (id, lang, bs) =>
      id -> bs.map(b => ct.getOrElse(b, 0L) * all.size - cr(b) * tgt.size).sum
    }.toMap
    val out = graft.text.Curation.dsirMargin(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    rows.foreach { case (id, _, lang, _, _) =>
      assert(out(id)._1 == expect(id), s"doc $id")
      assert(out(id)._2 == (expect(id) > 0))
      assert((lang == "en") == (out(id)._1 > 0))
    }
  }

  test("bigram LM: hand counts, conditional division, continuation ranking") {
    import spark.implicits._
    // pairs: (a b)×2, (b a), (a c), (c b) — context a has 3 continuation
    // occurrences {b:2, c:1}; b and c have one each (the final b of doc
    // 1 and doc 2's b never continue — LM denominators count only
    // occurrences WITH a continuation)
    val d = dirFromDf(Seq(
      (1L, "a b a c b", "en", "s", 0L),
      (2L, "a b", "en", "s", 0L),
      (3L, "solo", "en", "s", 0L))  // one token → no bigrams
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = graft.text.TextFunctions.textBigramLm(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getString(1), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(("a", 1L)) == (("b", 2L, 3L, 2.0 / 3.0)))
    assert(out(("a", 2L)) == (("c", 1L, 3L, 1.0 / 3.0)))
    assert(out(("b", 1L)) == (("a", 1L, 1L, 1.0)))
    assert(out(("c", 1L)) == (("b", 1L, 1L, 1.0)))
    assert(out.size == 4) // 'solo' never enters: no continuation exists
  }

  test("ngram diversity: distinct/total trigram ratio per language") {
    import spark.implicits._
    // en: doc1 has trigrams [a b a, b a b, a b a] → 3 total, 2 distinct;
    // doc2 adds [x y z] → 4 total, 3 distinct. de: 1 total, 1 distinct.
    val d = dirFromDf(Seq(
      (1L, "a b a b a", "en", "s", 0L),
      (2L, "x y z", "en", "s", 0L),
      (3L, "k l m", "de", "s", 0L),
      (4L, "ab", "de", "s", 0L))  // too short → no trigrams
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = graft.text.TextFunctions.textNgramDiversity(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("en") == ((4L, 3L, 0.75)))
    assert(out("de") == ((1L, 1L, 1.0)))
  }

  test("repetition stats: hand values, null bigram guard, fold = groupBy mode") {
    import spark.implicits._
    val d = dirFromDf(Seq(
      (1L, "a a a b", "en", "s", 0L),
      (2L, "solo", "en", "s", 0L),
      (3L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rep = graft.text.TextFunctions.textRepetition(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    // "a a a b": 4 tokens 2 distinct → dup 0.5; mode a×3 → 0.75;
    // bigrams [a a, a a, a b] → top 2/3
    assert(rep(1L).getDouble(3) == 0.5)
    assert(rep(1L).getDouble(4) == 0.75)
    assert(math.abs(rep(1L).getDouble(5) - 2.0 / 3.0) < 1e-15)
    assert(!rep(1L).getBoolean(6))              // top-bigram 0.67 > 0.05
    // single-token and empty docs: no bigrams → null frac, null gate
    Seq(2L, 3L).foreach { id =>
      assert(rep(id).getLong(2) == 0L && rep(id).isNullAt(5) && rep(id).isNullAt(6))
    }
    // the per-row sorted fold agrees with the explode+groupBy mode on
    // real data (the formulation the oracle uses)
    val real = graft.text.TextFunctions.textRepetition(spark, dir)
      .select("doc_id", "top_word_frac")
    val tok = Tables.documents(spark, dir).select(col("doc_id"),
      explode(split(trim(col("text")), "\\s+")).as("w"))
    val mode = tok.groupBy("doc_id", "w").count()
      .groupBy("doc_id").agg(
        (max(col("count")).cast("double") / sum(col("count")))
          .as("expect_frac"))
    val joined = real.join(mode, Seq("doc_id"))
    assert(joined.count() == Tables.documents(spark, dir).count())
    assert(joined.where(col("top_word_frac") =!= col("expect_frac")).count() == 0)
  }

  test("winsorize: clipped within per-lang bounds, outlier flag consistent, corpus broadcast-joined") {
    val w = Curation.winsorize(spark, dir)
    val rows = w.collect()
    assert(rows.nonEmpty)
    // flag is exactly "clipping changed the value"
    rows.foreach { r =>
      val (n, clipped, out) = (r.getLong(2), r.getDouble(3), r.getBoolean(4))
      assert(out == (clipped != n.toDouble))
    }
    // some but not all rows clip at p05/p95 bounds
    val nOut = rows.count(_.getBoolean(4))
    assert(nOut > 0 && nOut < rows.length)
    // per-lang: clipping stays inside the observed value range, and the
    // outliers collapse onto at most two clip points (lo_b / hi_b)
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val lo = rs.map(_.getLong(2)).min.toDouble
      val hi = rs.map(_.getLong(2)).max.toDouble
      assert(rs.forall(r => r.getDouble(3) >= lo && r.getDouble(3) <= hi))
      assert(rs.filter(_.getBoolean(4)).map(_.getDouble(3)).distinct.size <= 2)
    }
    // the bounds side is broadcast — the corpus never shuffles
    assert(w.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("incremental vocabulary: partial folds equal one-shot; re-delivered batch no-ops") {
    import spark.implicits._
    val counts = graft.util.Scratch.dir("vocab_inc").resolve("c").toString
    val b1 = Seq(1L -> "alpha beta beta", 2L -> "beta gamma").toDF("doc_id", "text")
    val b2 = Seq(3L -> "alpha alpha delta").toDF("doc_id", "text")
    Curation.appendTokenCountBatch(spark, counts, b1, batchId = Some(0L))
    Curation.appendTokenCountBatch(spark, counts, b2, batchId = Some(1L))
    // sink restart re-delivers epoch 1: the marker must make it a no-op
    Curation.appendTokenCountBatch(spark, counts, b2, batchId = Some(1L))
    val got = Curation.topTokensFromPartials(spark, counts).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("alpha" -> 3L, "beta" -> 3L, "gamma" -> 1L, "delta" -> 1L))
  }

  test("span excision matches a driver recompute and agrees with the drop list") {
    val out = Curation.decontaminateSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    def nib(id: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      f"${md(0) & 0xFF}%02x".charAt(0)
    }
    def grams(tk: Seq[String]) =
      if (tk.size < 5) Seq.empty else tk.sliding(5).map(_.mkString(" ")).toSeq
    val evalG = docs.filter(d => nib(d._1) >= 'e')
      .flatMap(d => grams(d._2)).toSet
    val train = docs.filter(d => nib(d._1) <= 'd')
    assert(out.keySet == train.map(_._1).toSet)
    var excised = Set.empty[Long]
    train.foreach { case (id, tk) =>
      val covered = grams(tk).zipWithIndex.collect {
        case (g, p) if evalG(g) => p until (p + 5)
      }.flatten.toSet
      val kept = tk.zipWithIndex.collect {
        case (w, p) if !covered(p) => w }
      val (nTok, nRem, clean) = out(id)
      assert(nTok == tk.size.toLong, s"doc $id n_tokens")
      assert(nRem == covered.size.toLong, s"doc $id n_removed")
      assert(clean == kept.mkString(" "), s"doc $id clean_text")
      if (covered.nonEmpty) excised += id
    }
    // the excision set IS cur_decontaminate's drop list
    val dropped = Curation.decontaminate(spark, dir).collect()
      .collect { case r if r.getBoolean(2) => r.getLong(0) }.toSet
    assert(excised == dropped)
    assert(excised.nonEmpty)
  }

  test("self-repetition excision keeps exactly the first occurrence of every duplicated 8-gram") {
    val out = Curation.selfRepeatSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .sortBy(_._1)
    // driver recompute: global gram occurrence list, keep-first keeper
    val occ = docs.flatMap { case (id, tk) =>
      if (tk.size < 8) Seq.empty
      else tk.sliding(8).zipWithIndex.map { case (g, p) =>
        (g.mkString(" "), id, p) }
    }
    val byGram = occ.groupBy(_._1)
    val cut = occ.filter { case (g, id, p) =>
      val os = byGram(g)
      os.size > 1 && os.minBy(o => (o._2, o._3)) != ((g, id, p))
    }
    val coveredByDoc = cut.groupBy(_._2).map { case (id, os) =>
      id -> os.flatMap(o => o._3 until (o._3 + 8)).toSet }
    assert(out.keySet == docs.map(_._1).toSet)
    var totalRemoved = 0L
    docs.foreach { case (id, tk) =>
      val covered = coveredByDoc.getOrElse(id, Set.empty)
      val kept = tk.zipWithIndex.collect {
        case (w, p) if !covered(p) => w }
      val (nTok, nRem, clean) = out(id)
      assert(nTok == tk.size.toLong, s"doc $id n_tokens")
      assert(nRem == covered.size.toLong, s"doc $id n_removed")
      assert(clean == kept.mkString(" "), s"doc $id clean_text")
      totalRemoved += nRem
    }
    // the fixture contains exact-dup documents, so spans must be cut
    assert(totalRemoved > 0)
  }

  test("incremental gram dictionary: cross-batch keeper, fold equals one-shot, re-delivery no-ops") {
    import spark.implicits._
    val counts = graft.util.Scratch.dir("selfrepeat_inc").resolve("c").toString
    val phrase = "a b c d e f g h" // one exact 8-gram
    // the gram occurs in doc 5 (batch 1) and doc 1 (batch 2): the GLOBAL
    // keeper is doc 1 even though batch 1 appended first — min-fold
    // across partials must beat append order
    val b1 = Seq(5L -> s"$phrase x y z").toDF("doc_id", "text")
    val b2 = Seq(1L -> s"p q $phrase", 2L -> "unrelated words only here")
      .toDF("doc_id", "text")
    Curation.appendGramStatsBatch(spark, counts, b1, batchId = Some(0L))
    Curation.appendGramStatsBatch(spark, counts, b2, batchId = Some(1L))
    Curation.appendGramStatsBatch(spark, counts, b2, batchId = Some(1L)) // re-delivery
    val all = b1.unionByName(b2)
    val d = dirFromDf(all)
    val inc = Curation.selfRepeatFromPartials(spark, counts, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    val one = Curation.selfRepeatSpans(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(inc == one)
    // doc 1 keeps the phrase (keeper), doc 5 loses exactly its 8 tokens
    assert(inc(1L) == ((0L, s"p q $phrase")))
    assert(inc(5L) == ((8L, "x y z")))
    assert(inc(2L)._1 == 0L)
  }

  test("token fertility matches a driver recompute per language") {
    val out = Curation.tokenFertility(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    val sub = java.util.regex.Pattern.compile(
      "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
    val docs = Tables.documents(spark, dir)
      .select("lang", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val byLang = docs.groupBy(_._1)
    assert(out.keySet == byLang.keySet)
    byLang.foreach { case (lang, ds) =>
      val w = ds.map(_._2.trim.split("\\s+").length.toLong).sum
      val sw = ds.map { case (_, t) =>
        val m = sub.matcher(t); var n = 0L; while (m.find()) n += 1; n }.sum
      val ch = ds.map(_._2.length.toLong).sum
      assert(out(lang) == ((ds.length.toLong, w, sw, ch,
        sw.toDouble / w, ch.toDouble / sw)), lang)
    }
  }

  test("incremental line-df: partial folds equal one-shot; re-delivered batch no-ops") {
    import spark.implicits._
    val counts = graft.util.Scratch.dir("linedf_inc").resolve("c").toString
    // 4-word docs at lineWords=2 → lines (a b), (c d) etc.; "a b" in 3
    // distinct docs (one of them twice — distinct-per-doc must not
    // double-count), "c d" in only 2
    val b1 = Seq(1L -> "a b c d", 2L -> "a b a b").toDF("doc_id", "text")
    val b2 = Seq(3L -> "a b c d x", 4L -> "y z").toDF("doc_id", "text")
    Curation.appendLineDfBatch(spark, counts, b1, lineWords = 2,
      batchId = Some(0L))
    Curation.appendLineDfBatch(spark, counts, b2, lineWords = 2,
      batchId = Some(1L))
    // sink restart re-delivers epoch 1: the marker must make it a no-op
    Curation.appendLineDfBatch(spark, counts, b2, lineWords = 2,
      batchId = Some(1L))
    val df = spark.read.parquet(s"$counts/partials")
      .groupBy("line").sum("df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df == Map("a b" -> 3L, "c d" -> 2L, "x" -> 1L, "y z" -> 1L))
  }

  test("near-dup clusters: edges never straddle clusters; label = min member") {
    val clusters = NearDup.nearDupClusters(spark, dir, threshold = 0.5)
    val c = clusters.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every exact pair's endpoints carry the same cluster id
    val pairs = NearDup.ngramJaccardPairsCached(spark, dir, 0.5)
      .select("doc_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => c(a)._1 == c(b)._1 })
    // the cluster label is the minimum member id, and sizes agree
    val members = c.groupBy(_._2._1)
    members.foreach { case (label, ms) =>
      assert(ms.keys.min == label)
      assert(ms.values.forall(_._2 == ms.size))
    }
  }

  test("canonical keeper: one per cluster, a member, max quality, ties -> min id") {
    val clusters = NearDup.nearDupClusters(spark, dir, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = graft.text.TextFunctions.textQuality(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toMap
    val keepers = NearDup.canonicalKeepers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // exactly one keeper per cluster
    assert(keepers.map(_._1).distinct.length == keepers.length)
    assert(keepers.map(_._1).toSet == clusters.values.toSet)
    keepers.foreach { case (cid, keep, size, dropped) =>
      val ms = clusters.collect { case (id, c) if c == cid => id }
      assert(ms.toSet.contains(keep))
      assert(size == ms.size && dropped == size - 1)
      // the keeper is the (quality DESC, id ASC) argmax over members
      val best = ms.toSeq.map(id => (-quality(id), id)).min._2
      assert(keep == best)
    }
  }

  test("temperature mix downweights head languages and keeps capped tails whole") {
    val kept = Curation.temperatureMix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val kept2 = Curation.temperatureMix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(kept.sortBy(_._1).sameElements(kept2.sortBy(_._1))) // no RNG
    val nByLang = Tables.documents(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // emitted rate matches the formula exactly
    kept.foreach { case (_, lang, n, rate) =>
      assert(n == nByLang(lang))
      assert(rate == math.min(1.0, 8.0 / math.sqrt(n.toDouble)))
    }
    val keptByLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    nByLang.foreach { case (lang, n) =>
      val rate = math.min(1.0, 8.0 / math.sqrt(n.toDouble))
      val k = keptByLang.getOrElse(lang, 0)
      if (rate == 1.0) assert(k == n, s"$lang rides whole at rate 1.0")
      else {
        assert(k < n, s"$lang must be downsampled")
        // generous binomial slack around the target fraction
        assert(math.abs(k.toDouble / n - rate) < 0.25)
      }
    }
    // the least(1, ·) cap: at c=10 the tail languages saturate while the
    // head stays downweighted — both branches live in one run
    val capped = Curation.temperatureMix(spark, dir, c = 10.0).collect()
      .map(r => (r.getString(1), r.getDouble(3)))
    val cappedRates = capped.map(_._2).toSet
    assert(cappedRates.contains(1.0) && cappedRates.exists(_ < 1.0))
    val fullLangs = capped.filter(_._2 == 1.0).groupBy(_._1).view.mapValues(_.length)
    fullLangs.foreach { case (lang, k) =>
      assert(k == nByLang(lang), s"$lang rides whole at rate 1.0")
    }
  }

  test("line dedup matches a driver recompute exactly") {
    val out = Curation.lineDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val allLines = docs.map { case (id, tk) =>
      id -> tk.grouped(8).map(_.mkString(" ")).toSeq }
    val df = allLines.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val dup = df.filter(_._2 >= 3).keySet
    assert(out.keySet == docs.map(_._1).toSet)
    allLines.foreach { case (id, ls) =>
      val kept = ls.filterNot(dup)
      val (nLines, nDropped, clean) = out(id)
      assert(nLines == ls.size.toLong, s"doc $id n_lines")
      assert(nDropped == (ls.size - kept.size).toLong, s"doc $id n_dropped")
      assert(clean == kept.mkString(" "), s"doc $id clean_text")
    }
    // both branches are live on the fixture
    assert(out.values.exists(_._2 > 0) && out.values.exists(_._2 == 0))
  }

  test("curriculum stages: two-pass rank equals the naive global rank; stages balanced") {
    val out = Curation.curriculumStages(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out.nonEmpty)
    val n = out.size.toLong
    // naive recompute: global sort by (grade, doc_id)
    val naive = out.toSeq.sortBy { case (id, (g, _, _)) => (g, id) }
      .zipWithIndex.map { case ((id, (g, _, _)), i) => id -> (i + 1L) }
      .toMap
    val stages = Array("s1_simple", "s2_moderate", "s3_advanced", "s4_complex")
    out.foreach { case (id, (_, rank, stage)) =>
      assert(rank == naive(id), s"doc $id rank")
      assert(stage == stages((((rank - 1) * 4) / n).toInt), s"doc $id stage")
    }
    // equal-frequency: stage sizes differ by at most 1
    val sizes = out.values.groupBy(_._3).map(_._2.size)
    assert(sizes.size == 4 && sizes.max - sizes.min <= 1)
  }
}
