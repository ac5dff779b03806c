package graft

import org.apache.spark.sql.functions._

import graft.text.{NearDup, PpJoin, TextFunctions}

class PpJoinSpec extends SparkSuite {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Brute-force exact trigram Jaccard over all pairs — the property the
    * filter chain must reproduce losslessly.
    */
  private def brute(d: org.apache.spark.sql.DataFrame, tNum: Int, tDen: Int) = {
    val g = d.select(col("doc_id"),
      array_sort(NearDup.charTrigrams(TextFunctions.normText(col("text"))))
        .as("g"))
    val b = g.select(col("doc_id").as("nb_id"), col("g").as("gb"))
    g.join(b, col("doc_id") < col("nb_id"))
      .select(col("doc_id"), col("nb_id"),
        size(array_intersect(col("g"), col("gb"))).cast("long").as("i"),
        size(col("g")).cast("long").as("na"),
        size(col("gb")).cast("long").as("nb"))
      .where(col("i") * (tNum + tDen) >= (col("na") + col("nb")) * tNum)
      .select(col("doc_id"), col("nb_id"), col("i"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  private def run(d: org.apache.spark.sql.DataFrame, tNum: Int, tDen: Int) =
    PpJoin.pairsFrom(d, tNum, tDen).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("matches brute-force all-pairs exactly at t=0.8") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "the quick brown fox jumps over the lazy dog",
      4L -> "a completely different sentence about spark engines",
      5L -> "a completely different sentence about spark engine",
      6L -> "nothing in common with anything else here at all")
    assert(run(d, 4, 5) == brute(d, 4, 5))
    // and the expected structure: the two near-identical groups match,
    // the loner matches nothing
    val keys = run(d, 4, 5).keySet
    assert(keys.contains((1L, 3L)) && keys.contains((1L, 2L)))
    assert(!keys.exists { case (a, b) => a == 6L || b == 6L })
  }

  test("matches brute-force at a looser threshold (t=0.5)") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon eta",
      3L -> "alpha beta gamma theta iota kappa",
      4L -> "lambda mu nu xi omicron pi rho sigma")
    assert(run(d, 1, 2) == brute(d, 1, 2))
  }

  test("identical docs score jaccard 1.0 and exact counts") {
    val d = docs(1L -> "same same text", 2L -> "same same text")
    val out = PpJoin.pairsFrom(d, 4, 5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(2) == r.getLong(3) && r.getLong(3) == r.getLong(4))
    assert(r.getDouble(5) == 1.0)
  }

  private def bruteContain(d: org.apache.spark.sql.DataFrame,
      tNum: Int, tDen: Int) = {
    val g = d.select(col("doc_id"),
      array_sort(NearDup.charTrigrams(TextFunctions.normText(col("text"))))
        .as("g"))
    val b = g.select(col("doc_id").as("container_id"), col("g").as("gb"))
    g.join(b, col("doc_id") =!= col("container_id"))
      .select(col("doc_id"), col("container_id"),
        size(array_intersect(col("g"), col("gb"))).cast("long").as("i"),
        size(col("g")).cast("long").as("na"))
      .where(col("i") * tDen >= col("na") * tNum)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("containment matches brute-force and is directional") {
    val d = docs(
      1L -> "the quick brown fox",
      2L -> "yesterday the quick brown fox jumped the fence again and again",
      3L -> "entirely unrelated content lives here")
    val out = graft.text.PpJoin.containmentFrom(d, 9, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == bruteContain(d, 9, 10))
    // the short doc is inside the long one, never the reverse
    assert(out.keySet.contains((1L, 2L)))
    assert(!out.keySet.contains((2L, 1L)))
  }

  test("full containment scores 1.0 even when jaccard is low") {
    val d = docs(
      1L -> "alpha beta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val c = graft.text.PpJoin.containmentFrom(d, 9, 10).collect()
    assert(c.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L
      && r.getDouble(5) == 1.0))
    // and the symmetric join at the same bar sees nothing
    assert(run(d, 9, 10).isEmpty)
  }

  test("property: the filter chain is lossless vs brute force on random corpora") {
    // seeded random docs over a small alphabet (short words, heavy
    // repetition — the prefix filter's adversarial regime) across four
    // thresholds; every (seed, t) must match brute force EXACTLY
    val words = Vector("aa", "ab", "ba", "bb", "abc", "cab", "bca")
    def randomDocs(seed: Long) = {
      val rnd = new scala.util.Random(seed)
      docs((1L to 24L).map { id =>
        id -> Seq.fill(4 + rnd.nextInt(12))(words(rnd.nextInt(words.size)))
          .mkString(" ")
      }: _*)
    }
    for (seed <- 1L to 4L; (tn, td) <- Seq((1, 2), (2, 3), (4, 5), (9, 10))) {
      val d = randomDocs(seed)
      assert(run(d, tn, td) == brute(d, tn, td), s"seed=$seed t=$tn/$td")
      // containment too: directional, same losslessness bar
      val c = graft.text.PpJoin.containmentFrom(d, tn, td).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(c == bruteContain(d, tn, td), s"containment seed=$seed t=$tn/$td")
    }
  }

  test("property: threshold kernel is exact above minOv, honest below") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(7L)
    def sortedSet(n: Int, span: Int) = ArrayData.toArrayData(
      Seq.fill(n)(rnd.nextInt(span).toLong).distinct.sorted.toArray)
    for (_ <- 1 to 500) {
      val x = sortedSet(1 + rnd.nextInt(60), 80)
      val y = sortedSet(1 + rnd.nextInt(60), 80)
      var i = 0; var j = 0; var truth = 0L
      while (i < x.numElements() && j < y.numElements()) {
        val (xv, yv) = (x.getLong(i), y.getLong(j))
        if (xv == yv) { truth += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1 else j += 1
      }
      for (minOv <- Seq(0L, 1L, truth, truth + 1, 40L)) {
        val got = graft.functions.IntersectKernels.thresholdCount(x, y, minOv)
        if (truth >= minOv) assert(got == truth, s"exactness minOv=$minOv")
        else assert(got < minOv && got >= 0,
          s"prune honesty minOv=$minOv got=$got truth=$truth")
      }
    }
  }

  test("property: packed-bitmap intersect equals two-pointer on dense ranks") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(11L)
    for (_ <- 1 to 300) {
      val vocab = 1 + rnd.nextInt(500)
      val words = (vocab + 63) / 64
      def set() = ArrayData.toArrayData(
        Seq.fill(1 + rnd.nextInt(vocab))(1L + rnd.nextInt(vocab))
          .distinct.sorted.toArray)
      val (x, y) = (set(), set())
      val full = graft.functions.IntersectKernels.thresholdCount(x, y, 0L)
      val packed = graft.functions.BitsetKernels.andCount(
        graft.functions.BitsetKernels.pack(x, words),
        graft.functions.BitsetKernels.pack(y, words))
      assert(packed == full, s"vocab=$vocab")
    }
  }

  test("short texts (under one trigram) fall back to the whole string") {
    // charTrigrams keeps length<3 texts as a single token — a 2-char
    // doc pairs with its duplicate, not with a superstring
    val d = docs(1L -> "ab", 2L -> "ab", 3L -> "abc")
    val out = run(d, 4, 5)
    assert(out.keySet == Set((1L, 2L)))
  }
}
