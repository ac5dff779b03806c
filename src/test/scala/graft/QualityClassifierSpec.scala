package graft

import org.apache.spark.sql.functions._

import graft.text.QualityClassifier

/** The in-engine trained classifier: learns a separable hand-built
  * vocabulary split, and the fixed-point decision rule is float-free.
  */
class QualityClassifierSpec extends SparkSuite {

  test("separable vocab: training learns the split; decision is margin sign") {
    import spark.implicits._
    // positives speak token 'alpha', negatives 'bravo'; the hashed
    // buckets must differ or the task is unlearnable by construction
    val docs = ((0 until 10).map(i => (i.toLong, "alpha alpha alpha", "en")) ++
      (10 until 20).map(i => (i.toLong, "bravo bravo", "fr")))
      .toDF("doc_id", "text", "lang")
    val b = docs.select(
      pmod(graft.functions.RollingHash64(lit("alpha")), lit(32L)),
      pmod(graft.functions.RollingHash64(lit("bravo")), lit(32L)))
      .head()
    assert(b.getLong(0) != b.getLong(1), "hash collision breaks the fixture")

    val out = QualityClassifier.scoresFrom(docs, "en", iters = 6).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (mu, predicted, y) = (r.getLong(1), r.getBoolean(2), r.getInt(3))
      assert(predicted == (mu >= 0L)) // decision IS the margin sign
      assert(predicted == (y == 1),
        s"doc ${r.getLong(0)}: margin $mu misclassifies y=$y")
    }
  }

  test("real corpus: bias reacts to class prior, weights bounded and reused") {
    val w1 = QualityClassifier.trainedWeights(spark, sf("sf0.001")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(w1.size == QualityClassifier.Dim + 1)
    // 'en' is a minority at sf0.001 or not — either way the prior is not
    // exactly 1/2, so the FIRST gradient step already moves the bias
    assert(w1(QualityClassifier.Dim) != 0L)
    // memoized artifact: identical on re-request (no retraining drift)
    val w2 = QualityClassifier.trainedWeights(spark, sf("sf0.001")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(w1 == w2)
  }

  test("calibration: deciles partition the corpus, counts tie back to scores") {
    val dir = sf("sf0.001")
    val cal = QualityClassifier.calibrationTable(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val sc = QualityClassifier.scores(spark, dir).collect()
    // buckets cover 0..9, sizes sum to the corpus, positives tie back
    assert(cal.keySet.subsetOf((0L to 9L).toSet))
    assert(cal.values.map(_._1).sum == sc.length)
    assert(cal.values.map(_._2).sum == sc.count(_.getInt(3) == 1))
    // percentile bounds make the buckets near-even: no decile may hold
    // more than twice its fair share (ties can merge, never explode)
    cal.values.foreach { case (n, nPos, rate) =>
      assert(n <= 2L * (sc.length / 10 + 1))
      assert(nPos <= n && rate == nPos.toDouble / n.toDouble)
    }
  }
}
