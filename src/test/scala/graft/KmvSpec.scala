package graft

import org.apache.spark.sql.functions._

import graft.operators.Kmv

/** KMV distinct sketch: estimator accuracy in its design envelope and
  * exactness below the sketch size.
  */
class KmvSpec extends SparkSuite {

  test("fewer distinct keys than k returns the exact count") {
    import spark.implicits._
    val df = (1L to 100L).flatMap(i => Seq(i, i)).toDF("key")
    val r = Kmv.distinctEstimate(df, "key", k = 256).collect()(0)
    assert(r.getLong(1) == 100L)              // n_kept = all of them
    assert(r.getDouble(3) == 100.0)           // exact fallback
  }

  test("estimate lands within the expected error envelope at k=256") {
    import spark.implicits._
    val n = 20000
    val df = (1L to n.toLong).toDF("key")
    val r = Kmv.distinctEstimate(df, "key", k = 256).collect()(0)
    val est = r.getDouble(3)
    // KMV standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4σ for one fixed draw
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs exact $n")
    assert(r.getLong(1) == 256L)
  }

  test("the sketch is insensitive to duplication and partitioning") {
    import spark.implicits._
    val base = (1L to 5000L).toDF("key")
    val dup = base.union(base).union(base).repartition(17)
    val a = Kmv.distinctEstimate(base, "key", k = 128).collect()(0)
    val b = Kmv.distinctEstimate(dup, "key", k = 128).collect()(0)
    // identical key population → identical sketch, bit for bit
    assert(a.getLong(2) == b.getLong(2))      // kth_hash
    assert(a.getDouble(3) == b.getDouble(3))  // estimate
  }

  test("merged partial sketches equal the one-shot sketch exactly") {
    import spark.implicits._
    val all = (1L to 8000L).toDF("key")
    val parts = Seq(
      all.where($"key" % 3 === 0), all.where($"key" % 3 === 1),
      all.where($"key" % 3 === 2), all.where($"key" % 5 === 0)) // overlap!
      .map(Kmv.partialSketch(_, "key", 64))
      .reduce(_ unionByName _)
    val merged = Kmv.estimateFromHashes(parts, 64).collect()(0)
    val oneShot = Kmv.distinctEstimate(all, "key", 64).collect()(0)
    assert(merged.getLong(2) == oneShot.getLong(2))      // kth_hash
    assert(merged.getDouble(3) == oneShot.getDouble(3))  // estimate
  }

  test("events gate query returns one plausible row") {
    val exact = graft.model.Tables.events(spark, sf("sf0.001"))
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val r = Kmv.distinctEstimate(
      graft.model.Tables.events(spark, sf("sf0.001")), "user_id", 256)
      .collect()(0)
    val est = r.getDouble(3)
    // below k the estimate IS exact; above, within the envelope
    if (exact <= 256) assert(est == exact.toDouble)
    else assert(math.abs(est - exact) / exact < 0.25)
  }
}
