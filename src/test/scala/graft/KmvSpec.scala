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

  test("grouped sketch: exact below k per group, envelope above, plan is WindowGroupLimit") {
    import spark.implicits._
    // group a: 100 keys (< k=256, exact); group b: 20000 keys (envelope)
    val df = ((1L to 100L).map(("a", _)) ++ (1L to 20000L).map(("b", _)))
      .toDF("grp", "key")
    val q = Kmv.distinctEstimatePerGroup(df, "grp", "key", k = 256)
    val out = q.collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(2) == 100L && out("a").getDouble(3) == 100.0)
    val est = out("b").getDouble(3)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.25, s"estimate $est")
    // the rank filter must plan as a group-limit, not a full sort+filter
    assert(q.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("set algebra: exact regime (union below k) returns exact set sizes") {
    import spark.implicits._
    // A = 1..60, B = 41..100: |A∪B| = 100, |A∩B| = 20, all under k=256
    val a = (1L to 60L).toDF("key")
    val b = (41L to 100L).toDF("key")
    val r = Kmv.setAlgebra(a, b, "key", k = 256).collect()(0)
    assert(r.getLong(1) == 100L)                        // n_union_kept
    assert(r.getLong(2) == 20L)                         // n_both
    assert(r.getDouble(3) == 100.0)                     // union exact
    assert(r.getDouble(4) == 0.2)                       // jaccard exact
    assert(r.getDouble(5) == 20.0)                      // intersection exact
  }

  test("set algebra: disjoint and identical sets sit at the extremes") {
    import spark.implicits._
    val a = (1L to 50L).toDF("key")
    val b = (1001L to 1050L).toDF("key")
    val disjoint = Kmv.setAlgebra(a, b, "key", k = 128).collect()(0)
    assert(disjoint.getLong(2) == 0L && disjoint.getDouble(4) == 0.0
      && disjoint.getDouble(5) == 0.0)
    val same = Kmv.setAlgebra(a, a, "key", k = 128).collect()(0)
    assert(same.getDouble(4) == 1.0)                    // jaccard 1
    assert(same.getDouble(5) == same.getDouble(3))      // inter = union
  }

  test("set algebra: estimation regime lands in the error envelope") {
    import spark.implicits._
    // |A| = |B| = 8000, overlap 4000 → union 12000, jaccard 1/3
    val a = (1L to 8000L).toDF("key")
    val b = (4001L to 12000L).toDF("key")
    val r = Kmv.setAlgebra(a, b, "key", k = 256).collect()(0)
    val (union, jac, inter) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(math.abs(union - 12000.0) / 12000.0 < 0.25, s"union $union")
    assert(math.abs(jac - 1.0 / 3.0) < 0.15, s"jaccard $jac")
    assert(math.abs(inter - 4000.0) / 4000.0 < 0.4, s"intersection $inter")
  }

  test("hll: registers merge by max, estimate in envelope, ranks bounded") {
    import spark.implicits._
    import graft.operators.Hll
    val df = (1L to 2000L).flatMap(i => Seq(i, i)).toDF("key")
    val p = Hll.DefaultP
    val one = Hll.registers(df, "key", p).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    // ranks live in [1, 64-p+1]; registers in [0, 2^p)
    one.foreach { case (reg, rho) =>
      assert(reg >= 0 && reg < (1 << p))
      assert(rho >= 1 && rho <= 64 - p + 1)
    }
    // split-and-fold = one-shot (mergeable by per-register max)
    val a = Hll.registers(df.where(col("key") <= 1000), "key", p)
    val b = Hll.registers(df.where(col("key") > 1000), "key", p)
    val merged = a.unionByName(b)
      .groupBy(col("register")).agg(max(col("rho")).as("rho"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(merged == one)
    // raw estimate within the ~1.04/sqrt(m) envelope (generous 4 sigma)
    val est = Hll.estimate(Hll.registers(df, "key", p), p)
    val err = math.abs(est - 2000.0) / 2000.0
    assert(err < 4 * 1.04 / math.sqrt((1 << p).toDouble), s"est=$est")
  }

  test("hll grouped: group sketches roll up to the global by max") {
    import spark.implicits._
    import graft.operators.Hll
    val df = (1L to 900L).map(i => (s"g${i % 3}", i)).toDF("grp", "key")
    val grouped = Hll.registersPerGroup(df, "grp", "key")
    assert(grouped.select("grp").distinct().count() == 3)
    // fold the per-group registers across groups = the global sketch
    val rolled = grouped.groupBy(col("register"))
      .agg(max(col("rho")).as("rho"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val global = Hll.registers(df, "key")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(rolled == global)
  }

  test("histogram sketch: uniform hand data estimates exactly, bins merge by sum") {
    import spark.implicits._
    import graft.operators.HistogramSketch
    // values 0.5, 1.5, ..., 99.5 over [0,100) with 10 bins: every bin
    // holds 10; rank(0.5·100)=50 → bin 4, est = 10·(4 + 10/10) = 50
    val vals = (0 until 100).map(_ + 0.5).toDF("v")
    val bins = HistogramSketch.binCounts(vals, "v", 0.0, 100.0, 10)
    assert(bins.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      (0 until 10).map(_ -> 10L).toMap)
    val est = HistogramSketch
      .percentiles(spark, bins, 0.0, 100.0, 10, Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    assert(est(0.25) == 25.0 && est(0.5) == 50.0 && est(0.9) == 90.0)
    // additive merge: two disjoint halves' bins sum to the one-shot
    val a = HistogramSketch.binCounts(vals.where(col("v") < 50), "v", 0.0, 100.0, 10)
    val b = HistogramSketch.binCounts(vals.where(col("v") >= 50), "v", 0.0, 100.0, 10)
    val merged = a.unionByName(b).groupBy(col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == bins.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
    // out-of-domain values clamp to the edge bins, never vanish
    val clamped = HistogramSketch.binCounts(
      Seq(-5.0, 500.0).toDF("v"), "v", 0.0, 100.0, 10)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(clamped == Map(0 -> 1L, 9 -> 1L))
    // quantiles outside (0, 1] fail fast instead of emitting a
    // bin -1 / divide-by-zero row
    intercept[IllegalArgumentException] {
      HistogramSketch.percentiles(spark, bins, 0.0, 100.0, 10, Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      HistogramSketch.percentiles(spark, bins, 0.0, 100.0, 10, Seq(1.5))
    }
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
