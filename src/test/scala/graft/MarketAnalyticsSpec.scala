package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.analysis.MarketAnalytics
import graft.model.Tables

class MarketAnalyticsSpec extends SparkSuite {

  private def rates = Tables.rates(spark, sf("sf0.001"))

  test("cross rates: full off-diagonal matrix, exact ratio, reciprocal") {
    val pairs = rates.select("ccy_couple").distinct().count()
    val out = MarketAnalytics.crossRates(rates, "7 DAYS").collect()
    assert(out.length == pairs * (pairs - 1))
    val byKey = out.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    out.foreach { r =>
      assert(r.getDouble(4) == r.getDouble(2) / r.getDouble(3))
      // reciprocal symmetry up to one IEEE rounding: a/b vs 1/(b/a)
      val inv = byKey((r.getString(1), r.getString(0))).getDouble(4)
      assert(math.abs(r.getDouble(4) * inv - 1.0) < 1e-12)
    }
  }

  test("twap: bounded by day range, constant series degenerates to the rate") {
    val bars = rates.groupBy("ccy_couple", "date")
      .agg(min("rate").as("lo"), max("rate").as("hi"))
    val joined = MarketAnalytics.twap(rates)
      .join(bars, Seq("ccy_couple", "date")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (tw, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(tw >= lo - 1e-9 && tw <= hi + 1e-9)
      if (lo == hi) assert(math.abs(tw - lo) < 1e-9)
    }
    // hand check: two ticks at 10:00 (rate 2) and 18:00 (rate 4) ->
    // dwell 8h at 2, 6h at 4 -> twap = (16+24)/14
    import spark.implicits._
    val fx = Seq(
      (1L, 36000000000L, "X/Y", 2.0),
      (2L, 64800000000L, "X/Y", 4.0)
    ).toDF("event_id", "event_time", "ccy_couple", "rate")
      .withColumn("date", to_date(timestamp_micros(col("event_time"))))
      .withColumn("timestamp", timestamp_micros(col("event_time")))
    val tw = MarketAnalytics.twap(fx).collect().head.getDouble(3)
    assert(math.abs(tw - (2.0 * 8 + 4.0 * 6) / 14.0) < 1e-12)
  }

  test("Theil-Sen ignores the fat-finger day; MAD zero-edge flags the lone spike") {
    import spark.implicits._
    def fx(path: Map[String, Seq[Double]], days: Seq[String]) =
      days.zipWithIndex.flatMap { case (d, i) =>
        path.toSeq.map { case (p, vs) =>
          (i * 10L + p.head.toLong, p, vs(i), d) }
      }.toDF("event_id", "ccy_couple", "rate", "ds")
        .withColumn("date", to_date(col("ds")))
        .withColumn("timestamp", col("date").cast("timestamp"))
        .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
        .drop("ds")
    val days4 = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    // X climbs 1/day then jumps to 10: pairwise milli-slopes
    // [1000,1000,1000,3000,4000,7000] → lower median (rank 3) = 1000 —
    // the jump never moves the estimate
    val ts = MarketAnalytics.theilSen(
      fx(Map("X" -> Seq(1.0, 2.0, 3.0, 10.0)), days4)).collect().head
    assert(ts.getLong(1) == 6L)
    assert(ts.getDouble(2) == 1000.0)

    val days5 = days4 :+ "2024-01-05"
    val out = MarketAnalytics.madOutliers(fx(Map(
      "F" -> Seq(1.0, 1.0, 1.0, 1.0, 10.0),   // flat + one spike: mad = 0
      "L" -> Seq(1.0, 2.0, 3.0, 4.0, 5.0)),   // clean line: no outliers
      days5)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out("F") == ((5L, 1000L, 0L, 1L))) // med 1.0, mad 0, spike flagged
    assert(out("L") == ((5L, 3000L, 1000L, 0L)))
  }

  test("DTW to anchor: hand DP on known change series; identical series scores 0") {
    import spark.implicits._
    // anchor A (smallest name) changes ×1000 = [1, 3, 2];
    // B = [1, 2, 2] → hand DP (cost |Δ|, band 4):
    // row0 [0,1,2], row1 [2,1,2], row2 [3,1,1] → dtw = 1;
    // C identical to A → dtw = 0
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    val paths = Map(
      "A" -> Seq(1.0, 1.001, 1.004, 1.006),
      "B" -> Seq(2.0, 2.001, 2.003, 2.005),
      "C" -> Seq(5.0, 5.001, 5.004, 5.006))
    val fx = days.zipWithIndex.flatMap { case (d, i) =>
      paths.toSeq.map { case (p, vs) =>
        (i * 10L + p.head.toLong, p, vs(i), d) }
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
      .drop("ds")
    val out = MarketAnalytics.dtwToAnchor(fx).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out.keySet == Set("A", "B", "C"))
    assert(out("A") == (("A", 3L, 0L)))   // anchor vs itself
    assert(out("B") == (("A", 3L, 1L)))   // the hand DP
    assert(out("C") == (("A", 3L, 0L)))   // identical shape, offset level
  }

  test("DTW graph: mutual top-1 co-sign edges survive, per-edge hand DP") {
    import spark.implicits._
    // sign agreement over 4 change days: A≈B (all 4 days), C≈D (all 4),
    // every cross pair agrees on exactly 1 day → mutual top-1 keeps
    // exactly {A-B, C-D}. Change series ×1000: A=[1,1,-1,1],
    // B=[2,2,-2,2], C=[-1,1,1,-1], D=[-2,2,2,-2]; hand DP on |Δ| with
    // band 4 gives dtw(A,B) = dtw(C,D) = 4.
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
      "2024-01-05")
    val paths = Map(
      "A" -> Seq(1.000, 1.001, 1.002, 1.001, 1.002),
      "B" -> Seq(2.000, 2.002, 2.004, 2.002, 2.004),
      "C" -> Seq(3.000, 2.999, 3.000, 3.001, 3.000),
      "D" -> Seq(4.000, 3.998, 4.000, 4.002, 4.000))
    val fx = days.zipWithIndex.flatMap { case (d, i) =>
      paths.toSeq.map { case (p, vs) =>
        (i * 10L + p.head.toLong, p, vs(i), d) }
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
      .drop("ds")
    val out = MarketAnalytics.dtwGraph(fx, topN = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out.keySet == Set(("A", "B"), ("C", "D")))
    assert(out(("A", "B")) == ((4L, 4L, 4L)))
    assert(out(("C", "D")) == ((4L, 4L, 4L)))
  }

  test("Granger screen: the leading series causes, matches brute OLS F") {
    import spark.implicits._
    // x's changes lead y's by one day (plus small perturbation);
    // milli-changes: x = [3,1,-2,4,-1,2,-3,1,2], y_t = x_{t-1} + eps
    val xChg = Seq(3L, 1L, -2L, 4L, -1L, 2L, -3L, 1L, 2L)
    val eps = Seq(0L, 1L, 0L, -1L, 0L, 1L, 0L, -1L)
    val yChg = 5L +: xChg.init.zip(eps).map { case (a, e) => a + e }
    def closes(chg: Seq[Long]) = chg.scanLeft(1000L)(_ + _) // milli closes
    val days = (1 to 10).map(d => f"2024-01-$d%02d")
    val fx = days.zipWithIndex.flatMap { case (d, i) =>
      Seq(("X", closes(xChg)(i)), ("Y", closes(yChg)(i))).map { case (p, c) =>
        (i * 10L + p.head.toLong, p, c / 1000.0, d) }
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
      .drop("ds")
    val out = MarketAnalytics.grangerPairs(fx, topN = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(out.keySet == Set(("X", "Y"), ("Y", "X")))
    // brute-force reference: OLS RSS via centered sums in plain Scala
    def bruteF(y: Seq[Long], x: Seq[Long]): Double = {
      val slots = (1 until y.size)
      val (u, v, w) = (slots.map(y(_).toDouble), slots.map(t => y(t - 1).toDouble),
        slots.map(t => x(t - 1).toDouble))
      val n = u.size.toDouble
      def c(a: Seq[Double], b: Seq[Double]) =
        n * a.zip(b).map { case (p, q) => p * q }.sum - a.sum * b.sum
      val (cuu, cvv, cww) = (c(u, u), c(v, v), c(w, w))
      val (cuv, cuw, cvw) = (c(u, v), c(u, w), c(v, w))
      val rssR = cuu - cuv * cuv / cvv
      val det = cvv * cww - cvw * cvw
      val rssF = cuu - (cww * cuv * cuv - 2.0 * cvw * cuv * cuw + cvv * cuw * cuw) / det
      (rssR - rssF) * (n - 3.0) / rssF
    }
    val fXY = out(("X", "Y"))._2.get
    val fYX = out(("Y", "X"))._2.get
    assert(out(("X", "Y"))._1 == 8L) // 9 change slots -> 8 lag-1 triples
    assert(math.abs(fXY - bruteF(yChg, xChg)) < 1e-9 * math.max(1.0, fXY))
    assert(math.abs(fYX - bruteF(xChg, yChg)) < 1e-9 * math.max(1.0, fYX))
    // the leading direction dominates
    assert(fXY > 10.0 && fXY > 5.0 * math.max(fYX, 1e-9))
  }

  test("lead-lag CCF peak: the 1-day leader peaks at lag 1; min-variance hand weight") {
    import spark.implicits._
    // X leads Y by one day (Granger fixture shape)
    val xChg = Seq(3L, 1L, -2L, 4L, -1L, 2L, -3L, 1L, 2L)
    val yChg = 5L +: xChg.init
    def closes(chg: Seq[Long]) = chg.scanLeft(1000L)(_ + _)
    val days = (1 to 10).map(d => f"2024-01-$d%02d")
    val fx = days.zipWithIndex.flatMap { case (d, i) =>
      Seq(("X", closes(xChg)(i)), ("Y", closes(yChg)(i))).map { case (p, c) =>
        (i * 10L + p.head.toLong, p, c / 1000.0, d) }
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
      .drop("ds")
    val ll = MarketAnalytics.leadLagPairs(fx, topN = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(4)))).toMap
    // y_t == x_{t-1} exactly -> |corr| = 1 at lag 1 for X->Y
    assert(ll(("X", "Y"))._1 == 1L)
    assert(math.abs(ll(("X", "Y"))._2 - 1.0) < 1e-12)

    // min-variance: a = ±1 milli, b = ±2 milli in lockstep ->
    // va=64, vb=256, cov=128 (n²-scale), w_src = (256-128)/64 = 2.0
    val fx2 = days.take(9).zipWithIndex.flatMap { case (d, i) =>
      val sgn = if (i % 2 == 0) 1L else -1L
      Seq(("A", 1000L + sgn), ("B", 2000L + 2 * sgn)).map { case (p, c) =>
        (i * 10L + p.head.toLong, p, c / 1000.0, d) }
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
      .drop("ds")
    val mv = MarketAnalytics.minVariancePairs(fx2, topN = 1).collect()
    assert(mv.length == 1)
    val r = mv.head
    assert((r.getString(0), r.getString(1)) == (("A", "B")))
    assert(r.getLong(2) == 8L)
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-12)
  }

  test("OU half-life: exact AR(1) spread fits β and the power-chain k; divergent spread NULLs") {
    import spark.implicits._
    def fx2(chgA: Seq[Long], a: String, b: String) = {
      // A's milli-closes accumulate the spread diffs; B stays constant,
      // so d_t = chgA_t exactly
      val closesA = chgA.scanLeft(1000L)(_ + _)
      val days = (1 to closesA.size).map(d => f"2024-01-$d%02d")
      days.zipWithIndex.flatMap { case (d, i) =>
        Seq((a, closesA(i)), (b, 2000L)).map { case (p, c) =>
          (i * 10L + p.head.toLong, p, c / 1000.0, d) }
      }.toDF("event_id", "ccy_couple", "rate", "ds")
        .withColumn("date", to_date(col("ds")))
        .withColumn("timestamp", col("date").cast("timestamp"))
        .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
        .drop("ds")
    }
    // spread levels 64, 48, 36, 27 = exact S_t = 0.75·S_{t−1}:
    // β = −0.25 with zero residual; 0.75^k ≤ ½ first at k = 3
    // (0.75, 0.5625, 0.421875 — all dyadic-exact products)
    val rev = MarketAnalytics.ouHalflifePairs(
      fx2(Seq(64L, -16L, -12L, -9L), "A", "B"), topN = 1).collect()
    assert(rev.length == 1)
    assert((rev.head.getString(0), rev.head.getString(1)) == (("A", "B")))
    assert(rev.head.getLong(2) == 3L) // m = 4 common slots → n = 3
    assert(rev.head.getDouble(3) == -0.25)
    assert(rev.head.getLong(4) == 3L)

    // spread levels 1, 2, 4, 8 = exact doubling: β = +1 (divergent) —
    // β still reported, half-life NULL (outside the mean-reverting domain)
    val div = MarketAnalytics.ouHalflifePairs(
      fx2(Seq(1L, 1L, 2L, 4L), "C", "D"), topN = 1).collect()
    assert(div.length == 1)
    assert(div.head.getDouble(3) == 1.0)
    assert(div.head.isNullAt(4))
  }

  test("ADF t² on a hand spread is exactly 27.0; a perfect AR(1) fit NULLs t²") {
    import spark.implicits._
    def fx2(chgA: Seq[Long], a: String, b: String) = {
      val closesA = chgA.scanLeft(1000L)(_ + _)
      val days = (1 to closesA.size).map(d => f"2024-01-$d%02d")
      days.zipWithIndex.flatMap { case (d, i) =>
        Seq((a, closesA(i)), (b, 2000L)).map { case (p, c) =>
          (i * 10L + p.head.toLong, p, c / 1000.0, d) }
      }.toDF("event_id", "ccy_couple", "rate", "ds")
        .withColumn("date", to_date(col("ds")))
        .withColumn("timestamp", col("date").cast("timestamp"))
        .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
        .drop("ds")
    }
    // spread levels 4, 1, 2, 1: x = (4,1,2), y = (−3,1,−1) →
    // num = −18, den = 14, deny = 24; β = −9/7;
    // t² = num²·(n−2)/(den·deny − num²) = 324·1/12 = 27 exactly
    val out = MarketAnalytics.adfSpreadPairs(
      fx2(Seq(4L, -3L, 1L, -1L), "A", "B"), topN = 1).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) == (("A", "B")))
    assert(r.getLong(2) == 3L)
    assert(r.getDouble(3) == -18.0 / 14.0)
    assert(r.getDouble(4) == 27.0)
    assert(r.getBoolean(5)) // β < 0 and 27 ≥ 8.1796
    // exact AR(1) (the OU fixture): zero residual → t² NULL (infinite
    // t is a degenerate fit, not evidence), flag NULL through 3VL
    val perfect = MarketAnalytics.adfSpreadPairs(
      fx2(Seq(64L, -16L, -12L, -9L), "C", "D"), topN = 1).collect().head
    assert(perfect.getDouble(3) == -0.25)
    assert(perfect.isNullAt(4))
    assert(perfect.isNullAt(5))
  }

  test("GARCH(1,1) recurrence and peak match an independent double-for-double recompute") {
    import spark.implicits._
    val chg = Seq(100L, 0L, 200L, -50L)
    val closes = chg.scanLeft(1000L)(_ + _)
    val days = (1 to closes.size).map(d => f"2024-01-$d%02d")
    val fx = days.zipWithIndex.map { case (d, i) =>
      (i.toLong, "P", closes(i) / 1000.0, d)
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
      .drop("ds")
    val out = MarketAnalytics.garchVol(fx).collect()
    assert(out.length == 1)
    val r = out.head
    // the identical IEEE operand sequence in plain Scala
    var s = 20000.0; var pk = Double.NaN; var pd = ""
    chg.map(_.toDouble).zipWithIndex.foreach { case (c, i) =>
      s = 1000.0 + 0.1 * (c * c) + 0.85 * s
      if (pk.isNaN || s > pk) { pk = s; pd = days(i + 1) }
    }
    assert(r.getLong(1) == chg.size.toLong)
    assert(r.getDouble(2) == s)
    assert(r.getDouble(3) == pk)
    assert(r.getDate(4).toString == pd)
  }

  test("Viterbi regime decode: switch beats mismatches, one blip never switches, ties go U") {
    import spark.implicits._
    def fx1(chg: Seq[Long]) = {
      val closes = chg.scanLeft(5000L)(_ + _)
      val days = (1 to closes.size).map(d => f"2024-01-$d%02d")
      days.zipWithIndex.map { case (d, i) =>
        (i.toLong, "P", closes(i) / 1000.0, d)
      }.toDF("event_id", "ccy_couple", "rate", "ds")
        .withColumn("date", to_date(col("ds")))
        .withColumn("timestamp", col("date").cast("timestamp"))
        .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
        .drop("ds")
    }
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def run(chg: Long*) = {
      val r = MarketAnalytics.regimeViterbi(fx1(chg)).collect().head
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
    }
    // ++++−−−−: one switch (3 bits) beats four mismatches (8 bits)
    assert(run(10, 10, 10, 10, -10, -10, -10, -10) ==
      ((8L, 3L, 4L, 1L, md5hex("UUUUDDDD"))))
    // +++−+++: one opposing blip (2 bits) never justifies two switches
    assert(run(10, 10, 10, -10, 10, 10, 10) ==
      ((7L, 2L, 7L, 0L, md5hex("UUUUUUU"))))
    // all-flat: every day ties — stay rule + final U-tie give all-U at
    // flat emission cost 1/day
    assert(run(0, 0, 0) == ((3L, 3L, 3L, 0L, md5hex("UUU"))))
  }

  test("pair-graph plan stays broadcast off the memoized digest (no sort-merge joins)") {
    // localCheckpoint strips size stats, so without explicit broadcast()
    // hints the planner falls back to sort-merge joins (6 SMJs observed
    // in round 16 before the fix) — pin the plan shape
    val plan = MarketAnalytics.ouHalflifePairs(
      graft.model.Tables.rates(spark, sf("sf0.001")),
      memoKey = Some(sf("sf0.001") + "#planspec"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("zigzag pivots: anchor low, swing high, swing low on a hand path") {
    import spark.implicits._
    // closes (milli): 1000000 → 1150000 (+150k: anchor confirms as LOW,
    // leg up) → 1100000 (−50k: inside band, no-op) → 900000 (−250k:
    // HIGH at 1150000, leg down) → 1050000 (+150k: LOW at 900000)
    val closes = Seq(1000.0, 1150.0, 1100.0, 900.0, 1050.0)
    val days = (1 to 5).map(d => f"2024-01-0$d")
    val fx = days.zipWithIndex.map { case (d, i) =>
      (i.toLong, "Z", closes(i), d)
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
      .drop("ds")
    val out = MarketAnalytics.zigzagPivots(fx).collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getInt(3)))
    assert(out.toSeq.sortBy(_._1) == Seq(
      ("2024-01-01", 1000000L, -1),
      ("2024-01-02", 1150000L, 1),
      ("2024-01-04", 900000L, -1)))
  }

  test("daily-change corr: in [-1,1], NULL on zero variance, +1 on identical movers") {
    import spark.implicits._
    // two currencies moving in lockstep (with VARYING changes — constant
    // changes are zero-variance), one flat, over four days
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    val aPath = Seq(1.0, 1.1, 1.3, 1.6) // changes .1, .2, .3
    val fx = days.zipWithIndex.flatMap { case (d, i) =>
      Seq(("A", aPath(i)), ("B", 1.0 + aPath(i)), ("C", 5.0))
        .map { case (p, v) => (i * 10L + p.head.toLong, p, v, d) }
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.dailyChangeCorr(fx).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // identical changes -> 1 (up to the formula's double roundings)
    assert(math.abs(out(("A", "B")).get - 1.0) < 1e-12)
    assert(out(("A", "C")).isEmpty)       // C never moves -> zero variance
    assert(out(("B", "C")).isEmpty)

    // real data: every emitted corr is a valid Pearson value
    MarketAnalytics.dailyChangeCorr(rates).collect().foreach { r =>
      if (!r.isNullAt(3))
        assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
    }
  }

  test("trend OLS: exact slope and r2=1 on a perfect line, NULLs on degenerates") {
    import spark.implicits._
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    // A: perfect line 2.0 + 0.5/day; B: flat; C: single day
    val fx = days.zipWithIndex.flatMap { case (d, i) =>
      Seq(("A", 2.0 + 0.5 * i), ("B", 3.0)).map { case (p, v) =>
        (i * 10L + p.head.toLong, p, v, d)
      }
    } :+ (99L, "C", 7.0, "2024-01-02")
    val df = fx.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.trendOls(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getLong(1) == 4L)
    assert(math.abs(a.getDouble(2) - 500.0) < 1e-9)   // 0.5/day in milli
    assert(math.abs(a.getDouble(3) - 2000.0) < 1e-9)  // 2.0 at day 0
    assert(math.abs(a.getDouble(4) - 1.0) < 1e-12)    // perfect fit
    assert(out("B").isNullAt(4))                      // flat -> r2 NULL
    assert(out("C").isNullAt(2) && out("C").isNullAt(4)) // one day
  }

  test("autocorr: -1 on a perfectly alternating path, gaps break pairs") {
    import spark.implicits._
    // A: 1,2,1,2,1 over consecutive days → changes +1,-1,+1,-1 → lag-1
    // autocorr exactly -1. B: days 1,2,4,5 → the d2-change has no d3
    // neighbor, only the (d4,d5) change pair survives → n_days = 1
    val rows = Seq(
      ("A", "2024-01-01", 1.0), ("A", "2024-01-02", 2.0),
      ("A", "2024-01-03", 1.0), ("A", "2024-01-04", 2.0),
      ("A", "2024-01-05", 1.0),
      ("B", "2024-01-01", 1.0), ("B", "2024-01-02", 2.0),
      ("B", "2024-01-04", 4.0), ("B", "2024-01-05", 8.0))
    val df = rows.zipWithIndex.map { case ((p, d, v), i) => (i.toLong, p, v, d) }
      .toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.autocorr1d(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("A").getLong(1) == 3L)
    assert(math.abs(out("A").getDouble(2) + 1.0) < 1e-12)
    assert(out("B").getLong(1) == 1L)
    assert(out("B").isNullAt(2)) // one pair → zero variance → NULL
  }

  test("volatility: hand-computed stddev, NULL on a single change") {
    import spark.implicits._
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    // A: changes +0.1, +0.3, -0.2 → sample stddev of {100, 300, -200} milli
    val path = Seq(1.0, 1.1, 1.4, 1.2)
    val fx = days.zipWithIndex.flatMap { case (d, i) =>
      val rows = Seq(("A", path(i))) ++
        (if (i < 2) Seq(("B", 2.0 + i)) else Nil) // B: two days, one change
      rows.map { case (p, v) => (i * 10L + p.head.toLong, p, v, d) }
    }
    val df = fx.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.volatility(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val xs = Seq(100.0, 300.0, -200.0)
    val mean = xs.sum / 3
    val expect = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / 2)
    assert(math.abs(out("A").getDouble(2) - expect) < 1e-9)
    assert(out("B").getLong(1) == 1L && out("B").isNullAt(2))
  }

  test("max drawdown: deepest peak-to-trough fall, zero for a rising path") {
    import spark.implicits._
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    // A: 2.0 → 2.5 → 1.8 → 2.1: deepest fall 2.5−1.8 = 0.7 → 700 milli
    val a = Seq(2.0, 2.5, 1.8, 2.1)
    val fx = days.zipWithIndex.flatMap { case (d, i) =>
      Seq(("A", a(i)), ("B", 1.0 + i)).map { case (p, v) =>
        (i * 10L + p.head.toLong, p, v, d)
      }
    }
    val df = fx.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.maxDrawdown(df).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("A") == 700L)
    assert(out("B") == 0L) // monotone rise never draws down
  }

  test("gaps: bounds inclusive, adjacent days silent, leading/trailing not gaps") {
    import spark.implicits._
    // A quotes on d1, d2, d5, d9 → gaps [d3,d4] (2 days) and [d6,d8]
    // (3 days); B quotes daily → no rows; no gap is reported before a
    // pair's first or after its last quote (unknown ≠ missing)
    val rows = Seq(
      ("A", "2024-01-01"), ("A", "2024-01-02"), ("A", "2024-01-05"),
      ("A", "2024-01-09"),
      ("B", "2024-02-01"), ("B", "2024-02-02"), ("B", "2024-02-03"))
    val df = rows.zipWithIndex.map { case ((p, d), i) => (i.toLong, p, 1.0, d) }
      .toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.quoteGaps(df).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3))).sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      ("A", "2024-01-03", "2024-01-04", 2L),
      ("A", "2024-01-06", "2024-01-08", 3L)))
  }

  test("ema: recursive fold hand-replayed, single-day seed, order independence") {
    import spark.implicits._
    // A: closes 1, 2, 3 → e1=1000, e2=.25·2000+.75·1000=1250,
    // e3=.25·3000+.75·1250=1687.5 (milli); B: one day → EMA = close.
    // Rows arrive date-DESCENDING to prove the sort_array pin.
    val rows = Seq(
      ("A", "2024-01-03", 3.0), ("A", "2024-01-02", 2.0),
      ("A", "2024-01-01", 1.0), ("B", "2024-01-02", 9.5))
    val df = rows.zipWithIndex.map { case ((p, d, v), i) => (i.toLong, p, v, d) }
      .toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.emaDailyClose(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("A").getLong(1) == 3L)
    assert(out("A").getDouble(2) == 3000.0)   // last close
    assert(out("A").getDouble(3) == 1687.5)   // exact: every step binary-exact
    assert(out("B").getLong(1) == 1L)
    assert(out("B").getDouble(3) == 9500.0)   // seed convention e1 = x1
  }

  test("macd: hand-replayed three-state fold, single-day degenerates to zeros") {
    import spark.implicits._
    // A: closes 1, 2, 3 (milli 1000, 2000, 3000). Seed f=s=1000, sig=0.
    // day2: f=.25·2000+.75·1000=1250; s=.0625·2000+.9375·1000=1062.5;
    //       sig=.125·(1250−1062.5)=23.4375
    // day3: f=.25·3000+.75·1250=1687.5; s=.0625·3000+.9375·1062.5=1183.59375;
    //       macd=503.90625; sig=.125·503.90625+.875·23.4375=83.49609375
    val rows = Seq(
      ("A", "2024-01-03", 3.0), ("A", "2024-01-01", 1.0),
      ("A", "2024-01-02", 2.0), ("B", "2024-01-02", 9.5))
    val df = rows.zipWithIndex.map { case ((p, d, v), i) => (i.toLong, p, v, d) }
      .toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.macd(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("A").getLong(1) == 3L)
    assert(out("A").getDouble(2) == 1687.5 - 1183.59375)       // macd
    assert(out("A").getDouble(3) == 83.49609375)               // signal
    assert(out("A").getDouble(4) == (1687.5 - 1183.59375) - 83.49609375)
    // single observation: EMAs collapse to the seed → all three zero
    assert(out("B").getDouble(2) == 0.0)
    assert(out("B").getDouble(3) == 0.0)
    assert(out("B").getDouble(4) == 0.0)
  }

  test("backtest: warm-up flat, crossover trades next day, exact integer pnl") {
    import spark.implicits._
    // closes (milli) 1000,1000,1000,2000,3000 with fast=2, slow=3:
    // day3 ties (6000 > 6000 false — strict), day4 crosses (9000 > 8000)
    // → signal from day4, position from day5 → pnl = day5 change = 1000
    val closes = Seq(1.0, 1.0, 1.0, 2.0, 3.0)
    val df = closes.zipWithIndex.map { case (v, i) =>
      (i.toLong, "A", v, f"2024-01-${i + 1}%02d")
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val r = MarketAnalytics.backtestMaCrossover(df, fast = 2, slow = 3)
      .collect().head
    assert(r.getLong(1) == 5L)    // n_days
    assert(r.getLong(2) == 1L)    // one entry, no exit
    assert(r.getLong(3) == 1000L) // pnl: only day5 rides the position
    assert(r.getLong(4) == 1L)    // still long at the end
  }

  test("cusum: persistent drift alarms, reset on reversal, all-integer replay") {
    import spark.implicits._
    // changes (milli): +10, +10, +10, -40 with slack 5, alarm 14:
    // S+ walks 5, 10, 15 (alarm), then resets to 0 on the big reversal;
    // S- fires on the -40 day (35 > 14) → 2 alarm days total
    val deltas = Seq(0.010, 0.010, 0.010, -0.040)
    var c = 5.0
    val closes = c +: deltas.map { d => c += d; c }
    val df = closes.zipWithIndex.map { case (v, i) =>
      (i.toLong, "A", v, f"2024-01-${i + 1}%02d")
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val r = MarketAnalytics.cusum(df, slackMilli = 5L, alarmMilli = 14L)
      .collect().head
    assert(r.getLong(1) == 4L)   // n_changes
    assert(r.getLong(2) == 0L)   // S+ reset by the reversal
    assert(r.getLong(3) == 35L)  // S- after the -40 day
    assert(r.getLong(4) == 15L)  // max S+
    assert(r.getLong(5) == 35L)  // max S-
    assert(r.getLong(6) == 2L)   // one alarm per side
  }

  test("var/es: interpolated 5th pct, integer-defined tail mean, worst day") {
    import spark.implicits._
    // closes walk so that the 21 daily changes (milli) are exactly
    // -100, -90, ..., +100 (step 10, n=21): var95 interpolates between
    // the two smallest changes at pos 0.05·20 = 1.0 → exactly -90;
    // k = (21+19) div 20 = 2 → ES = (-100 + -90)/2 = -95
    val changes = (-100 to 100 by 10).map(_.toDouble / 1000.0)
    var close = 5.0
    val closes = close +: changes.map { c => close += c; close }
    val rows = closes.zipWithIndex.map { case (v, i) =>
      (i.toLong, "A", v, f"2024-01-${i + 1}%02d")
    }
    val df = rows.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.valueAtRisk(df).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 21L)                  // n_changes
    assert(r.getDouble(2) == -90.0)              // var95 (interpolated)
    assert(r.getDouble(3) == -95.0)              // es95 = mean of worst 2
    assert(r.getDate(4).toString == "2024-01-02") // worst change lands day 2
    assert(r.getLong(5) == -100L)
  }

  test("streaks: islands split on reversals, longest wins with earliest-start tie") {
    import spark.implicits._
    // closes 1,2,3,4,3,4,5 → changes +,+,+,−,+,+ : best up = 3 days
    // starting day 2; only down streak = 1 day at day 5
    val closes = Seq(1.0, 2.0, 3.0, 4.0, 3.0, 4.0, 5.0)
    val df = closes.zipWithIndex.map { case (v, i) =>
      (i.toLong, "A", v, f"2024-01-${i + 1}%02d")
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.streaks(df).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getDate(3).toString))).toMap
    assert(out(1) == ((3L, "2024-01-02")))
    assert(out(-1) == ((1L, "2024-01-05")))
  }

  test("holt: hand-replayed level/trend fold, single-day seeds, forecast line") {
    import spark.implicits._
    // closes 1,2,3 (milli 1000,2000,3000), α=1/4, β=1/8:
    // l2 = 1250, b2 = 31.25; l3 = .25·3000+.75·1281.25 = 1710.9375,
    // b3 = .125·460.9375 + .875·31.25 = 84.9609375 — all binary-exact
    val rows = Seq(("A", "2024-01-01", 1.0), ("A", "2024-01-03", 3.0),
      ("A", "2024-01-02", 2.0), ("B", "2024-01-02", 9.5))
    val df = rows.zipWithIndex.map { case ((p, d, v), i) => (i.toLong, p, v, d) }
      .toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.holtLinear(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("A").getDouble(2) == 1710.9375)
    assert(out("A").getDouble(3) == 84.9609375)
    assert(out("A").getDouble(4) == 1710.9375 + 84.9609375)
    assert(out("A").getDouble(5) == 1710.9375 + 84.9609375 * 5.0)
    // single observation: level = close, flat trend, flat forecast
    assert(out("B").getDouble(2) == 9500.0 && out("B").getDouble(3) == 0.0)
    assert(out("B").getDouble(4) == 9500.0)
  }

  test("kalman: hand-replayed gain/variance recursion, single-day seeds") {
    import spark.implicits._
    val rows = Seq(("A", "2024-01-01", 1.0), ("A", "2024-01-03", 3.0),
      ("A", "2024-01-02", 2.0), ("B", "2024-01-02", 9.5))
    val df = rows.zipWithIndex.map { case ((p, d, v), i) => (i.toLong, p, v, d) }
      .toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    // replay the recursion in plain doubles — the same IEEE op sequence
    // the fold executes (q=1, r=4; seeds xh=z1, p=1)
    var (xh, p) = (1000.0, 1.0)
    for (z <- Seq(2000.0, 3000.0)) {
      val pPred = p + 1.0
      val k = pPred / (pPred + 4.0)
      xh = xh + k * (z - xh)
      p = (1.0 - k) * pPred
    }
    val out = MarketAnalytics.kalmanFilter(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("A").getDouble(2) == xh)
    assert(out("A").getDouble(3) == p)
    assert(out("A").getDouble(4) == 3000.0 - xh)
    // variance climbs monotonically from the seed toward the Riccati
    // fixed point p* = (√17 − 1)/2 ≈ 1.5616 without overshooting
    assert(p > 1.0 && p < (math.sqrt(17.0) - 1.0) / 2.0)
    // single observation: estimate = close, seed variance, zero residual
    assert(out("B").getDouble(2) == 9500.0 && out("B").getDouble(3) == 1.0)
    assert(out("B").getDouble(4) == 0.0)
  }

  test("seasonality: per-hour profile isolates the noisy hour, bounded output") {
    import spark.implicits._
    // hour 0 constant at 2.0 (σ=0 → no anomalies by convention);
    // hour 1: 20 ticks at 1.0 plus one 100.0 spike → the spike is >3σ
    // FOR ITS HOUR and must be counted there and only there
    val ticks =
      (0 until 20).map(i => (i.toLong, "A", 2.0, 0)) ++
      (20 until 40).map(i => (i.toLong, "A", 1.0, 1)) ++
      Seq((40L, "A", 100.0, 1))
    val df = ticks.toDF("event_id", "ccy_couple", "rate", "hr")
      .withColumn("timestamp",
        to_timestamp(format_string("2024-01-01 %02d:00:00", col("hr"))))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .withColumn("date", to_date(col("timestamp")))
      .drop("hr")
    val out = MarketAnalytics.hourlySeasonality(df).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    assert(out.size == 2) // one row per observed (pair, hour)
    val h0 = out(("A", 0))
    assert(h0.getLong(2) == 20L && h0.getDouble(3) == 2000.0)
    assert(h0.getDouble(4) == 0.0 && h0.getLong(5) == 0L)
    val h1 = out(("A", 1))
    assert(h1.getLong(2) == 21L && h1.getLong(5) == 1L) // only the spike
  }

  test("candles: doji and engulfing flags on a hand-built two-day tape") {
    import spark.implicits._
    // day1: down candle open 2.0 → close 1.5 (range 2.1..1.4);
    // day2: up candle open 1.45 → close 2.05 engulfing day1's body;
    // day3: open 2.00, close 2.01 with range 1.5..2.5 → doji
    val ticks = Seq(
      ("A", "2024-01-01", 0L, 2.0), ("A", "2024-01-01", 1L, 2.1),
      ("A", "2024-01-01", 2L, 1.4), ("A", "2024-01-01", 3L, 1.5),
      ("A", "2024-01-02", 4L, 1.45), ("A", "2024-01-02", 5L, 2.05),
      ("A", "2024-01-03", 6L, 2.00), ("A", "2024-01-03", 7L, 2.5),
      ("A", "2024-01-03", 8L, 1.5), ("A", "2024-01-03", 9L, 2.01))
    val df = ticks.map { case (p, d, i, v) => (i, p, v, d) }
      .toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp",
        timestamp_micros(unix_micros(col("date").cast("timestamp")) + col("event_id")))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.candlePatterns(df).collect()
      .map(r => r.getDate(1).toString -> r).toMap
    assert(!out("2024-01-01").getBoolean(6)) // body 0.5 > 0.1·range 0.7
    assert(!out("2024-01-01").getBoolean(7)) // no predecessor → false
    assert(out("2024-01-02").getBoolean(7))  // bull engulfing
    assert(!out("2024-01-02").getBoolean(8))
    assert(out("2024-01-03").getBoolean(6))  // body 0.01 ≤ 0.1·range 1.0
    assert(!out("2024-01-03").getBoolean(7)) // day2 was up, no bull flip
  }

  test("conflate: last quote per slot survives, ties broken by event_id") {
    import spark.implicits._
    // slot 0 (0..1s): three quotes, the (t=999999, id=3) one wins over
    // the equal-time id=2; slot 1: single quote passes through
    val df = Seq(
      (1L, 500000L, "A", 1.0), (2L, 999999L, "A", 2.0),
      (3L, 999999L, "A", 3.0), (4L, 1500000L, "A", 4.0))
      .toDF("event_id", "event_time", "ccy_couple", "rate")
      .withColumn("date", to_date(lit("2024-01-01")))
      .withColumn("timestamp", timestamp_micros(col("event_time")))
    val out = graft.analysis.RateAnalysis.conflate(df, grainUs = 1000000L)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out.size == 2)
    assert(out(0L).getLong(2) == 3L && out(0L).getDouble(4) == 3.0)
    assert(out(1L).getLong(2) == 4L && out(1L).getDouble(4) == 4.0)
  }

  test("outliers: the spike is flagged with the right z, constant series silent") {
    import spark.implicits._
    // A: nineteen ticks at 2.000 and one at 9.000 — a single spike's z
    // is bounded by (n−1)/√n, so n must be ≥ ~12 for z to clear 3 at
    // all; at n=20 the spike sits at z ≈ 4.25 and is the ONLY flag.
    // C constant → σ = 0 → nothing (z undefined, not infinite)
    val rows = (1 to 19).map(i => ("A", 2.0, i)) ++ Seq(("A", 9.0, 20)) ++
      (1 to 5).map(i => ("C", 4.0, i))
    val df = rows.zipWithIndex.map { case ((p, v, _), i) => (i.toLong, p, v) }
      .toDF("event_id", "ccy_couple", "rate")
      .withColumn("date", to_date(lit("2024-01-01")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
    val out = MarketAnalytics.rateOutliers(df).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "A" && out.head.getLong(2) == 9000L)
    // hand z: mean 2350, sample sd = sqrt((19·350² + 6650²)/19)
    val sd = math.sqrt((19.0 * 350 * 350 + 6650.0 * 6650) / 19.0)
    assert(math.abs(out.head.getDouble(3) - 6650.0 / sd) < 1e-9)
  }

  test("rsi: all-gain pins 100, hand-computed folds replay exactly") {
    import spark.implicits._
    // A rises monotonically (no losses → the RSI=100 pin); C takes one
    // rise then one equal fall, exercising BOTH fold branches — the
    // zero slot on each side's off-day — against hand-computed values
    val rows = Seq(
      ("A", "2024-01-01", 1.0), ("A", "2024-01-02", 2.0),
      ("A", "2024-01-03", 3.0),
      ("C", "2024-01-01", 5.0), ("C", "2024-01-02", 6.0),
      ("C", "2024-01-03", 5.0))
    val df = rows.zipWithIndex.map { case ((p, d, v), i) => (i.toLong, p, v, d) }
      .toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.rsiWilder(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("A").getDouble(4) == 100.0)
    // C changes: +1000 then −1000 (milli). Gain fold: seed 1000, then
    // .0625·0 + .9375·1000 = 937.5; loss fold: seed 0, then
    // .0625·1000 + .9375·0 = 62.5 → rsi = 100 − 100/(1 + 937.5/62.5)
    val c = out("C")
    assert(c.getDouble(2) == 937.5 && c.getDouble(3) == 62.5)
    assert(c.getDouble(4) == 100.0 - 100.0 / (1.0 + 937.5 / 62.5))
  }

  test("bollinger: hand-computed band, constant series collapses, warm-up NULL") {
    import spark.implicits._
    // A day2 frame = [1000, 2000]: mean 1500, sample var
    // (2·5e6 − 9e6)/2 = 5e5, σ = √5e5; C constant → σ = 0 exactly
    val rows = Seq(
      ("A", "2024-01-01", 1.0), ("A", "2024-01-02", 2.0),
      ("C", "2024-01-01", 4.0), ("C", "2024-01-02", 4.0))
    val df = rows.zipWithIndex.map { case ((p, d, v), i) => (i.toLong, p, v, d) }
      .toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")))
      .drop("ds")
    val out = MarketAnalytics.bollingerBands(df).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r).toMap
    val a1 = out(("A", "2024-01-01"))
    assert(a1.isNullAt(4) && a1.isNullAt(5))  // 1-obs frame: σ undefined
    assert(a1.getDouble(3) == 1000.0)         // mean of the single obs
    val a2 = out(("A", "2024-01-02"))
    val sd = math.sqrt(5e5)
    assert(a2.getDouble(3) == 1500.0)
    assert(math.abs(a2.getDouble(4) - (1500.0 - 2.0 * sd)) < 1e-9)
    assert(math.abs(a2.getDouble(5) - (1500.0 + 2.0 * sd)) < 1e-9)
    val c2 = out(("C", "2024-01-02"))
    assert(c2.getDouble(4) == 4000.0 && c2.getDouble(5) == 4000.0)
  }

  test("market report: values equal the standalone metrics; exchanges reused at runtime") {
    val report = MarketAnalytics.marketReport(rates)
    val rows = report.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.nonEmpty)
    // spot-agree with the standalone metrics (identical expression
    // trees — equality must be EXACT, not approximate)
    val ema = MarketAnalytics.emaDailyClose(rates).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val vol = MarketAnalytics.volatility(rates).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    rows.foreach { case (p, r) =>
      assert(r.getDouble(3) == ema(p))
      val v = if (r.isNullAt(4)) None else Some(r.getDouble(4))
      assert(v == vol(p))
    }
    // the composed plan must actually share digest subtrees: after
    // execution, AQE replaces repeated branch exchanges with
    // ReusedExchange (3 observed; pin that SOME reuse fires so a plan
    // regression to five independent pipelines cannot land silently)
    val plan = report.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), plan.take(1500))
  }

  test("daily-change corr plan: broadcast pair frame, no shuffle in the quadratic stage") {
    val plan = MarketAnalytics.dailyChangeCorr(rates)
      .queryExecution.executedPlan.toString
    // the |pairs|^2 frame is a broadcast nested-loop over the tiny vector
    // relation — the |days| x |pairs|^2 row explosion through an Exchange
    // (the join-then-groupBy shape) must never come back
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("pair_moments"))
    // no aggregation after the pair frame: PairMoments IS the aggregation
    val afterJoin = plan.substring(0, plan.indexOf("BroadcastNestedLoopJoin"))
    assert(!afterJoin.contains("HashAggregate"))
  }

  test("pairs spread: exact hedge ratio, degenerate betas, z formula") {
    import spark.implicits._
    // one close per (couple, day): A = 2·B exactly (beta 2, zero
    // spread variance → z undefined), C constant (denominator 0 →
    // beta NULL), D wiggles (a real z)
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04")
    val closes = Map(
      "A" -> Seq(2.0, 4.0, 6.0, 8.0), "B" -> Seq(1.0, 2.0, 3.0, 4.0),
      "C" -> Seq(3.0, 3.0, 3.0, 3.0), "D" -> Seq(1.0, 2.0, 1.0, 6.0))
    val fx = (for {
      (cpl, cs) <- closes.toSeq
      (d, i) <- days.zipWithIndex
    } yield (cpl.hashCode.toLong * 10 + i,
        (86400000000L * i) + 3600000000L, cpl, cs(i), d))
      .toDF("event_id", "event_time", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", timestamp_micros(col("event_time")))
      .drop("ds")
    val out = MarketAnalytics.pairsSpread(fx).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 6 && out.values.forall(_.getLong(2) == 4L))
    assert(out(("A", "B")).getDouble(3) == 2.0)        // exact hedge ratio
    assert(out(("A", "B")).getString(6) == "na")       // zero-variance spread
    assert(out(("B", "C")).isNullAt(3))                // flat B-side → beta NULL
    assert(out(("B", "C")).getString(6) == "na")
    // (A, D): recompute z with the operator's own formula tree
    val ya = Seq(2000.0, 4000.0, 6000.0, 8000.0)
    val yd = Seq(1000.0, 2000.0, 1000.0, 6000.0)
    val n = 4.0
    val sa = ya.sum; val sd0 = yd.sum
    val sad = ya.zip(yd).map { case (p, q) => p * q }.sum
    val saa = ya.map(v => v * v).sum; val sdd = yd.map(v => v * v).sum
    val beta = (n * sad - sa * sd0) / (n * sdd - sd0 * sd0)
    val meanS = (sa - beta * sd0) / n
    val sdev = math.sqrt(math.max(
      (saa - 2.0 * beta * sad + beta * beta * sdd) / n - meanS * meanS, 0.0))
    val z = (ya.last - beta * yd.last - meanS) / sdev
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("A", "D")).getDouble(5) == r6(z))
    assert(out(("A", "D")).getString(6) ==
      (if (z > 2.0) "short_a" else if (z < -2.0) "long_a" else "flat"))
  }

  test("variance ratio: exact VR on hand series, z² rejection, NULL and length edges") {
    import spark.implicits._
    def mk(pair: String, closes: Seq[Double], idBase: Long) =
      closes.zipWithIndex.map { case (c, i) =>
        (idBase + i, idBase * 1000000L + i * 1000L, pair, c,
          java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString)
      }
    val alt8 = (0 until 8).map(i => if (i % 2 == 0) 1.000 else 1.001)
    val alt32 = (0 until 32).map(i => if (i % 2 == 0) 1.000 else 1.001)
    val lin7 = (0 until 7).map(i => 1.000 + 0.002 * i)
    val short6 = (0 until 6).map(i => 1.000 + 0.001 * (i % 2))
    val fx = (mk("ALT/S", alt8, 100) ++ mk("ALT/L", alt32, 200) ++
      mk("C/C", lin7, 300) ++ mk("S/S", short6, 400))
      .toDF("event_id", "event_time", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", timestamp_micros(col("event_time")))
      .drop("ds")
    val out = MarketAnalytics.varianceRatio(fx).collect()
      .map(r => r.getString(0) -> r).toMap
    // 6 closes -> 5 changes = q: below the n > q floor, absent entirely
    assert(out.size == 3 && !out.contains("S/S"))
    // the operator's own closing tree, recomputed from exact moments
    def expect(n: Long, nq: Long, s1: Long, s2: Long, t1: Long, t2: Long) = {
      val (nd, nqd) = (n.toDouble, nq.toDouble)
      val vr = ((nqd * t2 - t1.toDouble * t1) * nd * nd) /
        (5.0 * (nd * s2 - s1.toDouble * s1) * nqd * nqd)
      (vr, (vr - 1.0) * (vr - 1.0) / (72.0 / (15.0 * nd)))
    }
    // ALT/S: r = [+1,-1,+1,-1,+1,-1,+1]; q-sums [1,-1,1]
    val (vrS, zS) = expect(7, 3, 1, 7, 1, 3)
    val rS = out("ALT/S")
    assert(rS.getLong(1) == 7 && rS.getLong(2) == 3)
    assert(rS.getDouble(3) == vrS && rS.getDouble(4) == zS)
    assert(!rS.getBoolean(5) && zS < 3.8416) // n too small to reject
    // ALT/L: 31 alternating changes; 27 q-sums alternating +1/-1
    val (vrL, zL) = expect(31, 27, 1, 31, 1, 27)
    val rL = out("ALT/L")
    assert(rL.getDouble(3) == vrL && rL.getDouble(4) == zL)
    assert(rL.getBoolean(5) && zL > 3.8416) // anti-persistence detected
    // C/C: constant +2 changes -> zero 1-period variance -> 3VL NULLs
    val rC = out("C/C")
    assert(rC.isNullAt(3) && rC.isNullAt(4) && rC.isNullAt(5))
  }

  test("monday effect: Welch t² matches driver recompute; degenerate and floor arms") {
    import spark.implicits._
    val monVals = Map(8 -> 10, 15 -> 10, 22 -> 10, 29 -> 14)
    def restVal(d: Int) = if (d % 2 == 0) -1 else -3
    val changes = (2 to 30).map(d => d -> monVals.getOrElse(d, restVal(d)))
    def rows(pair: String, chg: Seq[(Int, Int)], idBase: Long) = {
      val closes = chg.scanLeft((1, 1.000)) { case ((_, c), (d, v)) =>
        (d, c + v / 1000.0) }
      closes.map { case (d, c) =>
        (idBase + d, idBase * 1000000L + d, pair, c, f"2024-01-$d%02d") }
    }
    val fx = (rows("W/1", changes, 100)
      ++ rows("C/C", (2 to 30).map(d => d -> 2), 200)   // constant: se²=0
      ++ rows("S/S", (2 to 6).map(d => d -> 1), 300))   // no Mondays: absent
      .toDF("event_id", "event_time", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", timestamp_micros(col("event_time")))
      .drop("ds")
    val out = MarketAnalytics.mondayEffect(fx).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 2 && !out.contains("S/S"))
    val (mon, rest) = changes.partition { case (d, _) =>
      java.time.LocalDate.of(2024, 1, d).getDayOfWeek.getValue == 1 }
    val (n1, n2) = (mon.size.toDouble, rest.size.toDouble)
    val (s1, s2) = (mon.map(_._2).sum.toDouble, rest.map(_._2).sum.toDouble)
    val q1 = mon.map(x => x._2.toLong * x._2).sum.toDouble
    val q2 = rest.map(x => x._2.toLong * x._2).sum.toDouble
    val md = s1 / n1 - s2 / n2
    val se2 = (n1 * q1 - s1 * s1) / (n1 * (n1 - 1.0)) / n1 +
      (n2 * q2 - s2 * s2) / (n2 * (n2 - 1.0)) / n2
    val w = out("W/1")
    assert(w.getLong(1) == 4 && w.getLong(2) == 25)
    assert(w.getDouble(3) == md && w.getDouble(4) == md * md / se2)
    assert(w.getBoolean(5) == (md * md / se2 > 3.8416))
    val c = out("C/C")
    assert(c.isNullAt(4) && c.isNullAt(5))
  }

  test("xs momentum: hand terciles, exact basket sums, boundary days dropped") {
    import spark.implicits._
    // closes only on days 1, 6, 7: day 6 is the single report day
    // (day 1 lacks a 5-day lookback, day 7 a next day); (sig, r) per
    // pair: longs {+60/+5, +50/+3}, shorts {-40/-7, -60/+4}
    val spec = Seq(("M/1", 60, 5), ("M/2", 50, 3), ("M/3", 20, -1),
      ("M/4", -10, 2), ("M/5", -40, -7), ("M/6", -60, 4))
    val rows = spec.zipWithIndex.flatMap { case ((p, sig, r), i) =>
      val c1 = 1.000
      val c6 = c1 + sig / 1000.0
      val c7 = c6 + r / 1000.0
      Seq((i * 10L + 1, i * 1000000L + 1, p, c1, "2024-01-01"),
        (i * 10L + 6, i * 1000000L + 6, p, c6, "2024-01-06"),
        (i * 10L + 7, i * 1000000L + 7, p, c7, "2024-01-07"))
    }.toDF("event_id", "event_time", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", timestamp_micros(col("event_time")))
      .drop("ds")
    val out = MarketAnalytics.crossSectionalMomentum(rows).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDate(0).toString == "2024-01-06")
    assert(r.getLong(1) == 6 && r.getLong(2) == 2)
    assert(r.getLong(3) == 8 && r.getLong(4) == -3)
    assert(r.getDouble(5) == 8.0 / 2.0 - (-3.0) / 2.0)
  }

  test("higher moments: hand skew/kurtosis exact; symmetric zero; degenerate NULL") {
    import spark.implicits._
    def mk(pair: String, changesMilli: Seq[Int], idBase: Long) = {
      val closes = changesMilli.scanLeft(1.000)((c, d) => c + d / 1000.0)
      closes.zipWithIndex.map { case (c, i) =>
        (idBase + i, idBase * 1000000L + i * 1000L, pair, c,
          java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString)
      }
    }
    val fx = (mk("S/Y", Seq(1, 2, 3), 100)    // symmetric: skew 0, g2 -1.5
      ++ mk("S/K", Seq(1, 1, 4), 200)         // right-skewed: g1² = 0.5
      ++ mk("C/C", Seq(2, 2, 2), 300))        // zero variance: NULLs
      .toDF("event_id", "event_time", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", timestamp_micros(col("event_time")))
      .drop("ds")
    val out = MarketAnalytics.higherMoments(fx).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 3)
    assert(out("S/Y").getDouble(2) == 0.0 &&
      out("S/Y").getDouble(3) == -1.5)
    // central sums: M2=6, M3=6, M4=18 -> g1² = 3·36/216 = 0.5, g2 = -1.5
    assert(out("S/K").getDouble(2) == 0.5 &&
      out("S/K").getDouble(3) == -1.5)
    assert(out("C/C").isNullAt(2) && out("C/C").isNullAt(3))
  }

  test("tail dependence: joint/disjoint/tied tails give λ = 1, 0, ½ exactly") {
    import spark.implicits._
    def mk(pair: String, changesMilli: Seq[Int], idBase: Long) = {
      val closes = changesMilli.scanLeft(1.000)((c, d) => c + d / 1000.0)
      closes.zipWithIndex.map { case (c, i) =>
        (idBase + i, idBase * 1000000L + i * 1000L, pair, c,
          java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString)
      }
    }
    def run(rows: Seq[(Long, Long, String, Double, String)]) =
      MarketAnalytics.tailDependencePairs(
        rows.toDF("event_id", "event_time", "ccy_couple", "rate", "ds")
          .withColumn("date", to_date(col("ds")))
          .withColumn("timestamp", timestamp_micros(col("event_time")))
          .drop("ds")).collect()
    val base = (1 to 20)
    // same extreme day on both sides: k=1, na=nb=1, joint=1 -> λ=1
    val a = run(mk("T/1", base.map(i => if (i == 5) 100 else i), 100)
      ++ mk("T/2", base.map(i => if (i == 5) 200 else 21 - i), 200))
    assert(a.length == 1)
    assert(a.head.getLong(2) == 20 && a.head.getLong(3) == 1)
    assert(a.head.getLong(4) == 1 && a.head.getLong(6) == 1)
    assert(a.head.getDouble(7) == 1.0)
    // extremes on different days -> joint=0, λ=0
    val b = run(mk("T/1", base.map(i => if (i == 2) 300 else i), 300)
      ++ mk("T/2", base.map(i => if (i == 17) 300 else 21 - i), 400))
    assert(b.head.getLong(6) == 0 && b.head.getDouble(7) == 0.0)
    // tied maxima on the src side: threshold ties enter the tail, na=2,
    // joint hits only the shared day -> λ = 1/2
    val c = run(
      mk("T/1", base.map(i => if (i == 3 || i == 9) 100 else i), 500)
        ++ mk("T/2", base.map(i => if (i == 3) 150 else 21 - i), 600))
    assert(c.head.getLong(4) == 2 && c.head.getLong(6) == 1)
    assert(c.head.getDouble(7) == 0.5)
  }

  test("spearman: tie-free hand value 0.8 exact; tie ranks doubled-average") {
    import spark.implicits._
    def mk(pair: String, closes: Seq[Double], idBase: Long) =
      closes.zipWithIndex.map { case (c, i) =>
        (idBase + i, idBase * 1000000L + i * 1000L, pair, c,
          java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString)
      }
    def df(rows: Seq[(Long, Long, String, Double, String)]) =
      rows.toDF("event_id", "event_time", "ccy_couple", "rate", "ds")
        .withColumn("date", to_date(col("ds")))
        .withColumn("timestamp", timestamp_micros(col("event_time")))
        .drop("ds")
    // changes x = [1,2,3,4,5], y = [10,30,20,50,40]: classic rho = 0.8,
    // exact here (sqrt(200·200) = 200 is an IEEE-exact square)
    val fxP = df(mk("P/1", Seq(1.000, 1.001, 1.003, 1.006, 1.010, 1.015), 100)
      ++ mk("P/2", Seq(1.000, 1.010, 1.040, 1.060, 1.110, 1.150), 200))
    val p = MarketAnalytics.spearmanPairs(fxP).collect()
    assert(p.length == 1)
    assert(p.head.getString(0) == "P/1" && p.head.getString(1) == "P/2")
    assert(p.head.getLong(2) == 5 && p.head.getDouble(3) == 0.8)
    // ties both sides: x = [1,1,2,3] -> doubled ranks [3,3,6,8];
    // y = [5,5,5,1] -> [6,6,6,2]; rho = -48/sqrt(72*48)
    val fxQ = df(mk("Q/1", Seq(1.000, 1.001, 1.002, 1.004, 1.007), 300)
      ++ mk("Q/2", Seq(1.000, 1.005, 1.010, 1.015, 1.016), 400))
    val q = MarketAnalytics.spearmanPairs(fxQ).collect()
    assert(q.length == 1)
    assert(q.head.getLong(2) == 4)
    assert(q.head.getDouble(3) == -48.0 / math.sqrt(72.0 * 48.0))
  }

  test("lead-lag short series: span < maxLag clamps to empty slice, no throw") {
    import spark.implicits._
    // 3 days -> change vectors of length 2, strictly shorter than the
    // default maxLag = 3: the pre-clamp code passed a NEGATIVE length
    // to slice() for lag = 3 and threw at runtime; the clamp yields an
    // empty shifted slice -> n = 0 overlap -> the lag row is dropped
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    val fx = days.zipWithIndex.flatMap { case (d, i) =>
      Seq(("X", 1000L + 2L * i), ("Y", 2000L + 3L * i)).map { case (p, c) =>
        (i * 10L + p.head.toLong, p, c / 1000.0, d) }
    }.toDF("event_id", "ccy_couple", "rate", "ds")
      .withColumn("date", to_date(col("ds")))
      .withColumn("timestamp", col("date").cast("timestamp"))
      .withColumn("event_time", unix_micros(col("timestamp")) + col("event_id"))
      .drop("ds")
    val ll = MarketAnalytics.leadLagPairs(fx, topN = 1).collect()
    // no lag can exceed span − 1 = 1 (lag 2 has one overlap but zero
    // variance -> NULL corr is still rankable; lag 3 has n = 0 and is
    // dropped before ranking) — the only hard assertion the clamp owes
    // is "evaluates without throwing" plus lag bounds on what survives
    assert(ll.forall(r => r.getLong(2) >= 0L && r.getLong(2) <= 2L))
  }
}
