package graft

import org.apache.spark.sql.functions._

import graft.analysis.EventAnalytics
import graft.model.Tables

class EventAnalyticsSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("funnel: stage timestamps strictly ordered, stage matches nulls") {
    val out = EventAnalytics.funnel(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = Option(r.getTimestamp(1)).map(_.getTime)
      val c = Option(r.getTimestamp(2)).map(_.getTime)
      val p = Option(r.getTimestamp(3)).map(_.getTime)
      assert(v.isDefined) // base stage always present
      // a later stage implies the earlier one, strictly after it
      if (p.isDefined) assert(c.isDefined && p.get > c.get)
      if (c.isDefined) assert(c.get > v.get)
      val expected = if (p.isDefined) 3 else if (c.isDefined) 2 else 1
      assert(r.getInt(4) == expected)
    }
  }

  test("funnel: out-of-order events don't count (click before first view)") {
    import spark.implicits._
    // user 1 clicks BEFORE its first view -> funnel stops at view;
    // user 2 converts fully
    val ev = Seq(
      (1L, 1L, "click", "2024-01-01 00:00:01"),
      (2L, 1L, "view", "2024-01-01 00:00:05"),
      (3L, 2L, "view", "2024-01-01 00:00:01"),
      (4L, 2L, "click", "2024-01-01 00:00:02"),
      (5L, 2L, "purchase", "2024-01-01 00:00:03")
    ).toDF("event_id", "user_id", "event_type", "tss")
      // Tables.events expects the feed's INT64-nanos ts (it does
      // `ts div 1000` before timestamp_micros), so stamp raw nanos
      .withColumn("ts", unix_micros(to_timestamp(col("tss"))) * 1000L)
      .drop("tss")
    val tmp = graft.util.Scratch.dir("graft_funnel_fix").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = EventAnalytics.funnel(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out(1L) == 1)
    assert(out(2L) == 3)
  }

  test("retention: offset-0 diagonal equals cohort sizes; matrix mass equals activity") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val matrix = EventAnalytics.retentionCohorts(spark, dir).collect()
    // every (user,day) activity lands in exactly one cell
    assert(matrix.map(_.getLong(2)).sum == ev.count())
    // offset 0 counts each cohort's full membership (first-day activity)
    val cohortSizes = ev.groupBy("user_id").agg(min(col("d")).as("c"))
      .groupBy("c").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    matrix.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) == cohortSizes(r.getDate(0).toString))
    }
    // offsets are non-negative (cohort day is the min by construction)
    assert(matrix.forall(_.getLong(1) >= 0L))
  }

  test("transitions: hand tape, row-normalized probs, event_id tiebreak") {
    import spark.implicits._
    // user 1: view->click->purchase; user 2: view->view;
    // user 3: two SAME-ts events — event_id must break the tie (8 then 9)
    val ev = Seq(
      (1L, 1L, "view", "2024-01-01 00:00:01"),
      (2L, 1L, "click", "2024-01-01 00:00:02"),
      (3L, 1L, "purchase", "2024-01-01 00:00:03"),
      (4L, 2L, "view", "2024-01-01 00:00:01"),
      (5L, 2L, "view", "2024-01-01 00:00:02"),
      (8L, 3L, "error", "2024-01-01 00:00:09"),
      (9L, 3L, "view", "2024-01-01 00:00:09")
    ).toDF("event_id", "user_id", "event_type", "tss")
      .withColumn("ts", unix_micros(to_timestamp(col("tss"))) * 1000L)
      .drop("tss")
    val tmp = graft.util.Scratch.dir("graft_trans_fix").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = EventAnalytics.transitionMatrix(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("view", "click")) == (1L, 0.5))
    assert(out(("view", "view")) == (1L, 0.5))
    assert(out(("click", "purchase")) == (1L, 1.0))
    assert(out(("error", "view")) == (1L, 1.0))
    assert(out.size == 4) // terminal events emit no transition
  }

  test("trending: recent-but-smaller beats old-but-bigger, exact dyadic scores") {
    import spark.implicits._
    // A: 100 events 3 half-lives old (weight 1/8 → 12.5);
    // B: 20 events on the anchor day (weight 1 → 20): B must outrank A
    val rows = Seq.fill(100)("A" -> "2024-01-01 10:00:00") ++
      Seq.fill(20)("B" -> "2024-01-22 10:00:00")
    val ev = rows.toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = EventAnalytics.trending(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3))))
      .toMap
    assert(out("A") == ((100L, 12.5, 2)))
    assert(out("B") == ((20L, 20.0, 1)))
  }

  test("trending incremental: late anchor-moving batch; equals one-shot") {
    import spark.implicits._
    def df(rs: Seq[(String, String)]) = rs.toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).select("event_type", "ts")
    val all = Seq.fill(100)("A" -> "2024-01-01 10:00:00") ++
      Seq.fill(20)("B" -> "2024-01-22 10:00:00")
    val counts = graft.util.Scratch.dir("trend_inc").resolve("c").toString
    // batch 1 sees only the OLD events; the late batch moves the anchor
    // from Jan 1 to Jan 22 and must re-level everything at report time
    val (b1, b2) = all.partition(_._2 < "2024-01-10")
    EventAnalytics.appendTrendingBatch(spark, counts, df(b1),
      batchId = Some(0L))
    EventAnalytics.appendTrendingBatch(spark, counts, df(b2),
      batchId = Some(1L))
    EventAnalytics.appendTrendingBatch(spark, counts, df(b2),
      batchId = Some(1L)) // re-delivery no-op
    val oneShot = EventAnalytics.trending(df(all)).collect()
      .map(_.toSeq).toSet
    val fromState = EventAnalytics.trendingFromPartials(spark, counts)
      .collect().map(_.toSeq).toSet
    assert(fromState == oneShot)
    assert(oneShot.exists(r => r(0) == "B" && r(3) == 1))
  }

  /** The arm function the operator promises: first md5 nibble of the
    * id's decimal string, 0-7 → arm 0, 8-f → arm 1.
    */
  private def md5Arm(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) <= 7) 0 else 1
  }

  test("CUPED: a perfect covariate gives theta = 2, rho_sq = 1, and flattens both arms to the grand mean") {
    import java.sql.Timestamp
    import spark.implicits._
    // user u spends u.00 in the pre half and exactly 2u.00 in the post
    // half: x = 100u cents, y = 200u → theta = 2 exactly, rho_sq = 1,
    // and Y_adj = 2·x̄ for EVERY user, so both arms' adjusted means
    // collapse to the same grand value whatever the md5 arms are
    val rows = (1L to 8L).flatMap { u =>
      Seq((u, u.toDouble, "2024-01-01"), (u, 2.0 * u, "2024-01-10"))
    }.map { case (u, v, d) =>
      (u, v, Timestamp.valueOf(d + " 00:00:00"))
    }.toDF("user_id", "value", "ts")
    val out = EventAnalytics.cupedReadout(rows).collect()
    assert(out.nonEmpty && out.length <= 2)
    val xbar = (1 to 8).map(_ * 100L).sum.toDouble / 8 // cents
    out.foreach { r =>
      assert(r.getDouble(4) == 2.0) // theta
      assert(r.getDouble(5) == 1.0) // rho_sq
      assert(math.abs(r.getDouble(3) - 2.0 * xbar / 100.0) < 1e-9)
    }
  }

  test("ab test: hand z-statistic, md5-hashed arms, significance branch") {
    import spark.implicits._
    // A lopsided experiment that must read significant: in arm 0 only
    // the lowest-id user converts, in arm 1 everyone but the lowest-id
    // user converts. Expected arms computed with the same md5-nibble
    // function the operator promises, NOT parity.
    val ids = (0 until 20).map(_.toLong)
    val arm = ids.map(u => u -> md5Arm(u)).toMap
    val lo0 = ids.filter(arm(_) == 0).min
    val lo1 = ids.filter(arm(_) == 1).min
    val rows = ids.map { u =>
      val converts = if (arm(u) == 0) u == lo0 else u != lo1
      u -> (if (converts) "purchase" else "view")
    }
    val ev = rows.toDF("user_id", "event_type")
    val r = EventAnalytics.abTest(ev, minPurchases = 1).collect().head
    val n0 = ids.count(arm(_) == 0).toDouble
    val n1 = 20.0 - n0
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n0.toLong, n1.toLong, 1L, n1.toLong - 1L)))
    val p0 = 1.0 / n0; val p1 = (n1 - 1.0) / n1
    val pooled = n1 / 20.0
    val z = (p1 - p0) /
      math.sqrt(pooled * (1.0 - pooled) * (1.0 / n0 + 1.0 / n1))
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(7) == r6(z))
    assert(r.getBoolean(8))
    // THE POINT OF HASHING: sequential id allocation must not skew the
    // arms — 1000 consecutive ids land near 50/50 (parity would too,
    // but parity breaks the moment ids carry shard/cohort structure;
    // the md5 bucket is independent of any id-allocation pattern)
    val seq = (0L until 1000L).map(u => u -> "view")
      .toDF("user_id", "event_type")
    val b = EventAnalytics.abTest(seq, minPurchases = 1).collect().head
    assert(b.getLong(0) + b.getLong(1) == 1000L)
    assert(b.getLong(0) > 400L && b.getLong(0) < 600L)
    // and the Spark-side arm equals the reference md5Arm on every id
    assert((0L until 1000L).count(md5Arm(_) == 0).toLong == b.getLong(0))
    // all-convert arms: zero pooled variance → z undefined, never
    // significant (and never an ANSI divide-by-zero)
    val flat = (0 until 20).map(u => u.toLong -> "purchase")
      .toDF("user_id", "event_type")
    val f = EventAnalytics.abTest(flat, minPurchases = 1).collect().head
    assert(f.isNullAt(7) && !f.getBoolean(8))
  }
}
