package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Event-sequence analytics over the `events` table: conversion funnels
  * and retention cohorts — the two queries every product/behavior
  * pipeline runs at scale, absent from the reference (whose analytics
  * stop at rate reports) but first-class for a 100 TB event store.
  *
  * Scale shape: every stage below shuffles on `user_id` and ONLY on
  * user_id, so the per-user aggregations partial-combine map-side and the
  * stage joins reuse one consistent partitioning; nothing materializes
  * per-user event lists (no collect_list), and the outputs are bounded by
  * |users| (funnel) and |days|² (retention matrix).
  */
object EventAnalytics {

  /** Ordered conversion funnel view → click → purchase: per user, the
    * earliest view, the earliest click STRICTLY after that view, and the
    * earliest purchase strictly after that click. Stage joins are
    * conditional-min aggregations (min ts is deterministic regardless of
    * event_id ties — equal-ts pairs compare strictly on ts alone, same
    * rule in the oracle).
    */
  /** A/B EXPERIMENT readout with deterministic hash-bucket assignment:
    * users split into two arms on the first md5 nibble of their id's
    * decimal string (0-7 → arm 0, 8-f → arm 1 — the same no-RNG
    * discipline as Curation's hashSample). A raw `id % 2` would NOT do:
    * sequential or sharded id allocation makes parity correlate with
    * signup time, shard, or migration cohort — exactly the bias hashing
    * exists to kill. Conversion = "at least `minPurchases` purchase
    * events", then the two-proportion z-test on the arms. All counts are
    * exact longs; the z statistic is one fixed double formula over
    * identical operands, so the report is bit-reproducible.
    *
    * Scale shape: one groupBy to the per-user digest, then a single
    * map-side-combinable 1-row aggregate — two shuffles total and the
    * second is over |users| rows.
    */
  def abTest(events: DataFrame, minPurchases: Int = 15): DataFrame = {
    val per = events
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("np"))
      .select(when(substring(md5(col("user_id").cast("string")), 1, 1) <= "7",
          0L).otherwise(1L).as("arm"),
        when(col("np") >= minPurchases, 1L).otherwise(0L).as("conv"))
    val m = per.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c0"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c1"))
    val n0 = col("n0").cast("double"); val n1 = col("n1").cast("double")
    val c0 = col("c0").cast("double"); val c1 = col("c1").cast("double")
    val p0 = c0 / n0
    val p1 = c1 / n1
    val pooled = (c0 + c1) / (n0 + n1)
    // all-convert / none-convert arms have zero pooled variance: the
    // test is undefined (NULL), not significant — never an ANSI 0/0
    val z = (p1 - p0) / nullif(
      sqrt(pooled * (lit(1.0) - pooled) * (lit(1.0) / n0 + lit(1.0) / n1)),
      lit(0.0))
    m.select(col("n0"), col("n1"), col("c0"), col("c1"),
      round(p0, 6).as("p0"), round(p1, 6).as("p1"),
      round(p1 - p0, 6).as("lift"),
      round(z, 6).as("z"),
      coalesce(abs(z) > 1.96, lit(false)).as("significant"))
  }

  /** CUPED variance-reduced experiment readout (Deng et al. 2013 —
    * public method; the industry-standard sensitivity booster): each
    * user's PRE-period spend (first calendar half — independent of
    * assignment by construction) is the control covariate for their
    * experiment-period spend, Y_adj = Y − θ(X − X̄) with the pooled
    * θ = cov(X, Y)/var(X). Per-user sums are exact (DECIMAL cents →
    * longs), all moments exact longs, θ/ρ² the usual double trees over
    * identical operands; `rho_sq` IS the variance reduction CUPED buys.
    * Same hash-bucket arms as [[abTest]].
    *
    * Scale shape: one groupBy to the per-user digest, one 1-row moment
    * aggregate, one per-arm aggregate — map-side combinable throughout.
    */
  def cupedReadout(events: DataFrame): DataFrame = {
    val s0 = events.select(col("user_id"),
      col("value").cast("decimal(18,2)").as("v"), to_date(col("ts")).as("d"))
    val span = s0.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val per = s0.crossJoin(broadcast(span))
      .withColumn("is_pre", col("d") < date_add(col("d0"),
        (datediff(col("d1"), col("d0")) / 2).cast("int")))
      .groupBy(col("user_id"))
      .agg(
        (coalesce(sum(when(col("is_pre"), col("v"))),
          lit(0).cast("decimal(18,2)")) * 100).cast("long").as("x"),
        (coalesce(sum(when(!col("is_pre"), col("v"))),
          lit(0).cast("decimal(18,2)")) * 100).cast("long").as("y"))
      .select(when(substring(md5(col("user_id").cast("string")), 1, 1)
          <= "7", 0L).otherwise(1L).as("arm"), col("x"), col("y"))
      .localCheckpoint()
    val mo = per.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    val theta = when(den > 0L, num.cast("double") / den.cast("double"))
    val rhoSq = when(den > 0L && deny > 0L,
      num.cast("double") * num.cast("double")
        / (den.cast("double") * deny.cast("double")))
    val xbar = col("sx").cast("double") / col("n").cast("double")
    val arms = per.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("ax"),
        sum(col("y")).as("ay"))
    arms.crossJoin(broadcast(mo.select(theta.as("theta"),
        rhoSq.as("rho_sq"), xbar.as("xbar"))))
      .select(col("arm"), col("n_users"),
        (col("ay").cast("double") / col("n_users").cast("double")
          / 100.0).as("mean_y"),
        ((col("ay").cast("double") / col("n_users").cast("double")
          - col("theta") * (col("ax").cast("double")
            / col("n_users").cast("double") - col("xbar")))
          / 100.0).as("mean_y_adj"),
        col("theta"), col("rho_sq"))
  }

  /** TRENDING ranking with exponential time decay (the HN/Reddit
    * hotness shape): each event weighs 2^-(age/halflifeDays weeks,
    * floored) anchored at the corpus's latest day, so recent activity
    * dominates. The decay base is DYADIC BY DESIGN — every weight is a
    * negative power of two, so each term and every partial sum is
    * exactly representable and the double aggregation is
    * order-independent WITHOUT an ordered fold (libm pow() never runs:
    * the weight is 1 / (1L << level)).
    *
    * Shape: one groupBy to the (type, level) digest — map-side
    * combinable, ≤ types × levels rows — then a |types|-row ranking.
    */
  def trending(events: DataFrame, halflifeDays: Int = 7): DataFrame =
    trendingFromDaily(
      events.select(col("event_type"), to_date(col("ts")).as("date"))
        .groupBy(col("event_type"), col("date")).agg(count(lit(1)).as("n")),
      halflifeDays)

  /** Batch half of INCREMENTAL trending maintenance: append this
    * batch's (event_type, date) partial counts — O(batch)/batch, LSM
    * shape, batchId-idempotent. Decay LEVELS derive from the maintained
    * span at report time (the drift-monitor discipline: a late batch
    * can move the anchor day, so the state is the daily digest, never
    * pre-decayed scores).
    */
  def appendTrendingBatch(s: SparkSession, countsDir: String,
      batch: DataFrame, batchId: Option[Long] = None): Unit = {
    val marker = batchId.map { id =>
      val p = new org.apache.hadoop.fs.Path(s"$countsDir/_applied/batch-$id")
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    if (marker.exists { case (fs, p) => fs.exists(p) }) return
    graft.util.BatchAppend.append(
      batch.select(col("event_type"), to_date(col("ts")).as("date"))
        .groupBy(col("event_type"), col("date")).agg(count(lit(1)).as("n")),
      s"$countsDir/partials", batchId)
    marker.foreach { case (fs, p) =>
      fs.mkdirs(p.getParent); fs.create(p, true).close() }
  }

  /** Report half: fold the maintained daily digest and rank — must
    * equal the one-shot [[trending]] bit for bit.
    */
  def trendingFromPartials(s: SparkSession, countsDir: String,
      halflifeDays: Int = 7): DataFrame =
    trendingFromDaily(
      s.read.parquet(s"$countsDir/partials")
        .groupBy(col("event_type"), col("date")).agg(sum(col("n")).as("n")),
      halflifeDays)

  private def trendingFromDaily(daily: DataFrame,
      halflifeDays: Int): DataFrame = {
    val d1 = daily.agg(max(col("date")).as("d1"))
    val lvl = daily.crossJoin(broadcast(d1))
      .select(col("event_type"),
        (datediff(col("d1"), col("date")) / halflifeDays)
          .cast("int").as("lvl"), col("n"))
      .groupBy(col("event_type"), col("lvl"))
      .agg(sum(col("n")).as("n"))
    val scored = lvl.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        sum(col("n").cast("double")
          / expr("shiftleft(CAST(1 AS BIGINT), lvl)").cast("double"))
          .as("hot_score"))
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col("hot_score").desc,
        col("event_type").asc)))
  }

  def funnel(s: SparkSession, dir: String,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
      col("ts"))
    val first = ev.where(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("step0_ts"))
    val chained = steps.zipWithIndex.tail.foldLeft(first) {
      case (prev, (step, i)) =>
        val prevTs = col(s"step${i - 1}_ts")
        val next = ev.where(col("event_type") === step)
          .join(prev.select(col("user_id"), prevTs), "user_id")
          .where(col("ts") > prevTs)
          .groupBy(col("user_id")).agg(min(col("ts")).as(s"step${i}_ts"))
        prev.join(next, Seq("user_id"), "left")
    }
    // ascending fold wraps the HIGHEST step's check outermost, so the
    // deepest stage reached wins the CASE chain
    val stage = steps.indices
      .foldLeft(lit(0)) { (acc, i) =>
        when(col(s"step${i}_ts").isNotNull, lit(i + 1)).otherwise(acc)
      }
    chained.select(col("user_id") +:
      steps.indices.map(i => col(s"step${i}_ts").as(s"${steps(i)}_ts")) :+
      stage.as("stage_reached"): _*)
  }

  /** Retention-cohort matrix: cohort day = a user's first-ever event day;
    * a cell (cohort_day, day_offset) counts the cohort's users active
    * that many days later. The distinct (user, day) reduction happens
    * BEFORE the cohort join, so the joined relation is |users|×|days| at
    * most — never the raw event volume.
    */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
    val active = ev.distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for every observed (from_type, to_type) step, the exact transition
    * count and the row-normalized probability — the behavioral model
    * under next-event prediction, anomaly scoring, and journey analysis.
    *
    * One lead() window shuffles the corpus on user_id (the same
    * partitioning every other per-user stage here uses); the counts
    * aggregate to a ≤|types|² digest, and the per-from normalization
    * window runs over that digest, never the ticks. Ordering is the
    * (ts, event_id) total order, so equal-timestamp steps are
    * deterministic; `prob` is one IEEE division of exact longs.
    */
  def transitionMatrix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(seq))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val perFrom = Window.partitionBy(col("from_type"))
    steps.withColumn("prob", col("n_transitions").cast("double") /
      sum(col("n_transitions")).over(perFrom).cast("double"))
  }
}
