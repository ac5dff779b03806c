package graft

import org.apache.spark.sql.functions._

import graft.model.Tables

/** `q_approx_stats` is oracle-checked since round 14: the row carries
  * exact anchors the oracle recomputes, plus bound-check booleans the
  * oracle asserts as TRUE literals. This spec is where bound TIGHTNESS
  * stays a tested contract: the booleans must hold, the anchors must
  * equal an independent exact recomputation, and the raw sketch outputs
  * (recomputed here — the gate row intentionally hides them) must sit in
  * windows tighter than the gate's: HLL within 3·rsd, percentile_approx
  * within a ±0.01 rank window (10× the sketch's 1/accuracy rank-error
  * bound, vs the gate's ±0.02).
  */
class ApproxStatsSpec extends SparkSuite {

  test("approx_count_distinct and percentile_approx stay within bounds") {
    val dir = sf("sf0.01")
    val gate = SparkEntry.queries("q_approx_stats")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val raw = Tables.events(spark, dir).groupBy(col("event_type")).agg(
      approx_count_distinct(col("user_id")).as("approx_users"),
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_value"),
      percentile_approx(col("value"), lit(0.99), lit(1000)).as("p99_value"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Tables.events(spark, dir).groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("n_users"),
      percentile(col("value"), lit(0.5)).as("p50"),
      percentile(col("value"), lit(0.99)).as("p99"),
      percentile(col("value"), lit(0.49)).as("p50_lo"),
      percentile(col("value"), lit(0.51)).as("p50_hi"),
      percentile(col("value"), lit(0.98)).as("p99_lo"),
      max(col("value")).as("p99_hi"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(gate.keySet == exact.keySet)
    gate.keySet.foreach { t =>
      val g = gate(t); val a = raw(t); val e = exact(t)
      // the gate's own bound checks must hold
      assert(g.getAs[Boolean]("users_ok"), s"$t: users_ok false")
      assert(g.getAs[Boolean]("p50_ok"), s"$t: p50_ok false")
      assert(g.getAs[Boolean]("p99_ok"), s"$t: p99_ok false")
      // the exact anchors must equal an independent recomputation
      assert(g.getAs[Long]("n_users_exact") == e.getAs[Long]("n_users"),
        s"$t: anchor n_users_exact drifted")
      assert(g.getAs[Double]("p50_exact") == e.getAs[Double]("p50"),
        s"$t: anchor p50_exact drifted")
      assert(g.getAs[Double]("p99_exact") == e.getAs[Double]("p99"),
        s"$t: anchor p99_exact drifted")
      // tightness: raw sketches inside windows TIGHTER than the gate's
      val nExact = e.getAs[Long]("n_users").toDouble
      val nApprox = a.getAs[Long]("approx_users").toDouble
      // HLL++ default rsd = 5%; allow 3 sigma plus integer slack
      assert(math.abs(nApprox - nExact) <= 0.15 * nExact + 1.0,
        s"$t: approx distinct $nApprox vs exact $nExact")
      val p50 = a.getAs[Double]("p50_value")
      assert(p50 >= e.getAs[Double]("p50_lo") && p50 <= e.getAs[Double]("p50_hi"),
        s"$t: p50 $p50 outside exact rank window")
      val p99 = a.getAs[Double]("p99_value")
      assert(p99 >= e.getAs[Double]("p99_lo") && p99 <= e.getAs[Double]("p99_hi"),
        s"$t: p99 $p99 outside exact rank window")
    }
  }
}
