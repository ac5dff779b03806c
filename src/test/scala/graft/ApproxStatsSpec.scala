package graft

import org.apache.spark.sql.functions._

import graft.model.Tables

/** `q_approx_stats` is rows-only at the gate (sketches are
  * engine-specific by design) — this spec is where "approximate" becomes
  * a TESTED contract instead of an unchecked claim: HLL distinct counts
  * within the published relative standard deviation, and
  * percentile_approx(accuracy=1000) within a ±0.01 rank window of the
  * exact interpolated quantiles (10× the sketch's 1/accuracy rank-error
  * bound).
  */
class ApproxStatsSpec extends SparkSuite {

  test("approx_count_distinct and percentile_approx stay within bounds") {
    val dir = sf("sf0.01")
    val approx = SparkEntry.queries("q_approx_stats")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Tables.events(spark, dir).groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("n_users"),
      percentile(col("value"), lit(0.49)).as("p50_lo"),
      percentile(col("value"), lit(0.51)).as("p50_hi"),
      percentile(col("value"), lit(0.98)).as("p99_lo"),
      max(col("value")).as("p99_hi"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(approx.keySet == exact.keySet)
    approx.keySet.foreach { t =>
      val a = approx(t); val e = exact(t)
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
