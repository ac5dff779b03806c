package graft

import org.apache.spark.sql.functions._

import graft.analysis.CustomerAnalytics

class CustomerAnalyticsSpec extends SparkSuite {

  test("rfm: four customers spread one per quartile on every axis") {
    import spark.implicits._
    // customer k: k orders of 100.00 on its own date — frequency 1..4,
    // monetary 100..400, recency 0/2/4/6 days before the max date, so
    // quantile_cont boundaries at n=4 split them one per quartile
    val rows = for {
      k <- 1 to 4
      _ <- 1 to k
    } yield (k.toLong, Seq("2024-01-10", "2024-01-08", "2024-01-06",
      "2024-01-04")(k - 1), 100.0)
    val orders = rows.toDF("o_custkey", "ds", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("ds"))).drop("ds")
    val tmp = graft.util.Scratch.dir("graft_rfm_fix").toString
    orders.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = CustomerAnalytics.rfmSegments(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 4)
    def scores(k: Long) = {
      val r = out(k)
      (r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))
    }
    assert(scores(1L) == ((4, 1, 1, "411"))) // newest, least valuable
    assert(scores(2L) == ((3, 2, 2, "322")))
    assert(scores(3L) == ((2, 3, 3, "233")))
    assert(scores(4L) == ((1, 4, 4, "144"))) // oldest, most valuable
    // raw metrics exact
    assert(out(4L).getLong(1) == 6L) // recency_days
    assert(out(4L).getLong(2) == 4L) // frequency
    assert(out(4L).getLong(3) == 40000L) // monetary_cents
  }

  test("rfm: real data — scores in 1..4, quartile mass roughly balanced") {
    val out = CustomerAnalytics.rfmSegments(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq(4, 5, 6).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 4))
      assert(r.getString(7).length == 3)
    }
    // each frequency quartile holds at least one customer and no
    // quartile holds everything (boundaries are interior by definition)
    val byF = out.groupBy(_.getInt(5)).view.mapValues(_.length)
    assert(byF.size >= 2)
  }

  test("pareto ABC bands flip at exactly 70% and 90% of the grand total") {
    import spark.implicits._
    // revenues 70/15/10/5 → cumulative 70, 85, 95, 100 of a 100 total:
    // 70·10 ≤ 700 → A (boundary inclusive); 85·10 ≤ 900 → B; then C
    val orders = Seq(
      (1L, 10L, new java.math.BigDecimal("70.00")),
      (2L, 20L, new java.math.BigDecimal("15.00")),
      (3L, 30L, new java.math.BigDecimal("10.00")),
      (4L, 40L, new java.math.BigDecimal("5.00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val tmp = graft.util.Scratch.dir("graft_pareto_fix")
    orders.write.mode("overwrite")
      .parquet(tmp.resolve("orders.parquet").toString)
    val got = graft.queries.BreadthQueries
      .paretoCustomers(spark, tmp.toString, k = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5))).toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 10L, 7000L, 7000L, 0.70, "A"),
      (2L, 20L, 1500L, 8500L, 0.85, "B"),
      (3L, 30L, 1000L, 9500L, 0.95, "C"),
      (4L, 40L, 500L, 10000L, 1.00, "C")))
  }
}
