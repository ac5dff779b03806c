package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Relational breadth beyond the reference's own surface (SURVEY §2.9 notes
  * which operator families the reference lacks): multi-way joins, grouped /
  * rollup / distinct aggregation, global top-k, analytic windows, set ops,
  * range join. All money arithmetic is routed through DecimalType before
  * summation so results are exact and order-independent — hash-comparable
  * against any engine, and deterministic under Spark's parallel partial
  * aggregation at any scale.
  */
object BreadthQueries {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** TPC-H Q1-shaped pricing summary: wide grouped aggregation with derived
    * expressions; partial (map-side) aggregation does the heavy lifting.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") <= expr("TIMESTAMP '1998-09-01 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum((dec("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))

  /** Broadcast-dimension join + aggregation: revenue by market segment. */
  def revenueBySegment(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).cast("double").as("revenue"))

  /** Multi-way star join (region ⋈ nation ⋈ customer ⋈ orders) — the two
    * tiny dims broadcast, orders streams; one shuffle for the final agg.
    */
  def revenueByNation(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec("o_totalprice")).cast("double").as("revenue"))

  /** Global top-k: TakeOrderedAndProject, not a full sort. */
  def topOrders(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  /** REVENUE CONCENTRATION (Pareto / ABC analysis): the top-`k`
    * customers by exact decimal revenue with each one's cumulative
    * share of the GRAND total and its ABC class — the "20% of
    * customers drive 80% of revenue" report every commercial pipeline
    * ships. Exactness: revenue folds as DECIMAL and surfaces as ×100
    * BIGINT cents (no decimal-precision schema drift across engines);
    * the running total is a window over the k-row digest; class
    * boundaries are INTEGER cross-multiplications (cum·10 ≤ total·7 is
    * "within the A band") so no percentage ever rounds; only the
    * reported share is one double division.
    *
    * Scale shape: one map-side-combinable customer aggregation, a
    * 1-row grand total broadcast, and a TakeOrderedAndProject cut to k
    * rows BEFORE the ranking window — the global sort never happens.
    */
  def paretoCustomers(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val rev = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .select(col("o_custkey"),
        (col("rev") * lit(100)).cast("long").as("rev_cents"))
    val total = rev.agg(sum(col("rev_cents")).as("total_cents"))
    val top = rev.orderBy(col("rev_cents").desc, col("o_custkey").asc)
      .limit(k)
    val w = Window.orderBy(col("rev_cents").desc, col("o_custkey").asc)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_cents", sum(col("rev_cents")).over(w))
      .select(col("rank"), col("o_custkey"), col("rev_cents"),
        col("cum_cents"),
        (col("cum_cents").cast("double") / col("total_cents").cast("double"))
          .as("cum_share"),
        when(col("cum_cents") * 10 <= col("total_cents") * 7, "A")
          .when(col("cum_cents") * 10 <= col("total_cents") * 9, "B")
          .otherwise("C").as("abc"))
  }

  /** Analytic window pack over a customer's order history: lag, rank, and
    * an exact running total in one window sort.
    */
  def customerOrderAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      row_number().over(w).as("order_seq"),
      sum(dec("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double").as("running_spend"))
  }

  /** Exact + grouped distinct aggregation (reference has none, SURVEY §2.5). */
  def distinctUsersByType(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  /** Set operations at (user, day) granularity: days a user both clicked
    * and purchased without erroring (INTERSECT / EXCEPT are hash-dedup
    * shuffles on the key — fine at scale).
    */
  def setOpsUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def daysOf(t: String) = ev.where(col("event_type") === t)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    daysOf("click").intersect(daysOf("purchase"))
      .except(daysOf("error"))
  }

  /** ROLLUP over the region/nation hierarchy (grouping-set aggregation). */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec("c_acctbal")).cast("double").as("total_balance"))

  /** CUBE grouping (completes the grouping-sets family next to ROLLUP):
    * both one-dimensional marginals plus the grand total in one pass —
    * Spark expands the grouping sets BEFORE the shuffle, so partial
    * aggregation still combines map-side. `grouping()` flags disambiguate
    * subtotal NULLs from (hypothetical) real NULL group keys, emitted as
    * INT on both sides (Spark's grouping() is a byte, DuckDB's a BIGINT).
    * The measure sums DECIMAL (exact, order-independent), double at the
    * edge.
    */
  def cubeEventStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("day", col("ts").cast("date"))
      .cube(col("event_type"), col("day"))
      .agg(grouping(col("event_type")).cast("int").as("g_type"),
        grouping(col("day")).cast("int").as("g_day"),
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))

  /** Explicit GROUPING SETS — the mixed-marginal shape neither ROLLUP
    * nor CUBE expresses: (type, day) detail plus a per-day marginal, NO
    * grand total and NO per-type marginal. Same Expand-before-shuffle
    * plan as the other grouping-set forms (partial agg still combines
    * map-side); expressed through the SQL API to exercise that surface.
    */
  def groupingSetsEvents(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events_gs")
    s.sql(
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(grouping(event_type) AS INT) AS g_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events_gs
        |GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)),
        |                        (CAST(ts AS DATE)))
        |""".stripMargin)
  }

  /** Analytic-window breadth beyond lag/rank/running-sum: ntile,
    * percent_rank, cume_dist, nth_value, and a bounded sliding frame, all
    * over one window spec (ONE shuffle + sort serves every function).
    * Expressed through the SQL API (WINDOW clause) to exercise that
    * surface; the (o_orderdate, o_orderkey) ordering is total, so RANGE
    * and ROWS frames coincide and every value is deterministic. The
    * sliding aggregate sums DECIMAL (exact at any frame order), cast to
    * double only at the edge.
    */
  def windowBreadth(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_wb")
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(o_totalprice, 2) OVER w AS second_price,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS sum3
        |FROM orders_wb
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |""".stripMargin)
  }

  /** Equi + range (band) join: lineitems shipped within 90 days of their
    * order date. The range conjunct rides the hash join as a post-filter —
    * no nested-loop explosion.
    */
  def shippedWithin90d(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lineitems"),
        sum(dec("l_extendedprice")).cast("double").as("shipped_value"))
}
