package graft.analysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** RFM customer segmentation (Hughes' recency/frequency/monetary
  * framework) over the orders fact: per customer the three raw metrics
  * plus quartile scores 1–4 and the concatenated segment label — the
  * canonical lifecycle-marketing query a commerce warehouse runs nightly.
  *
  * Scale shape: the ONLY global ordering here is the quartile boundary
  * computation, and it runs as an exact-percentile AGGREGATE over the
  * |customers|-row digest (map-side combinable buffers) — never a global
  * ntile/percent_rank window, whose single-partition sort is the classic
  * 100 TB scale-killer for this query. Boundaries (9 doubles) and the
  * 1-row anchor date broadcast back onto the digest; scores are pure
  * comparisons. Exactness: frequency and cents are exact longs, recency
  * is exact integer days from the max order date (data-derived, so the
  * query is reproducible — no wall-clock); the quartile interpolation is
  * the established percentile↔quantile_cont double tree, and comparisons
  * against it are identical on both engines.
  */
object CustomerAnalytics {

  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val qs = array(lit(0.25), lit(0.5), lit(0.75))
    val cust = Tables.orders(s, dir).groupBy(col("o_custkey")).agg(
      max(col("o_orderdate")).as("last_order"),
      count(lit(1)).as("frequency"),
      (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("monetary_cents"))
    val base = cust
      .crossJoin(broadcast(cust.agg(max(col("last_order")).as("maxd"))))
      .select(col("o_custkey"),
        datediff(col("maxd"), col("last_order")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary_cents"))
    val bounds = base.agg(
      percentile(col("recency_days"), qs).as("rq"),
      percentile(col("frequency"), qs).as("fq"),
      percentile(col("monetary_cents"), qs).as("mq"))
    def above(v: String, q: String): Column =
      (0 to 2).map(i => (col(v) > col(q).getItem(i)).cast("int"))
        .reduce(_ + _)
    base.crossJoin(broadcast(bounds))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        // recent = LOW recency_days, so the recency score inverts
        (lit(4) - above("recency_days", "rq")).as("r_score"),
        (lit(1) + above("frequency", "fq")).as("f_score"),
        (lit(1) + above("monetary_cents", "mq")).as("m_score"))
      .withColumn("segment", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
  }
}
