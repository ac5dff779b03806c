package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.IncrementalView

class IncrementalViewSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def oneShot = Tables.orders(spark, dir)
    .join(Tables.customer(spark, dir),
      col("o_custkey") === col("c_custkey"))
    .groupBy(col("c_mktsegment"))
    .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").as("revenue"),
      count(lit(1)).as("n_orders"))

  private def asMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

  test("maintained join view equals the one-shot join+agg, any batching") {
    val expected = asMap(oneShot.collect())
    // batch count must not matter — the merge is exact and mergeable
    Seq(1, 4, 7).foreach { n =>
      val got = asMap(
        IncrementalView.revenueBySegmentIncremental(spark, dir, n).collect())
      assert(got == expected, s"nBatches=$n diverged")
    }
  }

  test("maintained pagerank equals the one-shot ranks bit for bit, any batching") {
    def ranks(n: Int): Map[String, Double] =
      IncrementalView.pagerankTradeIncremental(spark, dir, n).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val oneShot = ranks(1) // a single batch IS the one-shot aggregation
    assert(oneShot.nonEmpty)
    Seq(3, 5).foreach { n =>
      assert(ranks(n) == oneShot, s"nBatches=$n diverged") // == on doubles:
      // the exact decimal edge merge makes the iteration inputs identical
    }
  }
}
