package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: when both sides are bucketed by the
  * join key into the same bucket count, the sort-merge join needs NO
  * exchange — the shuffle that dominates large fact-fact joins disappears
  * at write time. This is the layout strategy for the recurring joins of
  * a 100 TB pipeline (SURVEY §4 partitioning note); the spec pins the
  * plan shape, not just the result.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // isolated session state (fresh SQL conf + catalog views) on the
    // shared context; getOrCreate would hand back the shared session
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val orders = graft.model.Tables.orders(s2, sf("sf0.001"))
      val lineitem = graft.model.Tables.lineitem(s2, sf("sf0.001"))
      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = s2.table("lineitem_b")
        .join(s2.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"))
      // the join itself is exchange-free: the only exchange permitted is
      // the one feeding the final aggregation
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"), plan)
      // and it still computes the right thing
      assert(joined.agg(sum(col("n"))).collect().head.getLong(0) == 6000L)
    } finally {
      // this suite intentionally uses its own session/warehouse; do not
      // stop the shared context (same JVM) — just drop the tables
      s2.sql("DROP TABLE IF EXISTS orders_b")
      s2.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
