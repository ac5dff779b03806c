package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Market-basket association rules (Agrawal et al., SIGMOD '93 shape)
  * over the order/lineitem fact: for every pair of parts co-purchased in
  * at least `minPairCount` orders, the exact co-occurrence count plus
  * support, both directed confidences, and lift — the affinity metrics
  * under recommendations, cross-sell, and assortment analysis. The
  * reference's analytics stop at rate reports; this is the first-class
  * co-occurrence query a 100 TB commerce fact store runs daily.
  *
  * Scale shape: baskets reduce to DISTINCT (order, item) first, so the
  * self-join fans out per order bounded by items-per-order (≤ 7 in
  * TPC-H-shaped data) — |orders|·c(items/order, 2) candidate pairs, never
  * |items|². Everything shuffles on its natural key (order for the pair
  * expansion, the pair for counting, item for the dimension-sized count
  * joins — broadcast or shuffle per AQE); the 1-row basket total rides a
  * broadcast cross join. All metrics are ratios/products of exact longs
  * through fixed IEEE double trees, so the oracle replays them bitwise.
  */
object Association {

  def marketBasketRules(s: SparkSession, dir: String,
      minPairCount: Long = 2L): DataFrame = {
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .distinct()
    val nOrders = baskets.agg(countDistinct(col("okey")).as("n_orders"))
    val itemCnt = baskets.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    val pairs = baskets
      .join(baskets.select(col("okey"), col("item").as("item_b")), "okey")
      .where(col("item") < col("item_b"))
      .groupBy(col("item").as("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .where(col("pair_cnt") >= minPairCount)
    pairs
      .join(itemCnt.select(col("item").as("item_a"), col("cnt").as("cnt_a")),
        "item_a")
      .join(itemCnt.select(col("item").as("item_b"), col("cnt").as("cnt_b")),
        "item_b")
      .crossJoin(broadcast(nOrders))
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"),
        (col("pair_cnt").cast("double") / col("n_orders").cast("double"))
          .as("support"),
        (col("pair_cnt").cast("double") / col("cnt_a").cast("double"))
          .as("conf_a_to_b"),
        (col("pair_cnt").cast("double") / col("cnt_b").cast("double"))
          .as("conf_b_to_a"),
        (col("pair_cnt").cast("double") * col("n_orders").cast("double") /
          (col("cnt_a").cast("double") * col("cnt_b").cast("double")))
          .as("lift"))
  }
}
