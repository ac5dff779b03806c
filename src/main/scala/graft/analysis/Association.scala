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
  * Scale shape: ONE wide shuffle — the per-order `collect_set` (map-side
  * combined, each list bounded by items-per-order, ≤ 7 in TPC-H-shaped
  * data) — then pair expansion is a NARROW sorted-list comprehension:
  * |orders|·c(items/order, 2) candidate pairs, never |items|² and never a
  * basket self-join (a distinct + self-join spells the same result in 4
  * exchanges; this is 2). Pair counts and the item-count joins shuffle on
  * their natural keys (broadcast or shuffle per AQE); the 1-row basket
  * total rides a broadcast cross join. All metrics are ratios/products of
  * exact longs through fixed IEEE double trees, so the oracle replays
  * them bitwise.
  */
object Association {

  def marketBasketRules(s: SparkSession, dir: String,
      minPairCount: Long = 2L): DataFrame = {
    val itemsPerOrder = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .groupBy(col("okey"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
    val nOrders = itemsPerOrder.agg(count(lit(1)).as("n_orders"))
    val itemCnt = itemsPerOrder
      .select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    // sorted + deduped list, so pairing each element with its strict
    // suffix emits every (x, y), x < y, exactly once — two chained
    // Generate nodes (posexplode, then the suffix slice exploded), no
    // lambda evaluation in the hot path
    val pairs = itemsPerOrder
      .select(col("items"), posexplode(col("items")).as(Seq("i", "item_a")))
      .select(col("item_a"),
        explode(slice(col("items"), col("i") + lit(2), size(col("items"))))
          .as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
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
