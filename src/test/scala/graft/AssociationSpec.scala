package graft

import graft.analysis.Association

class AssociationSpec extends SparkSuite {

  test("market basket: hand baskets — support, confidence, lift exact") {
    import spark.implicits._
    // o1:{1,2,3} o2:{1,2} o3:{1,2 + duplicate line} o4:{3}
    // distinct baskets: pair (1,2) in 3 orders; (1,3)/(2,3) once each
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (30L, 2L),
      (40L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val tmp = graft.util.Scratch.dir("graft_basket_fix").toString
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Association.marketBasketRules(spark, tmp).collect()
    // only (1,2) clears minPairCount = 2 — singleton pairs drop
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L)) // canonical a < b
    assert(r.getLong(2) == 3L) // pair_cnt: the dup line counted once
    assert((r.getLong(3), r.getLong(4)) == (3L, 3L)) // cnt_a, cnt_b
    assert(r.getDouble(5) == 3.0 / 4.0) // support over 4 orders
    assert(r.getDouble(6) == 1.0) // conf a->b
    assert(r.getDouble(7) == 1.0) // conf b->a
    assert(r.getDouble(8) == 3.0 * 4.0 / (3.0 * 3.0)) // lift > 1: affinity
  }

  test("market basket: canonical ordering means no mirrored rules") {
    val out = Association.marketBasketRules(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 2L)
      // pair count can never exceed either item's basket count
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
    }
  }
}
