package graft

import graft.operators.GraphStats

class GraphStatsSpec extends SparkSuite {

  private def und(pairs: (Long, Long)*) = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  test("clique + pendant: counts exact, cc = 0.8, disassortative") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L))
    val r = GraphStats.summary(und(pairs: _*)).collect().head
    assert(r.getAs[Long]("n_nodes") == 5L)
    assert(r.getAs[Long]("n_edges") == 7L)
    assert(r.getAs[Long]("n_triangles") == 4L)
    // degrees 4,3,3,3,1 → Σd(d−1) = 12+6+6+6+0 = 30 → 15 wedges
    assert(r.getAs[Long]("n_wedges") == 15L)
    // cc = 3·4/15 = 0.8
    assert(r.getAs[Double]("clustering_coeff") == 0.8)
    // driver recompute of Newman assortativity over both edge ends
    val deg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ends = pairs.flatMap(p => Seq((deg(p._1), deg(p._2)),
      (deg(p._2), deg(p._1))))
    val n = ends.size.toDouble
    val sx = ends.map(_._1).sum.toDouble; val sy = ends.map(_._2).sum.toDouble
    val sxy = ends.map(e => e._1 * e._2).sum.toDouble
    val sxx = ends.map(e => e._1 * e._1).sum.toDouble
    val syy = ends.map(e => e._2 * e._2).sum.toDouble
    val expected = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(r.getAs[Double]("assortativity") == expected)
    assert(expected < 0.0) // the pendant hangs a leaf off the hub
  }

  test("mutualTopK keeps an edge only when both directions rank it") {
    import spark.implicits._
    import java.math.BigDecimal
    def d(v: String) = new BigDecimal(v)
    // 1 ranks {2,3}; 2 ranks {1}; 3 ranks {4} (not 1!); 4 ranks {3}
    val e = Seq(
      (1L, 2L, d("9.00")), (1L, 3L, d("8.00")),
      (2L, 1L, d("9.00")), (2L, 4L, d("1.00")),
      (3L, 4L, d("7.00")), (3L, 1L, d("2.00")),
      (4L, 3L, d("7.00")), (1L, 1L, d("99.00"))) // self-loop dropped
      .toDF("src", "dst", "w")
    val got = GraphStats.mutualTopK(e, topN = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // top-1 each: 1→2, 2→1 (mutual); 3→4, 4→3 (mutual); 1→3 unreturned
    assert(got == Set((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)))
  }

  test("triangle-free regular graph: cc = 0, assortativity NULL on zero variance") {
    // 4-cycle: 2-regular, no triangles; degree variance is zero so the
    // corr denominator vanishes → NULL, not NaN
    val r = GraphStats.summary(
      und((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).collect().head
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Double]("clustering_coeff") == 0.0)
    assert(r.getAs[Long]("n_wedges") == 4L)
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }
}
