package graft

import org.apache.spark.sql.functions._

import graft.operators.KTruss

/** Edge-peel contract of the k-truss: support counts common neighbors
  * in the SURVIVING graph, so peeling must cascade — an edge that is
  * safe in round 1 can lose its supports and fall in round 2.
  */
class KTrussSpec extends SparkSuite {

  private def sym(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    (es ++ es.map(e => (e._2, e._1))).toDF("src", "dst")
  }

  test("4-truss keeps K4 only; the triangle chain peels over two rounds") {
    // K4 on {1,2,3,4}; triangle 3-4-5; triangle 4-5-6 sharing edge (4,5).
    // Round 1 peels (5,6), (4,6), (3,5) (support 1 each) but NOT (4,5)
    // (supports {3,6}); round 2 peels (4,5) whose supports are gone.
    val g = sym(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L)))
    val out = KTruss.trussEdges(g, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
    assert(out.values.forall(_ == 2L)) // every K4 edge sits in 2 triangles
  }

  test("3-truss keeps triangles, drops the tail edge; 5-truss of K4 is empty") {
    val g = sym(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    val t3 = KTruss.trussEdges(g, k = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toSet
    assert(t3 == Set(((1L, 2L), 1L), ((1L, 3L), 1L), ((2L, 3L), 1L)))
    val k4 = sym(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(KTruss.trussEdges(k4, k = 5).count() == 0L)
  }
}
