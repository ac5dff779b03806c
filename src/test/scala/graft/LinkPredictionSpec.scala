package graft

import graft.operators.LinkPrediction

class LinkPredictionSpec extends SparkSuite {

  test("link prediction: CN counts and RA floor weights exact, adjacency excluded") {
    import spark.implicits._
    // square 1-2-3-4-1 plus node 5 tied to 1 and 2:
    // degrees: 1,2 -> 3; 3,4,5 -> 2
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 5L), (2L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = LinkPrediction.predictLinks(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val ra3 = 1000000000000L / 3
    val ra2 = 1000000000000L / 2
    assert(out.size == 4)
    assert(out((1L, 3L)) == ((2L, ra3 + ra2))) // via 2 (deg 3) and 4 (deg 2)
    assert(out((2L, 4L)) == ((2L, ra3 + ra2))) // via 1 (deg 3) and 3 (deg 2)
    assert(out((3L, 5L)) == ((1L, ra3)))       // via 2 only
    assert(out((4L, 5L)) == ((1L, ra3)))       // via 1 only
    // (1,2) shares neighbor 5 but is adjacent — must be excluded
    assert(!out.contains((1L, 2L)))
  }
}
