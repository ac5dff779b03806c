package graft

import graft.operators.Hits

class HitsSpec extends SparkSuite {

  test("hits: hand graph — exact power-of-two trajectory, roles split") {
    import spark.implicits._
    // 1→3, 2→3, 3→4: 3 is the authority, 1 and 2 the hubs, 4 a weak
    // authority fed by a decaying hub; every max-norm division is by a
    // power of two, so the 5-iteration trajectory is IEEE-exact
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Hits.hits(edges, iters = 5).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out.size == 4)
    assert(out(1L) == ((0.0, 1.0)))     // pure hub
    assert(out(2L) == ((0.0, 1.0)))     // pure hub
    assert(out(3L) == ((1.0, 0.03125))) // top authority; hub via 4 decays
    assert(out(4L) == ((0.03125, 0.0))) // weak authority, no out-edges
  }

  test("hits: symmetric pair saturates at 1; isolated direction zeroes") {
    import spark.implicits._
    val edges = Seq((7L, 8L), (8L, 7L)).toDF("src", "dst")
    val out = Hits.hits(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(7L) == ((1.0, 1.0)) && out(8L) == ((1.0, 1.0)))
  }
}
