package graft

import graft.operators.Communities

class CommunitiesSpec extends SparkSuite {

  private def und(pairs: (Long, Long)*) = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  private def run(edges: org.apache.spark.sql.DataFrame, iters: Int = 4) =
    Communities.labelCommunities(edges, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles joined by one bridge split into two communities") {
    // 1-2-3 triangle, 4-5-6 triangle, bridge 3-4
    val e = und((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val out = run(e)
    // within each triangle the min label wins through neighbor majority
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(4L) == out(5L) && out(5L) == out(6L))
    assert(out(1L) != out(4L))
  }

  test("a clique converges to its smallest member's label in one round") {
    val e = und((1L, 2L), (2L, 3L), (1L, 3L))
    assert(run(e, 1) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("ties break to the smallest label deterministically") {
    // node 3 sees neighbors {1, 2} once each plus its own self-vote;
    // after round 1 every node votes tie between 1-labeled and
    // 2-labeled camps — the smaller label must win every tie
    val e = und((1L, 3L), (2L, 3L))
    val out = run(e)
    assert(out(3L) == 1L)
    assert(out(1L) == 1L)
  }

  test("the self-vote damps a two-node flip-flop") {
    // plain synchronous LPA on a single edge swaps labels forever; the
    // self-vote makes (count, -label) pick the smaller label on both
    // sides and HOLD it across rounds (even and odd iteration counts
    // must agree)
    val e = und((7L, 9L))
    assert(run(e, 3) == run(e, 4))
    assert(run(e, 4) == Map(7L -> 7L, 9L -> 7L))
  }
}
