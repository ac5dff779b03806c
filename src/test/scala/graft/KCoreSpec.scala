package graft

import graft.operators.KCore

class KCoreSpec extends SparkSuite {

  /** Symmetrize an undirected edge list into the (src, dst) both-ways
    * shape KCore expects.
    */
  private def und(pairs: (Long, Long)*) = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  private def run(edges: org.apache.spark.sql.DataFrame, k: Int) =
    KCore.coreMembers(edges, k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("3-core of a 4-clique with a pendant keeps exactly the clique") {
    val e = und((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L))
    val out = run(e, 3)
    // 5 (degree 1) is peeled; the clique survives, each at in-core
    // degree 3 — node 1's pendant edge no longer counts
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("peeling cascades: a path has no 2-core") {
    val e = und((1L, 2L), (2L, 3L), (3L, 4L))
    // ends have degree 1 → peeled; the ex-interior nodes drop to
    // degree 1 → peeled; fixpoint is empty
    assert(run(e, 2).isEmpty)
  }

  test("a cycle is its own 2-core") {
    val e = und((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(run(e, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("k beyond the max degree yields an empty core") {
    val e = und((1L, 2L), (2L, 3L), (1L, 3L))
    assert(run(e, 3).isEmpty)
  }
}
