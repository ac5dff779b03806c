package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

class PageRankSpec extends SparkSuite {

  private def edges(rows: Seq[(Long, Long, java.math.BigDecimal)]) = {
    import spark.implicits._
    rows.toDF("src", "dst", "w")
      .withColumn("w", col("w").cast("decimal(18,2)"))
  }

  private def dec(v: String) = new java.math.BigDecimal(v)

  test("symmetric cycle stays uniform; mass is conserved without dangling nodes") {
    // 1→2→3→1, equal weights: 1/N is the exact fixed point of the
    // update rule, so every iteration returns (teleport + damping)/N·…
    // ≈ 1/3 — and with every node having out-edges the total mass stays
    // teleport + damping = 1 (up to double rounding)
    val e = edges(Seq((1L, 2L, dec("5.00")), (2L, 3L, dec("5.00")),
      (3L, 1L, dec("5.00"))))
    val out = PageRank.weightedPageRank(e, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 3)
    out.values.foreach(p => assert(math.abs(p - 1.0 / 3.0) < 1e-12))
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
  }

  test("one-step update matches the hand formula, weighted split honored") {
    // 1 →(3.00)→ 2, 1 →(1.00)→ 3: node 1's mass splits 0.75 / 0.25;
    // nodes 2 and 3 are dangling (their mass leaks, documented).
    val e = edges(Seq((1L, 2L, dec("3.00")), (1L, 3L, dec("1.00"))))
    val out = PageRank.weightedPageRank(e, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 3.0
    assert(out(1L) == 0.15 / n)                          // no in-edges
    assert(out(2L) == 0.15 / n + 0.85 * (1.0 / n * 0.75))
    assert(out(3L) == 0.15 / n + 0.85 * (1.0 / n * 0.25))
  }

  test("personalized: mass stays seed-reachable; two-step hand values") {
    // two disjoint 2-cycles; seeding {1} must leave {3, 4} at exactly
    // zero forever, and the seed component follows the hand recursion:
    // p1 = (0.15, 0.85); p2 = (0.15 + 0.85², 0.85·0.15)
    val e = edges(Seq((1L, 2L, dec("1.00")), (2L, 1L, dec("1.00")),
      (3L, 4L, dec("1.00")), (4L, 3L, dec("1.00"))))
    val out = PageRank.personalizedPageRank(e, seeds = Seq(1L), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(3L) == 0.0 && out(4L) == 0.0)
    assert(out(1L) == 0.15 + 0.85 * 0.85)
    assert(out(2L) == 0.85 * 0.15)
  }

  test("connected components: two components, path-graph propagation, min labels") {
    import spark.implicits._
    import graft.operators.ConnectedComponents
    // component A: path 1-2-3-4-5 (worst case: min crawls the diameter);
    // component B: triangle 10-11-12; edge direction must not matter
    val e = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (12L, 11L), (10L, 12L)).toDF("src", "dst")
    val out = ConnectedComponents.labelPropagation(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(out(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(out(_) == 10L))
    assert(out.size == 8)
    // empty edge relation → empty labels, no convergence-probe crash
    val none = ConnectedComponents.labelPropagation(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(none.columns.toSeq == Seq("id", "label"))
    assert(none.count() == 0L)
  }

  test("shortest paths: min cost, min hops on ties, hop bound, cycles") {
    import spark.implicits._
    import graft.operators.ShortestPaths
    // 0→1→2 (20) ties the direct 0→2 (20): min_hops must pick 1.
    // 2→3 extends both (cost 21, min 2 hops). The unit chain 0→6→…→10
    // needs 5 hops — node 10 must be ABSENT at maxHops=4. 1→0 closes a
    // cycle (termination is the round bound, not acyclicity); 99 only
    // ever appears as a source and must not be emitted.
    val e = Seq((0L, 1L, 10L), (1L, 2L, 10L), (0L, 2L, 20L), (2L, 3L, 1L),
      (1L, 0L, 1L), (0L, 6L, 1L), (6L, 7L, 1L), (7L, 8L, 1L),
      (8L, 9L, 1L), (9L, 10L, 1L), (99L, 0L, 5L)).toDF("src", "dst", "w")
    val out = ShortestPaths.boundedSingleSource(e, 0L, 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out == Map(
      0L -> ((0L, 0)), 1L -> ((10L, 1)), 2L -> ((20L, 1)),
      3L -> ((21L, 2)), 6L -> ((1L, 1)), 7L -> ((2L, 2)),
      8L -> ((3L, 3)), 9L -> ((4L, 4))))
    // zero hops → just the source row
    val only = ShortestPaths.boundedSingleSource(e, 0L, 0).collect()
    assert(only.length == 1 && only.head.getLong(0) == 0L)
  }

  test("triangles: K4 counts, canonicalization, and triangle-free graphs") {
    import spark.implicits._
    import graft.operators.Triangles
    // K4 on {1,2,3,4}: C(4,3) = 4 triangles, every node in exactly 3.
    // Noise: a reversed duplicate, a self-loop, and a pendant path
    // 5-6-7 that closes nothing.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 3L), (5L, 6L), (6L, 7L)).toDF("u", "v")
    val out = Triangles.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(out.values.sum == 4L * 3) // each triangle counted at 3 nodes
    // a pure cycle of length 4 has no triangles at all
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    assert(Triangles.triangleCounts(c4).count() == 0)
  }

  test("hub ranks above spokes and ranks are positive and bounded") {
    // star: 2,3,4 each point at 1 — 1 must outrank the spokes
    val e = edges(Seq((2L, 1L, dec("1.00")), (3L, 1L, dec("1.00")),
      (4L, 1L, dec("1.00")), (1L, 2L, dec("1.00"))))
    val out = PageRank.weightedPageRank(e, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(2L) && out(2L) > out(3L) - 1e-15)
    out.values.foreach(p => assert(p > 0.0 && p < 1.0))
    // 3 and 4 are structurally identical → identical rank, bitwise
    assert(out(3L) == out(4L))
  }
}
