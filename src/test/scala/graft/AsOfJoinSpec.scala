package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** The as-of family on a hand fixture covering every edge the window
  * formulation must get right: inclusive equal-time ties in both
  * directions, no-match nulls, tolerance exclusion, and the
  * equal-distance-resolves-backward convention. Plus the scale pin: all
  * three variants cost exactly ONE shuffle (nearest runs both direction
  * passes over the same exchange).
  */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  // left probes at t = 5, 10, 20 for key A (plus a key with no right rows)
  private def left = Seq(
    ("A", 5L, 100L), ("A", 10L, 101L), ("A", 20L, 102L), ("B", 5L, 103L)
  ).toDF("k", "t", "probe_id")

  // right references for A at t = 4, 10, 15
  private def right = Seq(
    ("A", 4L, "r4"), ("A", 10L, "r10"), ("A", 15L, "r15")
  ).toDF("k", "t", "v")

  private def run(df: org.apache.spark.sql.DataFrame): Map[Long, Option[String]] =
    df.collect().map(r => r.getLong(2) -> Option(r.getString(3))).toMap

  test("backward: most recent at-or-before; equal time matches; no match → null") {
    val got = run(AsOfJoin.asofBackward(left, right, Seq("k"), "t", "t",
      Seq("v" -> "vv")))
    assert(got == Map(100L -> Some("r4"), 101L -> Some("r10"), // t=10 inclusive
      102L -> Some("r15"), 103L -> None))
  }

  test("forward: earliest at-or-after; equal time matches; no match → null") {
    val got = run(AsOfJoin.asofForward(left, right, Seq("k"), "t", "t",
      Seq("v" -> "vv")))
    assert(got == Map(100L -> Some("r10"), 101L -> Some("r10"), // t=10 inclusive
      102L -> None, 103L -> None))
  }

  test("nearest: closer side wins, ties backward, tolerance excludes") {
    // t=5: backward dist 1 (r4), forward dist 5 (r10) → r4
    // t=10: exact hit both directions, dist 0 → backward convention, r10
    // t=20: only backward (r15) at dist 5 → r15 under tol 5, null under 4
    val got5 = run(AsOfJoin.asofNearest(left, right, Seq("k"), "t", "t",
      Seq("v" -> "vv"), toleranceMicros = 5L))
    assert(got5 == Map(100L -> Some("r4"), 101L -> Some("r10"),
      102L -> Some("r15"), 103L -> None))
    val got4 = run(AsOfJoin.asofNearest(left, right, Seq("k"), "t", "t",
      Seq("v" -> "vv"), toleranceMicros = 4L))
    assert(got4(102L).isEmpty)
    // equal distance: backward wins (probe 5 with right rows at 4 and 6)
    val r2 = Seq(("A", 4L, "lo"), ("A", 6L, "hi")).toDF("k", "t", "v")
    val gotTie = run(AsOfJoin.asofNearest(left.where(col("probe_id") === 100L),
      r2, Seq("k"), "t", "t", Seq("v" -> "vv"), toleranceMicros = 10L))
    assert(gotTie(100L).contains("lo"))
  }

  test("a null-valued right row IS the match — never skipped for an older value") {
    import spark.implicits._
    // right rows: t=4 carries "x", t=9 carries NULL; probe at t=10.
    // The nearest/backward match is the t=9 ROW, so the surfaced value
    // must be its null — not "x" smuggled from distance 6 (a value-level
    // ignoreNulls carry would do exactly that)
    val l = Seq(("A", 10L, 1L)).toDF("k", "t", "probe_id")
    val r = Seq(("A", 4L, Some("x")), ("A", 9L, None)).toDF("k", "t", "v")
    def one(df: org.apache.spark.sql.DataFrame): Option[String] = {
      val row = df.collect().head
      if (row.isNullAt(row.fieldIndex("vv"))) None
      else Some(row.getString(row.fieldIndex("vv")))
    }
    assert(one(AsOfJoin.asofBackward(l, r, Seq("k"), "t", "t",
      Seq("v" -> "vv"))).isEmpty)
    assert(one(AsOfJoin.asofNearest(l, r, Seq("k"), "t", "t",
      Seq("v" -> "vv"), toleranceMicros = 2L)).isEmpty)
    // forward mirror: right rows at t=11 (null) and t=20 ("y"), probe 10
    val r2 = Seq(("A", 11L, None), ("A", 20L, Some("y"))).toDF("k", "t", "v")
    assert(one(AsOfJoin.asofForward(l, r2, Seq("k"), "t", "t",
      Seq("v" -> "vv"))).isEmpty)
  }

  test("all three variants plan exactly ONE shuffle exchange") {
    // AQE hides exchanges behind the adaptive wrapper until execution —
    // inspect the static physical plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def shuffles(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size
      val vc = Seq("v" -> "vv")
      assert(shuffles(AsOfJoin.asofBackward(left, right, Seq("k"), "t", "t", vc)) == 1)
      assert(shuffles(AsOfJoin.asofForward(left, right, Seq("k"), "t", "t", vc)) == 1)
      // nearest runs BOTH direction passes: same partitioning, so the
      // second pass re-sorts within partitions instead of reshuffling
      assert(shuffles(AsOfJoin.asofNearest(left, right, Seq("k"), "t", "t", vc,
        toleranceMicros = 10L)) == 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
