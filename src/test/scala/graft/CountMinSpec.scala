package graft

import graft.operators.CountMin

/** Count-Min sketch: the one-sided error contract and the collision-free
  * regime, on deterministic fixtures (the hash layout is fixed, so these
  * either always pass or never do).
  */
class CountMinSpec extends SparkSuite {

  test("estimate is an upper bound on the exact count for every reported key") {
    val events = graft.model.Tables.events(spark, sf("sf0.001"))
    val distinct = events.select("user_id").distinct().count()
    val out = CountMin.heavyHitters(events, "user_id", topK = 25).collect()
    assert(out.length == math.min(25L, distinct))
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS under-estimated key ${r.get(0)}: ${r.getLong(2)} < ${r.getLong(1)}")
    }
  }

  test("sparse keys in a wide sketch estimate exactly") {
    import spark.implicits._
    // 50 keys in 4×4096 cells: the fixed xxhash64 layout leaves every
    // key at least one collision-free row, so min-over-rows is exact
    val df = (1L to 50L).flatMap(i => Seq.fill(i.toInt)(i)).toDF("key")
    val out = CountMin.heavyHitters(df, "key", w = 4096, topK = 50).collect()
    assert(out.length == 50)
    out.foreach(r => assert(r.getLong(2) == r.getLong(1)))
    // and the exact counts are the construction: key i appears i times
    out.foreach(r => assert(r.getLong(1) == r.getLong(0)))
  }

  test("duplication scales counts linearly, layout unchanged") {
    import spark.implicits._
    val base = (1L to 30L).flatMap(i => Seq.fill(5)(i)).toDF("key")
    val tripled = base.union(base).union(base)
    val a = CountMin.heavyHitters(base, "key", topK = 30).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = CountMin.heavyHitters(tripled, "key", topK = 30).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // same cells, 3× the mass: every estimate exactly triples
    a.foreach { case (k, est) => assert(b(k) == est * 3) }
  }
}
