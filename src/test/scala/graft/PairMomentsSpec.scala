package graft

import org.apache.spark.sql.functions._

import graft.functions.PairMoments

/** Expression-level contract of the pair-moments kernel: the codegen'd
  * loop must agree with the relational join+SUM definition on every
  * null/alignment edge, because the DuckDB oracle replays the latter.
  */
class PairMomentsSpec extends SparkSuite {

  private def moments(va: Seq[Option[Long]], vb: Seq[Option[Long]]) = {
    import spark.implicits._
    val df = Seq((va, vb)).toDF("a", "b")
      .select(PairMoments(col("a"), col("b")).as("m"))
      .select(col("m.n"), col("m.sx"), col("m.sy"),
        col("m.sxy"), col("m.sxx"), col("m.syy"))
    df.collect()(0)
  }

  test("both-present slots only; nulls on either side are skipped") {
    val r = moments(
      Seq(Some(2L), None, Some(3L), Some(5L)),
      Seq(Some(10L), Some(7L), None, Some(-1L)))
    // common slots: (2,10) and (5,-1)
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 7L)   // sx = 2 + 5
    assert(r.getLong(2) == 9L)   // sy = 10 - 1
    assert(r.getLong(3) == 15L)  // sxy = 20 - 5
    assert(r.getLong(4) == 29L)  // sxx = 4 + 25
    assert(r.getLong(5) == 101L) // syy = 100 + 1
  }

  test("length misalignment truncates to the shorter array") {
    val r = moments(Seq(Some(1L), Some(2L), Some(3L)), Seq(Some(4L)))
    assert(r.getLong(0) == 1L && r.getLong(3) == 4L)
  }

  test("no common slot yields all-zero moments (caller filters n > 0)") {
    val r = moments(Seq(None, Some(1L)), Seq(Some(2L), None))
    assert((0 to 5).forall(i => r.getLong(i) == 0L))
  }

  test("agrees with the relational join+SUM definition on random series") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 200
    val va = Seq.tabulate(n)(_ =>
      if (rnd.nextInt(4) == 0) None else Some(rnd.nextLong() % 1000L))
    val vb = Seq.tabulate(n)(_ =>
      if (rnd.nextInt(4) == 0) None else Some(rnd.nextLong() % 1000L))
    val expected = va.zip(vb).collect { case (Some(x), Some(y)) => (x, y) }
    val exp = (expected.size.toLong,
      expected.map(_._1).sum, expected.map(_._2).sum,
      expected.map(t => t._1 * t._2).sum,
      expected.map(t => t._1 * t._1).sum,
      expected.map(t => t._2 * t._2).sum)
    val r = moments(va, vb)
    assert((r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)) == exp)
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    import spark.implicits._
    val va = Seq[Any](3L, null, -2L)
    val vb = Seq[Any](1L, 5L, 4L)
    // interpreted path: eval() on the raw catalyst expression
    val e = graft.functions.PairMoments(
      Literal.create(va, ArrayType(LongType, containsNull = true)),
      Literal.create(vb, ArrayType(LongType, containsNull = true)))
    val ir = e.eval(InternalRow.empty).asInstanceOf[InternalRow]
    // codegen path: the same inputs through a projection
    val cg = Seq((Seq[Option[Long]](Some(3L), None, Some(-2L)),
      Seq[Option[Long]](Some(1L), Some(5L), Some(4L)))).toDF("a", "b")
      .select(PairMoments(col("a"), col("b")).as("m"))
      .collect()(0).getStruct(0)
    (0 to 5).foreach(i => assert(ir.getLong(i) == cg.getLong(i)))
    assert(ir.getLong(0) == 2L && ir.getLong(1) == 1L && ir.getLong(2) == 5L)
  }
}
