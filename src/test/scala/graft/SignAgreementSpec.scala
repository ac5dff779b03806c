package graft

import org.apache.spark.sql.functions._

import graft.functions.SignAgreement

/** Expression-level contract of the sign-agreement kernel: the codegen'd
  * loop must agree with the relational join+SUM(sign(a)=sign(b))
  * definition on every null/alignment/sign edge, because the DuckDB
  * oracle replays the latter.
  */
class SignAgreementSpec extends SparkSuite {

  private def agree(va: Seq[Option[Long]], vb: Seq[Option[Long]]) = {
    import spark.implicits._
    val r = Seq((va, vb)).toDF("a", "b")
      .select(SignAgreement(col("a"), col("b")).as("s"))
      .select(col("s.n"), col("s.agree")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("counts common slots; signs compare as -1/0/+1, zero agrees with zero") {
    assert(agree(
      Seq(Some(5L), Some(-2L), Some(0L), None, Some(7L)),
      Seq(Some(9L), Some(-1L), Some(0L), Some(3L), Some(-7L)))
      == ((4L, 3L))) // (+,+), (-,-), (0,0) agree; (+,-) does not
  }

  test("nulls on either side are skipped; misalignment truncates") {
    assert(agree(Seq(None, Some(1L)), Seq(Some(2L), None)) == ((0L, 0L)))
    assert(agree(Seq(Some(1L), Some(2L), Some(3L)), Seq(Some(4L))) == ((1L, 1L)))
  }

  test("agrees with the relational join+SUM definition on random series") {
    val rnd = new scala.util.Random(7)
    val days = 40
    def series() = Seq.tabulate(days)(_ =>
      if (rnd.nextInt(4) == 0) None
      else Some(rnd.nextLong() % 5))
    (1 to 20).foreach { _ =>
      val (va, vb) = (series(), series())
      val expected = va.zip(vb).collect {
        case (Some(x), Some(y)) => (x.sign == y.sign)
      }
      assert(agree(va, vb) ==
        ((expected.size.toLong, expected.count(identity).toLong)))
    }
  }
}
