package graft

import org.apache.spark.sql.functions._

import graft.functions.LagMoments

/** Expression-level contract of the lag-moments kernel: sums run over
  * the TRIPLE-common slot set (y_t, y_{t−1}, x_{t−1} all observed) —
  * the set three pairwise kernels cannot reproduce — because the DuckDB
  * oracle replays it as a triple join on date and date−1.
  */
class LagMomentsSpec extends SparkSuite {

  private def mom(y: Seq[Option[Long]], x: Seq[Option[Long]]) = {
    import spark.implicits._
    Seq((y, x)).toDF("y", "x")
      .select(LagMoments(col("y"), col("x")).as("m"))
      .select(col("m.n"), col("m.su"), col("m.sv"), col("m.sw"),
        col("m.suv"), col("m.suw"), col("m.svw")).collect()(0)
  }

  test("triple-common slots only; any missing leg drops the slot") {
    // slots:      0        1        2        3        4
    val y = Seq(Some(2L), Some(3L), None, Some(5L), Some(7L))
    val x = Seq(Some(1L), Some(4L), Some(6L), None, Some(8L))
    // t=1: (u,v,w)=(3,2,1) ok; t=2: y[2] null; t=3: y[2] null (v leg);
    // t=4: x[3] null (w leg) -> only t=1 contributes
    val r = mom(y, x)
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L && r.getLong(3) == 1L)
    assert(r.getLong(4) == 6L && r.getLong(5) == 3L && r.getLong(6) == 2L)
  }

  test("agrees with the definitional triple-join sums on random series") {
    val rnd = new scala.util.Random(11)
    def series(n: Int) = Seq.tabulate(n)(_ =>
      if (rnd.nextInt(5) == 0) None else Some(rnd.nextLong() % 7))
    (1 to 15).foreach { _ =>
      val y = series(30); val x = series(30)
      val slots = (1 until 30).filter(t =>
        y(t).isDefined && y(t - 1).isDefined && x(t - 1).isDefined)
      val (u, v, w) = (slots.map(y(_).get), slots.map(t => y(t - 1).get),
        slots.map(t => x(t - 1).get))
      val r = mom(y, x)
      assert(r.getLong(0) == slots.size.toLong)
      assert(r.getLong(1) == u.sum && r.getLong(2) == v.sum && r.getLong(3) == w.sum)
      assert(r.getLong(4) == u.zip(v).map { case (a, b) => a * b }.sum)
      assert(r.getLong(5) == u.zip(w).map { case (a, b) => a * b }.sum)
      assert(r.getLong(6) == v.zip(w).map { case (a, b) => a * b }.sum)
    }
  }
}
