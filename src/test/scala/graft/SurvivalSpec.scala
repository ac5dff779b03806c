package graft

import java.sql.Timestamp

import graft.operators.Survival

class SurvivalSpec extends SparkSuite {

  private def ev(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (u, d) => (u, Timestamp.valueOf(d + " 00:00:00")) }
      .toDF("user_id", "ts")
  }

  test("the product-limit curve matches a hand example exactly (dyadic steps)") {
    // u1, u2: span 2 days, churned; u3: span 4, churned; u4: spans to
    // the corpus edge -> censored. S(2) = 1/2, S(4) = 1/4, S(19) = 1/4
    val events = ev(
      (1L, "2024-01-01"), (1L, "2024-01-03"),
      (2L, "2024-01-01"), (2L, "2024-01-03"),
      (3L, "2024-01-01"), (3L, "2024-01-05"),
      (4L, "2024-01-01"), (4L, "2024-01-20"))
    val out = Survival.kaplanMeierOf(events, censorDays = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(2L) == ((4L, 2L, 0L, 0.5)))
    assert(out(4L) == ((2L, 1L, 0L, 0.25)))
    assert(out(19L) == ((1L, 0L, 1L, 0.25)))
  }

  test("a censored-only duration never moves the curve") {
    // both users censored -> survival stays exactly 1.0 everywhere
    val events = ev(
      (1L, "2024-01-01"), (1L, "2024-01-10"),
      (2L, "2024-01-02"), (2L, "2024-01-10"))
    val out = Survival.kaplanMeierOf(events, censorDays = 5).collect()
    assert(out.forall(_.getDouble(4) == 1.0))
    assert(out.map(_.getLong(3)).sum == 2L) // both counted as censored
  }

  test("at-risk counts are the reverse cumulative population") {
    val events = ev(
      (1L, "2024-01-01"), (1L, "2024-01-02"), // t = 1
      (2L, "2024-01-01"), (2L, "2024-01-04"), // t = 3
      (3L, "2024-01-01"), (3L, "2024-01-30")) // t = 29
    val out = Survival.kaplanMeierOf(events, censorDays = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 3L -> 2L, 29L -> 1L))
  }
}
