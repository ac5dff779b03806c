package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Cutoffs

class CutoffsSpec extends AnyFunSuite {

  test("DST-correct cutoff: EDT summer → UTC-4, EST winter → UTC-5") {
    // summer (EDT): 2024-07-10 anywhere mid-day UTC; NY yesterday = Jul 9
    val summer = Cutoffs.ny5pmYesterdayDstCorrect(
      Instant.parse("2024-07-10T12:00:00Z"))
    assert(summer == Instant.parse("2024-07-09T21:00:00Z")) // 17:00 EDT = 21:00 UTC
    // winter (EST): 2024-01-10 → Jan 9 17:00 EST = 22:00 UTC
    val winter = Cutoffs.ny5pmYesterdayDstCorrect(
      Instant.parse("2024-01-10T12:00:00Z"))
    assert(winter == Instant.parse("2024-01-09T22:00:00Z"))
  }

  test("fixed-offset compat cutoff diverges from the DST-correct one in winter") {
    val now = Instant.parse("2024-01-10T12:00:00Z")
    val fixed = Cutoffs.ny5pmTodayFixedOffset(now)
    assert(fixed == Instant.parse("2024-01-10T13:00:00Z")) // today 17:00 − 4h
    // divergence: different day AND (in winter) different wall-clock offset
    assert(fixed != Cutoffs.ny5pmYesterdayDstCorrect(now))
  }

  test("NY 'yesterday' straddles the UTC date line correctly") {
    // 2024-07-10 01:00 UTC is still 2024-07-09 21:00 in New York,
    // so NY-yesterday is Jul 8
    val c = Cutoffs.ny5pmYesterdayDstCorrect(Instant.parse("2024-07-10T01:00:00Z"))
    assert(c == Instant.parse("2024-07-08T21:00:00Z"))
  }

  test("sql literal renders a full timestamp") {
    assert(Cutoffs.sqlLiteral(Instant.parse("2024-01-09T22:00:00Z")) ==
      "TIMESTAMP '2024-01-09 22:00:00'")
  }
}
