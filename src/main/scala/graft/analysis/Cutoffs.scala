package graft.analysis

import java.time.{Instant, LocalDateTime, ZoneId, ZoneOffset}

/** The two New-York-close cutoff definitions the reference ships — which
  * DISAGREE during daylight-saving time (SURVEY §7.4). Both are provided
  * so compat mode can reproduce either task exactly; the cutoff reaches
  * the query as an injected literal (the reference does the same via a
  * session variable, Fx_1min.py:144-145).
  */
object Cutoffs {

  private val NewYork = ZoneId.of("America/New_York")

  /** Task B (Fx_1min.py:133-141): *yesterday* 17:00 America/New_York,
    * DST-correct via the tz database (pytz semantics) → UTC instant.
    * "Yesterday" is evaluated on the New-York calendar.
    */
  def ny5pmYesterdayDstCorrect(now: Instant): Instant = {
    val yesterday = now.atZone(NewYork).toLocalDate.minusDays(1)
    yesterday.atTime(17, 0).atZone(NewYork).toInstant
  }

  /** Task A (update_exchange_rates.py:118-122): `DATE_SUB(CONCAT(CURDATE(),
    * ' 17:00:00'), INTERVAL 4 HOUR)` — *today* (UTC calendar) 17:00 minus a
    * FIXED 4 hours. Preserved bug-for-bug: during standard time (UTC-5)
    * this is one hour late, and it uses today rather than yesterday.
    */
  def ny5pmTodayFixedOffset(now: Instant): Instant = {
    val today = now.atOffset(ZoneOffset.UTC).toLocalDate
    LocalDateTime.of(today, java.time.LocalTime.of(17, 0))
      .minusHours(4).toInstant(ZoneOffset.UTC)
  }

  /** SQL literal form for injection into a query (session TZ = UTC). */
  def sqlLiteral(i: Instant): String = {
    val s = LocalDateTime.ofInstant(i, ZoneOffset.UTC).toString.replace('T', ' ')
    val padded = if (s.length == 16) s + ":00" else s
    s"TIMESTAMP '$padded'"
  }
}
