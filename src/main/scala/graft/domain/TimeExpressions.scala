package graft.domain

import java.sql.Timestamp
import java.time.LocalDateTime

/** Relative time-expression parser — a faithful port of
  * `/root/reference/automem/utils/time.py:89-159` `_parse_time_expression`:
  * every expression that function resolves, with ITS boundary semantics
  * (hour/day windows keep the time of day; day/week/month/year windows
  * floor to midnight; weeks start Monday), resolved against an explicit
  * `now` (deterministic; the caller passes the clock). Driver-side — it
  * produces two literals for the F1 time filter.
  */
object TimeExpressions {

  private def ts(d: LocalDateTime): Timestamp = Timestamp.valueOf(d)

  /** Temporal-intent detection, the reference's `_TEMPORAL_INTENT_RE`
    * verbatim (`automem/utils/time.py:10-17`): present/latest-state
    * keywords only — bare "last"/"ago" do NOT signal intent there ("last
    * sprint notes" is not a recency ask; "last time" is), used by the
    * recency-bias auto mode.
    */
  val TemporalIntent =
    ("(?i)\\b(?:latest|most recent|recently|current|currently|now|nowadays|" +
      "today|changed|updated|last time|newest|these days|anymore)\\b").r

  def hasTemporalIntent(text: String): Boolean =
    TemporalIntent.findFirstIn(text).isDefined

  private val LastNDays = "(?i)\\blast\\s+(\\d+)\\s+days\\b".r

  /** Parse a time expression into [start, end), or None if unrecognized.
    * The supported set and each window's boundary rule mirror the reference
    * case by case.
    */
  def parse(expr: String, now: Timestamp): Option[(Timestamp, Timestamp)] = {
    val nowDt = now.toLocalDateTime
    val today = nowDt.toLocalDate
    def dayStart(d: java.time.LocalDate): LocalDateTime = d.atStartOfDay()
    val e = Option(expr).getOrElse("").trim.toLowerCase
    e match {
      case "today" | "this day" =>
        Some((ts(dayStart(today)), ts(dayStart(today.plusDays(1)))))
      case "yesterday" =>
        Some((ts(dayStart(today.minusDays(1))), ts(dayStart(today))))
      case "last 24 hours" | "past 24 hours" =>
        // hour windows keep the time of day (`time.py:111-113`)
        Some((ts(nowDt.minusHours(24)), now))
      case "last 48 hours" | "past 48 hours" =>
        Some((ts(nowDt.minusHours(48)), now))
      case "this week" =>
        val monday = today.minusDays(today.getDayOfWeek.getValue - 1L)
        Some((ts(dayStart(monday)), ts(dayStart(monday.plusWeeks(1)))))
      case "last week" | "past week" =>
        val monday = today.minusDays(today.getDayOfWeek.getValue - 1L)
        Some((ts(dayStart(monday.minusWeeks(1))), ts(dayStart(monday))))
      case "this month" =>
        val first = today.withDayOfMonth(1)
        Some((ts(dayStart(first)), ts(dayStart(first.plusMonths(1)))))
      case "last month" | "past month" =>
        val first = today.withDayOfMonth(1).minusMonths(1)
        Some((ts(dayStart(first)), ts(dayStart(first.plusMonths(1)))))
      case "this year" =>
        val jan1 = today.withDayOfYear(1)
        Some((ts(dayStart(jan1)), ts(dayStart(jan1.plusYears(1)))))
      case "last year" | "past year" =>
        val jan1 = today.withDayOfYear(1)
        Some((ts(dayStart(jan1.minusYears(1))), ts(dayStart(jan1))))
      case LastNDays(n) =>
        // "last N days" = now minus N days with the TIME OF DAY preserved
        // (`time.py:140-145` uses timedelta against now, not a midnight
        // floor — flooring would widen the window by up to 24h)
        Some((ts(nowDt.minusDays(n.toLong)), now))
      case _ => None
    }
  }

  /** Apply a time expression to a RecallRequest (sets start/end). */
  def applyTo(req: RecallRequest, expr: String): RecallRequest =
    parse(expr, req.now) match {
      case Some((s, e)) => req.copy(start = Some(s), end = Some(e))
      case None => req
    }
}
