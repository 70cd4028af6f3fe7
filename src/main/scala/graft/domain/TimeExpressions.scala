package graft.domain

import java.sql.Timestamp
import java.time.{LocalDate, LocalDateTime, ZoneOffset}

/** Relative time-expression parser (`/root/reference/automem/utils/time.py:
  * 89-159`): "today", "yesterday", "last N days/weeks/months", "this week",
  * "this month", "last month" -> a [start, end) timestamp window, resolved
  * against an explicit `now` (deterministic; the caller passes the clock).
  * Driver-side — it produces two literals for the F1 time filter.
  */
object TimeExpressions {

  private def ts(d: LocalDateTime): Timestamp = Timestamp.valueOf(d)
  private def dayStart(d: LocalDate): LocalDateTime = d.atStartOfDay()

  /** Temporal-intent detection (`automem/utils/time.py:10-27`), used by the
    * recency-bias auto mode.
    */
  val TemporalIntent =
    "(?i)\\b(recent(ly)?|latest|last|yesterday|today|newest|this week|this month|ago)\\b".r

  def hasTemporalIntent(text: String): Boolean =
    TemporalIntent.findFirstIn(text).isDefined

  private val LastN = "(?i)\\blast\\s+(\\d+)\\s+(day|week|month)s?\\b".r

  /** Parse a time expression into [start, end), or None if unrecognized. */
  def parse(expr: String, now: Timestamp): Option[(Timestamp, Timestamp)] = {
    val nowDt = now.toLocalDateTime
    val today = nowDt.toLocalDate
    val e = Option(expr).getOrElse("").trim.toLowerCase
    e match {
      case "today" =>
        Some((ts(dayStart(today)), ts(dayStart(today.plusDays(1)))))
      case "yesterday" =>
        Some((ts(dayStart(today.minusDays(1))), ts(dayStart(today))))
      case "this week" =>
        val monday = today.minusDays(today.getDayOfWeek.getValue - 1L)
        Some((ts(dayStart(monday)), ts(dayStart(monday.plusWeeks(1)))))
      case "this month" =>
        val first = today.withDayOfMonth(1)
        Some((ts(dayStart(first)), ts(dayStart(first.plusMonths(1)))))
      case "last month" =>
        val first = today.withDayOfMonth(1).minusMonths(1)
        Some((ts(dayStart(first)), ts(dayStart(first.plusMonths(1)))))
      case _ => e match {
        case LastN(n, unit) =>
          val start = unit match {
            case "day" => today.minusDays(n.toLong)
            case "week" => today.minusWeeks(n.toLong)
            case "month" => today.minusMonths(n.toLong)
          }
          Some((ts(dayStart(start)), now))
        case _ => None
      }
    }
  }

  /** Apply a time expression to a RecallRequest (sets start/end). */
  def applyTo(req: RecallRequest, expr: String): RecallRequest =
    parse(expr, req.now) match {
      case Some((s, e)) => req.copy(start = Some(s), end = Some(e))
      case None => req
    }
}
