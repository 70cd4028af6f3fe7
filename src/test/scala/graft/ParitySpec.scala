package graft

import java.sql.Timestamp

import graft.domain._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity specs for the time-expression parser, metadata field-whitelist
  * scoring, and ASCII folding.
  */
class ParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val now: Timestamp = Timestamp.valueOf("2026-08-12 15:30:00") // a Wednesday

  test("time expressions resolve to correct [start, end) windows") {
    def p(e: String) = TimeExpressions.parse(e, now).map { case (s, t) =>
      (s.toString, t.toString)
    }
    assert(p("today") ==
      Some(("2026-08-12 00:00:00.0", "2026-08-13 00:00:00.0")))
    assert(p("yesterday") ==
      Some(("2026-08-11 00:00:00.0", "2026-08-12 00:00:00.0")))
    assert(p("this week") ==
      Some(("2026-08-10 00:00:00.0", "2026-08-17 00:00:00.0")))
    assert(p("this month") ==
      Some(("2026-08-01 00:00:00.0", "2026-09-01 00:00:00.0")))
    assert(p("last month") ==
      Some(("2026-07-01 00:00:00.0", "2026-08-01 00:00:00.0")))
    // "last N days" keeps the time of day (`time.py:140-145` timedelta
    // against now, NOT a midnight floor)
    assert(p("last 7 days") ==
      Some(("2026-08-05 15:30:00.0", "2026-08-12 15:30:00.0")))
    assert(p("last 24 hours") ==
      Some(("2026-08-11 15:30:00.0", "2026-08-12 15:30:00.0")))
    assert(p("last week") ==
      Some(("2026-08-03 00:00:00.0", "2026-08-10 00:00:00.0")))
    assert(p("past month") == p("last month"))
    assert(p("this year") ==
      Some(("2026-01-01 00:00:00.0", "2027-01-01 00:00:00.0")))
    assert(p("last year") ==
      Some(("2025-01-01 00:00:00.0", "2026-01-01 00:00:00.0")))
    // the reference supports no other relative forms
    assert(p("last 2 weeks") == None)
    assert(p("nonsense") == None)
    // _TEMPORAL_INTENT_RE parity (`time.py:10-17`): present/latest-state
    // words only — bare "last"/"ago" are NOT intent there
    assert(TimeExpressions.hasTemporalIntent("what happened recently"))
    assert(TimeExpressions.hasTemporalIntent("what is my current setup"))
    assert(TimeExpressions.hasTemporalIntent("has anything changed"))
    assert(TimeExpressions.hasTemporalIntent("the last time we deployed"))
    assert(!TimeExpressions.hasTemporalIntent("last sprint planning notes"))
    assert(!TimeExpressions.hasTemporalIntent("two days ago"))
    assert(!TimeExpressions.hasTemporalIntent("postgres settings"))
    // word-boundaried: "currency" must not match "current"
    assert(!TimeExpressions.hasTemporalIntent("currency conversion rates"))
  }

  test("time expression narrows recall via applyTo") {
    val req = TimeExpressions.applyTo(RecallRequest(now = now), "yesterday")
    assert(req.start.get.toString == "2026-08-11 00:00:00.0")
    assert(req.end.get.toString == "2026-08-12 00:00:00.0")
  }

  test("metadata whitelist scoring: field values, aliases, requested fields") {
    // exercised through MetadataScoring (the production scorer behind the
    // Q5 recall channel; MetadataScoringSpec pins its 14 branch cases to
    // reference-recomputed values — this is the smoke-level contract)
    val strong = MetadataScoring.matchScore("alpha project",
      """{"project": "alpha", "status": "active"}""")
    val weak = MetadataScoring.matchScore("alpha project", """{"project": "beta"}""")
    assert(strong > weak, s"$strong vs $weak")
    // whitelist: a match inside a non-whitelisted field earns no value credit
    assert(MetadataScoring.matchScore("alpha project",
      """{"unlisted_field": "alpha"}""") < weak + 0.45)
    // requested-field detection + alias: "repository" -> repo
    val reqScore = MetadataScoring.matchScore("repository: automem",
      """{"repo": "automem"}""")
    assert(reqScore > 0.5, s"field-requested bonus expected, got $reqScore")
  }

  test("asciiFold strips diacritics for matching") {
    import spark.implicits._
    val got = Seq("Café Münchén à côté").toDF("t")
      .select(graft.functions.TextFunctions.asciiFold(col("t")))
      .head().getString(0)
    assert(got == "Cafe Munchen a cote")
  }
}
