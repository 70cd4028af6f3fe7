package graft

import graft.tools.{LongMemEvalFull, LongMemEvalMini}
import org.scalatest.funsuite.AnyFunSuite

/** LongMemEval full-shaped tier (r17, VERDICT r16 item 6): 120 generated
  * questions, 20 per type — 4x the mini tier's n, so the per-type pins
  * move in 0.008 MRR steps instead of 0.033. Goldens derived with
  * `runMain graft.tools.LmeReportProbe full`; reference full-tier anchors
  * recorded alongside (`benchmarks/EXPERIMENT_LOG.md:92-93`: accuracy
  * 87.00%, recall@5 97.00% over 500 questions).
  */
class LongMemEvalFullSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val report = LongMemEvalFull.report(spark)

  private def assertPinned(name: String, got: Double, expected: Double): Unit =
    assert(math.abs(got - expected) < 1e-6,
      f"$name = $got%.6f, pinned golden $expected%.6f — a recall-ranking " +
        "change moved the LongMemEval-full metrics; re-pin only if intentional")

  test("fixture shape: 20 per type over six types, generated " +
    "deterministically; evidence resolves; roles and sessions honor the " +
    "type contracts") {
    val qs = LongMemEvalFull.questions
    assert(qs.size == 120)
    val byType = qs.groupBy(_.qtype)
    assert(byType.keySet == LongMemEvalMini.Types.toSet)
    byType.foreach { case (t, sel) =>
      assert(sel.size == 20, s"$t has ${sel.size} questions, want 20") }
    qs.foreach { q =>
      assert((q.qtype == "abstention") == q.qid.endsWith("_abs"), q.qid)
      assert((q.qtype == "abstention") == q.evidence.isEmpty, q.qid)
    }
    val byId = LongMemEvalFull.turns.map(t => t.dialogId -> t).toMap
    assert(byId.size == LongMemEvalFull.turns.size, "dialog ids unique")
    qs.foreach(_.evidence.foreach(e =>
      assert(byId.contains(e), s"evidence $e is not a turn")))
    qs.filter(_.qtype == "single-session-assistant")
      .foreach(q => q.evidence.foreach(e =>
        assert(byId(e).role == "assistant", s"$e must be an assistant turn")))
    qs.filter(_.qtype == "multi-session").foreach { q =>
      val sessions = q.evidence.map(byId(_).session).distinct
      assert(sessions.size >= 2,
        s"${q.qid}: multi-session evidence must span sessions, got $sessions")
    }
    // the generator is pure: two invocations are identical
    assert(LongMemEvalFull.turns == LongMemEvalFull.turns)
    assert(LongMemEvalFull.questions == LongMemEvalFull.questions)
  }

  test("pinned per-type recall@5 goldens (n=20 per type)") {
    assertPinned("single-session-user recall@5",
      report.recall5("single-session-user"), 1.0)
    assertPinned("single-session-assistant recall@5",
      report.recall5("single-session-assistant"), 1.0)
    assertPinned("multi-session recall@5",
      report.recall5("multi-session"), 1.0)
    assertPinned("temporal-reasoning recall@5",
      report.recall5("temporal-reasoning"), 1.0)
    assertPinned("knowledge-update recall@5",
      report.recall5("knowledge-update"), 1.0)
  }

  test("pinned per-type MRR goldens (n=20 per type)") {
    assertPinned("single-session-user mrr",
      report.mrr("single-session-user"), 0.975)
    assertPinned("single-session-assistant mrr",
      report.mrr("single-session-assistant"), 1.0)
    assertPinned("multi-session mrr",
      report.mrr("multi-session"), 0.8416666666666666)
    assertPinned("temporal-reasoning mrr",
      report.mrr("temporal-reasoning"), 0.585)
    assertPinned("knowledge-update mrr",
      report.mrr("knowledge-update"), 0.85)
  }

  test("abstention separates at n=20: every _abs top-1 under the floor") {
    assert(report.separated,
      f"ceiling ${report.abstentionCeiling}%.4f must sit under the " +
        f"answerable floor ${report.answerableFloor}%.4f")
    assertPinned("abstention ceiling", report.abstentionCeiling,
      0.3378242735081205)
    assertPinned("answerable floor", report.answerableFloor,
      0.4287213403408292)
    assert(report.abstainedOk == 20, s"got ${report.abstainedOk}")
  }

  test("accuracy analogue vs the reference full anchor (87.00%)") {
    assertPinned("accuracy_pct", report.accuracyPct, 100.0)
  }

  test("knowledge-update: every revision outranks its planted stale twin") {
    val ranked = LongMemEvalFull.rankings(spark)
    LongMemEvalFull.questions.zipWithIndex
      .filter(_._1.qtype == "knowledge-update").foreach { case (q, i) =>
        val ids = ranked(i)
        val evRank = ids.indexOf(q.evidence.head)
        val staleRank = ids.indexOf(LongMemEvalFull.staleTwin(q.qid))
        assert(evRank >= 0, s"${q.qid}: revision not retrieved")
        assert(staleRank < 0 || evRank < staleRank,
          s"${q.qid}: stale value at rank $staleRank outranks the " +
            s"revision at rank $evRank")
      }
  }

  // ---- 500-question tier (r18, VERDICT r17 item 7): the reference full
  // tier's size. Goldens derived with `runMain graft.tools.LmeReportProbe
  // full500`; reference full anchors alongside
  // (`benchmarks/EXPERIMENT_LOG.md:92-93`: accuracy 87.00%, recall@5
  // 97.00% over 500 questions).

  private lazy val report500 = LongMemEvalFull.report500(spark)

  test("500-q fixture shape: exactly 500 questions (84 per answerable " +
    "type, 80 abstention), 42 distinct conversations, deterministic") {
    val qs = LongMemEvalFull.questions500
    assert(qs.size == 500)
    val byType = qs.groupBy(_.qtype).view.mapValues(_.size).toMap
    LongMemEvalMini.Types.filterNot(_ == "abstention").foreach(t =>
      assert(byType(t) == 84, s"$t: ${byType(t)}"))
    assert(byType("abstention") == 80)
    // evidence resolves into the 500-tier turn set
    val byId = LongMemEvalFull.turns500.map(t => t.dialogId -> t).toMap
    assert(byId.size == LongMemEvalFull.turns500.size, "dialog ids unique")
    qs.foreach(_.evidence.foreach(e =>
      assert(byId.contains(e), s"evidence $e is not a turn")))
    // no two conversations share a full slot tuple: their turn TEXTS
    // (conv-id-independent part) must differ pairwise
    val texts = LongMemEvalFull.turns500.groupBy(_.conv).view
      .mapValues(_.sortBy(t => (t.session, t.idx)).map(_.text).mkString("|"))
      .values.toSeq
    assert(texts.distinct.size == texts.size,
      "decade-mixed slots must make all 42 conversations distinct")
    // all sessions predate Now
    LongMemEvalFull.turns500.foreach { t =>
      assert(LongMemEvalFull.sessionStart500(t.conv, t.session)
        .before(LongMemEvalMini.Now), s"conv ${t.conv} s${t.session}")
    }
    // the generator is pure: two invocations are identical
    assert(LongMemEvalFull.questions500 == LongMemEvalFull.questions500)
  }

  test("500-q pinned per-type goldens next to the reference full anchors " +
    "(87.00% accuracy / 97.00% recall@5)") {
    Seq("single-session-user", "single-session-assistant", "multi-session",
      "temporal-reasoning", "knowledge-update").foreach(t =>
      assertPinned(s"$t recall@5 (500q)", report500.recall5(t), 1.0))
    assertPinned("single-session-user mrr (500q)",
      report500.mrr("single-session-user"), 0.9583333333333334)
    assertPinned("single-session-assistant mrr (500q)",
      report500.mrr("single-session-assistant"), 1.0)
    assertPinned("multi-session mrr (500q)",
      report500.mrr("multi-session"), 0.8472222222222221)
    assertPinned("temporal-reasoning mrr (500q)",
      report500.mrr("temporal-reasoning"), 0.6037698412698413)
    assertPinned("knowledge-update mrr (500q)",
      report500.mrr("knowledge-update"), 0.8333333333333331)
    assert(report500.separated,
      f"ceiling ${report500.abstentionCeiling}%.4f must sit under the " +
        f"floor ${report500.answerableFloor}%.4f")
    assertPinned("abstention ceiling (500q)", report500.abstentionCeiling,
      0.35969212399692796)
    assertPinned("answerable floor (500q)", report500.answerableFloor,
      0.40710382831935515)
    assert(report500.answeredAt5 == 420 && report500.abstainedOk == 80,
      s"${report500.answeredAt5}/${report500.abstainedOk}")
    assertPinned("accuracy_pct (500q)", report500.accuracyPct, 100.0)
  }
}
