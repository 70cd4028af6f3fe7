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
}
