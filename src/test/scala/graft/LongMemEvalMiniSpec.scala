package graft

import graft.tools.{LongMemEvalMini, RetrievalMetrics}
import org.scalatest.funsuite.AnyFunSuite

/** LongMemEval-mini retrieval benchmark (r16, VERDICT r15 item 4): the
  * deterministic fixture ([[graft.tools.LongMemEvalMini]], mirroring
  * `/root/reference/tests/benchmarks/longmemeval/test_longmemeval.py`)
  * pins per-type recall@5 / MRR goldens over the six LongMemEval question
  * types, stratified 5 per type like the reference's mini tier. Reference
  * anchors recorded for comparison (`benchmarks/EXPERIMENT_LOG.md:92-93`):
  * mini 70.00% accuracy / recall@5 96.67%; full 87.00% / 97.00%. Use
  * `runMain graft.tools.LmeReportProbe` to recompute goldens after an
  * intentional fixture or ranking change.
  */
class LongMemEvalMiniSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val report = LongMemEvalMini.report(spark)

  private def assertPinned(name: String, got: Double, expected: Double): Unit =
    assert(math.abs(got - expected) < 1e-6,
      f"$name = $got%.6f, pinned golden $expected%.6f — a recall-ranking " +
        "change moved the LongMemEval-mini metrics; re-pin only if intentional")

  test("fixture is stratified 5 per type over the six LongMemEval types " +
    "(select_dataset stratified_per_type, test_longmemeval.py:169-180)") {
    val byType = LongMemEvalMini.questions.groupBy(_.qtype)
    assert(byType.keySet == LongMemEvalMini.Types.toSet)
    byType.foreach { case (t, qs) =>
      assert(qs.size == 5, s"$t has ${qs.size} questions, want 5") }
    // abstention questions follow the reference's id contract
    // (evaluator.py:75-77 is_abstention_question: the `_abs` suffix) and
    // carry no evidence; every answerable question carries some
    LongMemEvalMini.questions.foreach { q =>
      assert((q.qtype == "abstention") == q.qid.endsWith("_abs"), q.qid)
      assert((q.qtype == "abstention") == q.evidence.isEmpty, q.qid)
    }
    // evidence ids resolve to real turns, and the assistant type's
    // evidence really lives in ASSISTANT turns (the type's whole point)
    val byId = LongMemEvalMini.turns.map(t => t.dialogId -> t).toMap
    LongMemEvalMini.questions.foreach(_.evidence.foreach(e =>
      assert(byId.contains(e), s"evidence $e is not a turn")))
    LongMemEvalMini.questions.filter(_.qtype == "single-session-assistant")
      .foreach(q => q.evidence.foreach(e =>
        assert(byId(e).role == "assistant", s"$e must be an assistant turn")))
    LongMemEvalMini.questions.filter(_.qtype == "multi-session").foreach { q =>
      val sessions = q.evidence.map(byId(_).session).distinct
      assert(sessions.size >= 2,
        s"${q.qid}: multi-session evidence must span sessions, got $sessions")
    }
  }

  test("pinned per-type recall@5 goldens") {
    assertPinned("single-session-user recall@5",
      report.recall5("single-session-user"), 1.0)
    assertPinned("single-session-assistant recall@5",
      report.recall5("single-session-assistant"), 1.0)
    assertPinned("multi-session recall@5",
      report.recall5("multi-session"), 0.9333333333333332)
    assertPinned("temporal-reasoning recall@5",
      report.recall5("temporal-reasoning"), 1.0)
    assertPinned("knowledge-update recall@5",
      report.recall5("knowledge-update"), 1.0)
  }

  test("pinned per-type MRR goldens") {
    assertPinned("single-session-user mrr",
      report.mrr("single-session-user"), 1.0)
    assertPinned("single-session-assistant mrr",
      report.mrr("single-session-assistant"), 0.9)
    assertPinned("multi-session mrr",
      report.mrr("multi-session"), 0.8666666666666668)
    assertPinned("temporal-reasoning mrr",
      report.mrr("temporal-reasoning"), 0.5166666666666667)
    assertPinned("knowledge-update mrr",
      report.mrr("knowledge-update"), 0.7)
  }

  test("abstention separates: every _abs top-1 sits under the answerable floor") {
    assert(report.separated,
      f"ceiling ${report.abstentionCeiling}%.4f must sit under the " +
        f"answerable floor ${report.answerableFloor}%.4f")
    assertPinned("abstention ceiling", report.abstentionCeiling,
      0.32250208381960077)
    assertPinned("answerable floor", report.answerableFloor,
      0.4510140995597385)
    assert(report.abstainedOk == 5, s"got ${report.abstainedOk}")
  }

  test("accuracy analogue: 29/30 (reference mini anchor: 70.00%, 21/30)") {
    assert(report.answeredAt5 == 24, s"got ${report.answeredAt5} of 25")
    assertPinned("accuracy_pct", report.accuracyPct, 100.0 * 29 / 30)
  }

  test("knowledge-update: the revision outranks its planted stale twin") {
    val stale = Map("ku1" -> "L1:1:5", "ku2" -> "L2:1:3", "ku3" -> "L2:1:1",
      "ku4" -> "L3:1:1", "ku5" -> "L3:1:2")
    val ranked = LongMemEvalMini.rankings(spark)
    LongMemEvalMini.questions.zipWithIndex
      .filter(_._1.qtype == "knowledge-update").foreach { case (q, i) =>
        val ids = ranked(i)
        val evRank = ids.indexOf(q.evidence.head)
        val staleRank = ids.indexOf(stale(q.qid))
        assert(evRank >= 0, s"${q.qid}: revision not retrieved")
        assert(staleRank < 0 || evRank < staleRank,
          s"${q.qid}: stale value at rank $staleRank outranks the " +
            s"revision at rank $evRank")
      }
  }

  test("goldens are sensitive: zeroing the keyword weight moves the metrics") {
    import spark.implicits._
    val mem = LongMemEvalMini.memories(spark).cache()
    mem.count()
    val noEdges = Seq.empty[graft.domain.Edge].toDF()
    val broken = graft.domain.Scoring.Weights(keyword = 0.0)
    val qs = LongMemEvalMini.questions.zipWithIndex
      .filter(_._1.qtype == "single-session-user")
    val brokenMrr = qs.map { case (q, _) =>
      RetrievalMetrics.mrr(
        LongMemEvalMini.answerScored(mem, noEdges, q, broken).map(_._1),
        q.evidence)
    }.sum / qs.size
    mem.unpersist()
    assert(brokenMrr < report.mrr("single-session-user"),
      s"keyword weight 0 must hurt ssu mrr: $brokenMrr vs ${report.mrr("single-session-user")}")
  }
}
