package graft

import graft.domain.{Recall, RecallRequest, TimeExpressions}
import graft.tools.{LocomoMini, RetrievalMetrics}
import org.scalatest.funsuite.AnyFunSuite

/** Conversation-shaped retrieval benchmark (VERDICT r3 item 4): the
  * deterministic LoCoMo-mini fixture ([[graft.tools.LocomoMini]], mirroring
  * `/root/reference/tests/benchmarks/test_locomo.py`) drives the FULL
  * `Recall.recall` path — auto-decompose (Q6), recency bias in auto mode
  * (R3), and entity expansion (J3) engage together for the first time —
  * and pins per-category recall@5 / MRR goldens like QualityScaleSpec.
  * 150 questions (single 54 / temporal 32 / multihop 32 / update 32,
  * mirroring the reference mini tier's single-heavy category skew at half
  * its 304-question size, with every category >= 30); use
  * `runMain graft.tools.LocomoReport` to recompute goldens after an
  * intentional fixture or ranking change.
  */
class LocomoMiniSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val ranked: Map[Int, Seq[String]] = LocomoMini.rankings(spark)

  private def catMean(cat: String,
      f: (Seq[String], Seq[String]) => Double): Double = {
    val qs = LocomoMini.questions.zipWithIndex.filter(_._1.category == cat)
    qs.map { case (q, i) => f(ranked(i), q.evidence) }.sum / qs.size
  }

  private def assertPinned(name: String, got: Double, expected: Double): Unit =
    assert(math.abs(got - expected) < 1e-6,
      f"$name = $got%.6f, pinned golden $expected%.6f — a recall-ranking " +
        "change moved the LoCoMo-mini metrics; re-pin only if intentional")

  test("question-category plumbing matches the reference evaluator") {
    // temporal questions (and only they) carry temporal intent, so
    // recencyBias="auto" re-ranks exactly the temporal category
    // (test_locomo.py:618-638 x time.py:10-27)
    LocomoMini.questions.foreach { q =>
      val temporal = LocomoMini.isTemporalQuestion(q.question)
      assert(temporal == (q.category == "temporal"),
        s"'${q.question}' classified temporal=$temporal")
      if (q.category == "temporal")
        assert(TimeExpressions.hasTemporalIntent(q.question),
          s"'${q.question}' must trigger auto recency bias")
    }
    // multi-hop questions extract the possessive speaker for the
    // secondary tag search (test_locomo.py:523-596)
    assert(LocomoMini.speakerFromQuestion(
      "What job does Elena's brother have?").contains("Elena"))
    assert(LocomoMini.speakerFromQuestion(
      "What did Priya's mentor publish?").contains("Priya"))
  }

  /** Evidence-presence accuracy — the deterministic analog of the
    * reference's answer-in-recalled-memories check (`test_locomo.py`
    * word-overlap scoring runs over the WHOLE recalled list, not a top-k).
    */
  private def accuracy(cat: String): Double =
    catMean(cat, (got, want) => if (want.forall(got.contains)) 1.0 else 0.0)

  test("every category retrieves all its evidence (reference accuracy = 1)") {
    assert(accuracy("single") == 1.0)
    assert(accuracy("temporal") == 1.0)
    assert(accuracy("multihop") == 1.0, "an evidence dialog was never " +
      "retrieved — the expansion bridge or a channel regressed")
  }

  test("single-hop: direct fact retrieval") {
    assertPinned("single recall@5",
      catMean("single", RetrievalMetrics.recallAtK(_, _, 5)), 0.88)
    assertPinned("single recall@10",
      catMean("single", RetrievalMetrics.recallAtK(_, _, 10)), 1.0)
    assertPinned("single mrr", catMean("single", RetrievalMetrics.mrr),
      0.6763809523809523)
  }

  test("temporal: recency bias ranks the latest matching event first") {
    assertPinned("temporal recall@5",
      catMean("temporal", RetrievalMetrics.recallAtK(_, _, 5)),
      0.7142857142857143)
    assertPinned("temporal recall@10",
      catMean("temporal", RetrievalMetrics.recallAtK(_, _, 10)),
      0.8571428571428571)
    assertPinned("temporal mrr", catMean("temporal", RetrievalMetrics.mrr),
      0.453517316017316)
  }

  test("multi-hop: the entity bridge ranks the second hop, not just " +
    "retrieves it") {
    // VERDICT r6 item 3: with expansion alone, presence accuracy was 1.0
    // but recall@5 sat at 0.042 — the second-hop evidence lives INSIDE the
    // tag-scoped seed pool, where the reference's seen-ids expansion can
    // never lift it, so the final sort buried it under direct-match rows.
    // The entityBridge re-rank (Recall.entityBridgeBoost) boosts retrieved
    // rows mentioned-by or spoken-by a top-seed entity; the pins below are
    // the measured post-bridge goldens (LocomoReport).
    assertPinned("multihop recall@5",
      catMean("multihop", RetrievalMetrics.recallAtK(_, _, 5)),
      0.6666666666666666)
    assertPinned("multihop recall@10",
      catMean("multihop", RetrievalMetrics.recallAtK(_, _, 10)), 0.75)
    assertPinned("multihop mrr", catMean("multihop", RetrievalMetrics.mrr),
      0.49027777777777776)
  }

  test("knowledge update: current-state surfaces the new fact, never the old") {
    // the LongMemEval-shaped category: stateMode="current" must resolve the
    // superseded dialog through the J4 walk — the NEW dialog ranks, the OLD
    // one is absent from the entire result
    LocomoMini.questions.zipWithIndex
      .filter(_._1.category == "update").foreach { case (q, i) =>
        val newId = q.evidence.head
        val oldId = LocomoMini.Supersessions.find(_._2 == newId).get._1
        assert(ranked(i).contains(newId),
          s"'${q.question}': current fact $newId not retrieved")
        assert(!ranked(i).contains(oldId),
          s"'${q.question}': superseded $oldId leaked into current-state results")
      }
    assertPinned("update recall@5",
      catMean("update", RetrievalMetrics.recallAtK(_, _, 5)), 0.7)
    assertPinned("update recall@10",
      catMean("update", RetrievalMetrics.recallAtK(_, _, 10)), 0.9)
    assertPinned("update mrr", catMean("update", RetrievalMetrics.mrr),
      0.4106746031746032)
  }

  test("goldens are sensitive: a broken scoring weight flips every category") {
    import spark.implicits._
    // the pinned metrics must actually gate scoring quality — breaking the
    // weight of the channel each category leans on has to change at least
    // one question's MRR in that category, or the goldens would sit in a
    // dead zone where scoring regressions cannot move them. single /
    // temporal / update rank on the keyword channel; multi-hop evidence is
    // bridged by entity expansion over the vector channel, so its break is
    // the vector weight.
    val mem = LocomoMini.memories(spark).cache()
    mem.count()
    val es = LocomoMini.edges(spark)
    val breaks = Map(
      "single" -> graft.domain.Scoring.Weights(keyword = 0.0),
      "temporal" -> graft.domain.Scoring.Weights(keyword = 0.0),
      "update" -> graft.domain.Scoring.Weights(keyword = 0.0),
      "multihop" -> graft.domain.Scoring.Weights(vector = 0.0))
    breaks.foreach { case (cat, broken) =>
      val flipped = LocomoMini.questions.zipWithIndex
        .filter(_._1.category == cat).exists { case (q, i) =>
          RetrievalMetrics.mrr(LocomoMini.answer(mem, es, q, broken), q.evidence) !=
            RetrievalMetrics.mrr(ranked(i), q.evidence)
        }
      assert(flipped,
        s"$cat goldens did not move under a broken scoring weight — " +
          "the category metric is insensitive to scoring changes")
    }
    mem.unpersist()
  }

  test("time-bounded recall answers as-of the question date (LongMemEval bounds)") {
    import spark.implicits._
    // LongMemEval's temporal-bounds mechanism (test_longmemeval.py:441-481:
    // temporal questions carry end = the question date): the same question
    // bounded to BEFORE the second glacier visit must surface the FIRST
    // visit as the latest event — F1's half-open end bound and the recency
    // re-rank working together on the conversational corpus.
    val mem = LocomoMini.memories(spark).cache()
    val edges = Seq.empty[graft.domain.Edge].toDF()
    def ids(end: Option[java.sql.Timestamp]): Seq[String] =
      Recall.recall(mem, edges, RecallRequest(
        query = Some("When did Elena most recently visit the glacier?"), limit = 10,
        tags = Seq("conversation:conv-1"), recencyBias = "auto", end = end,
        now = LocomoMini.Now))
        .select("id").collect().map(_.getString(0)).toSeq
    val unbounded = ids(None)
    assert(unbounded.indexOf("D1:4:1") >= 0 &&
      (unbounded.indexOf("D1:2:1") == -1 ||
        unbounded.indexOf("D1:4:1") < unbounded.indexOf("D1:2:1")),
      s"unbounded: the April visit must outrank the March one; got $unbounded")
    val asOfMarch = ids(Some(java.sql.Timestamp.valueOf("2026-04-01 00:00:00")))
    // among the glacier-mention rows, the March visit must lead once the
    // April rows are excluded by the bound (absolute rank 1 would be
    // hash-embedding-noise-sensitive; the relative claim is the contract)
    val glacierIds = LocomoMini.turns
      .filter(t => t.conv == 1 && t.text.toLowerCase.contains("glacier"))
      .map(_.dialogId).toSet
    assert(asOfMarch.filter(glacierIds.contains).headOption.contains("D1:2:1"),
      s"as-of March the FIRST visit must lead the glacier rows; got $asOfMarch")
    // nothing after the bound may appear at all (half-open [,end))
    val post = LocomoMini.turns.filter(t => t.conv == 1 && t.session >= 3)
      .map(_.dialogId).toSet
    assert(asOfMarch.forall(!post.contains(_)),
      s"rows after the bound leaked: ${asOfMarch.filter(post.contains)}")
    mem.unpersist()
  }

  test("abstention: unanswerable questions score below answerable top-1s") {
    import spark.implicits._
    // LongMemEval's abstention category, deterministically: the fixture
    // holds nothing about these topics, so with the relevance gate on
    // (scoring.py:229-262 — query-independent components scale by
    // evidence/gate when topical evidence is weak) every returned row must
    // score clearly below the single-hop answerable questions' top-1s.
    // This is the calibration signal a no-answer policy thresholds on.
    val mem = LocomoMini.memories(spark).cache()
    val edges = Seq.empty[graft.domain.Edge].toDF()
    def top1(conv: Int, question: String): Double =
      Recall.recall(mem, edges, RecallRequest(query = Some(question),
        limit = 5, tags = Seq(s"conversation:conv-$conv"),
        relevanceGate = Some(0.6), now = LocomoMini.Now))
        .select("final_score").collect().headOption
        .map(_.getDouble(0)).getOrElse(0.0)
    val unanswerable = Seq(
      top1(1, "What color is the submarine parked outside?"),
      top1(2, "Which opera premiered at the festival?"))
    val answerable = LocomoMini.questions.filter(_.category == "single")
      .map(q => top1(q.conv, q.question))
    // the placeholder hash embeddings put a ~0.2 vector-noise floor under
    // every query, so the separation is real but thin — assert the strict
    // ordering and pin the boundary scores (deterministic fixture; a wider
    // margin would need real embeddings, which this container cannot run)
    assert(unanswerable.max < answerable.min,
      s"gate failed to separate: answerable=$answerable unanswerable=$unanswerable")
    assertPinned("abstention ceiling", unanswerable.max, 0.22185679132160235)
    assertPinned("answerable floor", answerable.min, 0.22832186991382766)
    mem.unpersist()
  }

  test("recency bias does the temporal work: the later event needs it to lead") {
    import spark.implicits._
    val mem = LocomoMini.memories(spark).cache()
    val edges = Seq.empty[graft.domain.Edge].toDF()
    // "When did Elena last visit the glacier?" — two glacier visits exist
    // (S2 first, S4 last). The harness golden pins the S4 visit at rank 1
    // WITH recencyBias=auto; this test asserts the mechanism: the re-rank
    // strictly raises the later visit's score relative to the earlier one.
    def scores(bias: String): Map[String, Double] =
      Recall.recall(mem, edges, RecallRequest(
        query = Some("When did Elena most recently visit the glacier?"), limit = 75,
        tags = Seq("conversation:conv-1"), recencyBias = bias,
        now = LocomoMini.Now))
        .select("id", "final_score").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val off = scores("off")
    val auto = scores("auto")
    val gapOff = off("D1:4:1") - off("D1:2:1")
    val gapAuto = auto("D1:4:1") - auto("D1:2:1")
    assert(gapAuto > gapOff + 1e-9,
      f"recency re-rank must widen the later-visit margin: off=$gapOff%.4f auto=$gapAuto%.4f")
    mem.unpersist()
  }

  test("entity expansion does the bridging work: answers vanish without it") {
    import spark.implicits._
    val mem = LocomoMini.memories(spark).cache()
    val edges = Seq.empty[graft.domain.Edge].toDF()
    val q = LocomoMini.questions.find(
      _.question.startsWith("What did Priya's mentor publish")).get
    // with expansion off and a tight limit, the handbook row (which shares
    // no keyword with the question) is absent; the full harness finds it
    val plain = Recall.recall(mem, edges, RecallRequest(
      query = Some(q.question), limit = 5,
      tags = Seq(s"conversation:conv-${q.conv}"), now = LocomoMini.Now))
      .select("id").collect().map(_.getString(0))
    assert(!plain.contains("D2:4:2"),
      s"fixture too easy: answer surfaced without expansion: ${plain.toSeq}")
    val expanded = Recall.recall(mem, edges, RecallRequest(
      query = Some(q.question), limit = 5, expandEntities = true,
      tags = Seq(s"conversation:conv-${q.conv}"), now = LocomoMini.Now))
      .select("id", "match_type").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(expanded.exists { case (id, mt) =>
      id == "D2:4:2" && mt == "entity_expansion" },
      s"expansion failed to surface the handbook: ${expanded.toSeq}")
    mem.unpersist()
  }

  test("diagnostic report (prints per-question ranks and exact metrics)") {
    LocomoMini.questions.zipWithIndex.foreach { case (q, i) =>
      val ranks = q.evidence.map(e =>
        s"$e@${ranked(i).indexOf(e) match { case -1 => "miss"; case r => r + 1 }}")
      info(f"[${q.category}%8s] '${q.question}' -> ${ranks.mkString(", ")}")
    }
    Seq("single", "temporal", "multihop", "update").foreach { cat =>
      info(s"$cat: r@5=${catMean(cat, RetrievalMetrics.recallAtK(_, _, 5))} " +
        s"r@10=${catMean(cat, RetrievalMetrics.recallAtK(_, _, 10))} " +
        s"mrr=${catMean(cat, RetrievalMetrics.mrr)}")
    }
  }
}
