package graft.tools

import java.sql.Timestamp

import graft.domain.{Ingest, Recall, RecallRequest}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic LongMemEval-mini fixture (r16, VERDICT r15 item 4) — the
  * reference's SECOND benchmark tier (`tests/benchmarks/longmemeval/
  * test_longmemeval.py`; published anchors `benchmarks/EXPERIMENT_LOG.md:92-93`:
  * full 87.00% / recall@5 97.00% over 500 questions, mini 70.00% /
  * recall@5 96.67% over 30 questions stratified 5 per type).
  *
  * Where LoCoMo is human-to-human chat, LongMemEval is USER-ASSISTANT
  * history: the question types interrogate what the user said
  * (single-session-user), what the ASSISTANT said (single-session-
  * assistant — the answer lives in a machine turn, so assistant turns
  * must be first-class memories), facts spread over several sessions
  * (multi-session), date arithmetic (temporal-reasoning), facts that were
  * REVISED later (knowledge-update — the stale value is a planted
  * distractor that must not outrank the revision), and questions whose
  * fact never appears (abstention — `_abs` question-id suffix, the
  * reference's `is_abstention_question`; correct behavior is declining,
  * which this deterministic twin scores as top-1 score under the
  * answerable floor, the LocomoMini contract).
  *
  * 30 questions, stratified 5 per type like the reference's mini tier
  * (`test_longmemeval.py:169-180` select_dataset stratified_per_type).
  * Per-type recall parameterization mirrors the reference evaluator
  * (`test_longmemeval.py:441-540`): temporal questions get month/year
  * hints (its `_extract_temporal_bounds` keyword gate), multi-session
  * questions run with auto-decompose, knowledge-update questions pin
  * recency bias ON (the evaluator's stale-check doctrine,
  * `diagnose_failures.py:277-308`). Everything is bit-stable: fixed
  * session datetimes, fixed now, lexical embeddings.
  */
object LongMemEvalMini {

  val Now: Timestamp = Timestamp.valueOf("2026-06-15 00:00:00")

  case class Turn(conv: Int, session: Int, idx: Int, role: String,
      text: String) {
    def dialogId: String = s"L$conv:$session:$idx"
  }

  /** `qtype` is one of the six graded types; abstention questions carry
    * the `_abs` id suffix and empty evidence.
    */
  case class Question(qid: String, qtype: String, conv: Int,
      question: String, evidence: Seq[String])

  val Types: Seq[String] = Seq("single-session-user",
    "single-session-assistant", "multi-session", "temporal-reasoning",
    "knowledge-update", "abstention")

  val SessionStart: Map[(Int, Int), Timestamp] = Map(
    (1, 1) -> Timestamp.valueOf("2026-02-03 09:00:00"),
    (1, 2) -> Timestamp.valueOf("2026-02-20 18:30:00"),
    (1, 3) -> Timestamp.valueOf("2026-03-15 11:00:00"),
    (1, 4) -> Timestamp.valueOf("2026-04-10 16:00:00"),
    (2, 1) -> Timestamp.valueOf("2026-01-12 10:00:00"),
    (2, 2) -> Timestamp.valueOf("2026-02-08 14:00:00"),
    (2, 3) -> Timestamp.valueOf("2026-03-02 09:30:00"),
    (2, 4) -> Timestamp.valueOf("2026-04-22 17:00:00"),
    (3, 1) -> Timestamp.valueOf("2026-01-28 08:30:00"),
    (3, 2) -> Timestamp.valueOf("2026-02-25 15:00:00"),
    (3, 3) -> Timestamp.valueOf("2026-03-20 11:30:00"),
    (3, 4) -> Timestamp.valueOf("2026-05-05 10:00:00"))

  // Conversation 1: food / travel / training. Confusers share keywords
  // with every planted fact so rankings stay sensitive.
  private def conv1: Seq[Turn] = {
    def t(s: Int, i: Int, r: String, tx: String) = Turn(1, s, i, r, tx)
    Seq(
      t(1, 1, "user", "I am allergic to peanuts so most satay dishes are off the table for me"),
      t(1, 2, "assistant", "Noted, I will steer restaurant suggestions away from peanut heavy menus"),
      t(1, 3, "user", "I signed up for the spring river marathon yesterday"),
      t(1, 4, "assistant", "Great goal, a sixteen week training plan would start this week"),
      t(1, 5, "user", "My gym membership is at the IronWorks club on Fifth street"),
      t(1, 6, "assistant", "For a peanut free curry house I recommend the Lotus Garden on Elm street"),
      t(1, 7, "user", "A curry house sounds perfect for Friday"),
      t(1, 8, "user", "I also keep meaning to fix the squeaky brakes on my commuter bike"),
      t(2, 1, "user", "I booked a trip to Lisbon in February for the first week of April"),
      t(2, 2, "assistant", "For Lisbon I suggest the Alfama district walking tour at sunset"),
      t(2, 3, "user", "My longest training run so far is eighteen kilometers along the river"),
      t(2, 4, "assistant", "Eighteen is right on schedule for week three of the plan"),
      t(2, 5, "user", "The trail by the gym floods when it rains, I had to reroute twice"),
      t(2, 6, "user", "A colleague recommended audiobooks for long runs, any thoughts"),
      t(2, 7, "assistant", "Podcasts with steady pacing episodes work well for tempo runs"),
      t(3, 1, "user", "I switched my gym to the RiverFit club near the park this week"),
      t(3, 2, "assistant", "RiverFit has a better pool, good pick for recovery days"),
      t(3, 3, "user", "My longest training run is now thirty one kilometers, legs held up fine"),
      t(3, 4, "user", "The Lisbon trip moved from April to the middle of May"),
      t(3, 5, "assistant", "May in Lisbon is warmer, pack a light rain jacket anyway"),
      t(3, 6, "user", "The new pool schedule clashes with my Tuesday calls"),
      t(4, 1, "user", "I finished the spring river marathon in three hours fifty eight minutes"),
      t(4, 2, "assistant", "Congratulations, under four hours on a first marathon is excellent"),
      t(4, 3, "user", "The medal is hanging over my desk now"),
      t(4, 4, "user", "Lisbon packing starts this weekend, the checklist is long"),
      t(4, 5, "assistant", "Remember comfortable shoes for the Alfama hills"))
  }

  // Conversation 2: work / devices. Knowledge updates: laptop, team role.
  private def conv2: Seq[Turn] = {
    def t(s: Int, i: Int, r: String, tx: String) = Turn(2, s, i, r, tx)
    Seq(
      t(1, 1, "user", "I work on the data platform team as a pipeline engineer"),
      t(1, 2, "assistant", "Understood, I will keep examples in that domain"),
      t(1, 3, "user", "My work laptop is a fourteen inch SwiftBook Air"),
      t(1, 4, "user", "Our standup time is nine fifteen every weekday"),
      t(1, 5, "assistant", "For flaky shuffle jobs try bumping the retry budget before resizing"),
      t(1, 6, "user", "The retry budget trick already saved one deploy this week"),
      t(2, 1, "user", "I presented the quarterly reliability review in early February"),
      t(2, 2, "assistant", "For the follow up deck, lead with the incident trend chart"),
      t(2, 3, "user", "The review went well, two action items landed on my plate"),
      t(2, 4, "user", "My desk neighbor keeps a loud mechanical keyboard, hard to focus"),
      t(2, 5, "assistant", "Noise cancelling headphones with a transparency toggle help in open offices"),
      t(3, 1, "user", "My laptop was replaced with a sixteen inch SwiftBook Pro this week"),
      t(3, 2, "assistant", "The Pro fans run quieter under container builds, you will notice"),
      t(3, 3, "user", "I now work on the streaming infra team after moving off data platform"),
      t(3, 4, "assistant", "Streaming infra runs the watermark clinic on Thursdays, worth joining"),
      t(3, 5, "user", "First streaming on call shift starts next month"),
      t(4, 1, "user", "The on call handbook needs a section on backpressure alarms"),
      t(4, 2, "assistant", "Draft it from the last three alarm postmortems for concrete thresholds"),
      t(4, 3, "user", "Good idea, two of those postmortems were mine anyway"),
      t(4, 4, "user", "The watermark clinic resolved my lateness question in ten minutes"))
  }

  // Conversation 3: home / hobbies. Updates: apartment, coffee order.
  private def conv3: Seq[Turn] = {
    def t(s: Int, i: Int, r: String, tx: String) = Turn(3, s, i, r, tx)
    Seq(
      t(1, 1, "user", "I live in a studio apartment on Maple avenue"),
      t(1, 2, "user", "My usual coffee order is a flat white with oat milk"),
      t(1, 3, "assistant", "The roastery on Ninth pulls a great flat white before eight"),
      t(1, 4, "user", "I started a balcony herb garden with basil and thyme in late January"),
      t(1, 5, "assistant", "Basil wants the sunniest corner, thyme tolerates the shade"),
      t(1, 6, "user", "The watering schedule app keeps nagging me at midnight"),
      t(2, 1, "user", "The basil seedlings doubled in size this month"),
      t(2, 2, "assistant", "Pinch the tops so the basil bushes out instead of bolting"),
      t(2, 3, "user", "I repotted the thyme into the clay planter"),
      t(2, 4, "user", "A pigeon keeps landing on the balcony rail and judging me"),
      t(3, 1, "user", "I moved in March and now live in a two bedroom place on Harbor lane"),
      t(3, 2, "assistant", "A second room makes a fine plant shelf and office split"),
      t(3, 3, "user", "My coffee order changed to a plain espresso, doctor said less milk"),
      t(3, 4, "user", "The herb garden survived the move, basil barely wilted"),
      t(3, 5, "assistant", "Espresso pairs better with the roastery's darker beans anyway"),
      t(4, 1, "user", "The new office room setup is done, desk faces the window"),
      t(4, 2, "assistant", "Face the window at a right angle to cut screen glare"),
      t(4, 3, "user", "The basil finally flowered, I kept one stem for seeds"),
      t(4, 4, "user", "Harbor lane is quieter than Maple avenue ever was"))
  }

  def turns: Seq[Turn] = conv1 ++ conv2 ++ conv3

  /** 30 questions, 5 per type — the reference mini tier's stratification. */
  def questions: Seq[Question] = Seq(
    // single-session-user: the fact is ONE user turn
    Question("ssu1", "single-session-user", 1,
      "Is the user allergic to peanuts?", Seq("L1:1:1")),
    Question("ssu2", "single-session-user", 1,
      "What is the user's longest training run distance now?", Seq("L1:3:3")),
    Question("ssu3", "single-session-user", 2,
      "What time is the user's standup?", Seq("L2:1:4")),
    Question("ssu4", "single-session-user", 3,
      "What went into the balcony herb garden when it was started in late January?", Seq("L3:1:4")),
    Question("ssu5", "single-session-user", 2,
      "When does the user's first on call shift start?", Seq("L2:3:5")),
    // single-session-assistant: the fact is ONE assistant turn
    Question("ssa1", "single-session-assistant", 1,
      "Which curry house did the assistant recommend?", Seq("L1:1:6")),
    Question("ssa2", "single-session-assistant", 1,
      "Which walking tour did the assistant suggest for Lisbon?", Seq("L1:2:2")),
    Question("ssa3", "single-session-assistant", 2,
      "What did the assistant suggest for flaky shuffle jobs?", Seq("L2:1:5")),
    Question("ssa4", "single-session-assistant", 3,
      "What did the assistant say about where basil wants to sit?", Seq("L3:1:5")),
    Question("ssa5", "single-session-assistant", 2,
      "Which postmortems should the backpressure section draft from?",
      Seq("L2:4:2")),
    // multi-session: evidence spans sessions
    Question("ms1", "multi-session", 1,
      "Tell me about the user signing up for and finishing the spring river marathon",
      Seq("L1:1:3", "L1:4:1")),
    Question("ms2", "multi-session", 1,
      "How far did the user's longest training run get over the weeks?",
      Seq("L1:2:3", "L1:3:3")),
    Question("ms3", "multi-session", 3,
      "What happened to the basil after the herb garden was planted?",
      Seq("L3:1:4", "L3:2:1", "L3:4:3")),
    Question("ms4", "multi-session", 2,
      "What happened with the watermark clinic after the assistant mentioned it?",
      Seq("L2:3:4", "L2:4:4")),
    Question("ms5", "multi-session", 1,
      "Did the Lisbon trip that was booked for April move to another month?",
      Seq("L1:2:1", "L1:3:4")),
    // temporal-reasoning: date placement / ordering
    Question("tr1", "temporal-reasoning", 1,
      "When did the user book the Lisbon trip?", Seq("L1:2:1")),
    Question("tr2", "temporal-reasoning", 2,
      "When did the user present the quarterly reliability review?",
      Seq("L2:2:1")),
    Question("tr3", "temporal-reasoning", 3,
      "When did the user start the balcony herb garden?", Seq("L3:1:4")),
    Question("tr4", "temporal-reasoning", 3,
      "When did the user move to the Harbor lane apartment?", Seq("L3:3:1")),
    Question("tr5", "temporal-reasoning", 1,
      "Was the spring river marathon signup before the user booked the Lisbon trip in February?",
      Seq("L1:1:3", "L1:2:1")),
    // knowledge-update: the REVISED value must be retrieved over the stale
    Question("ku1", "knowledge-update", 1,
      "Which gym does the user belong to?", Seq("L1:3:1")),
    Question("ku2", "knowledge-update", 2,
      "What laptop does the user work on?", Seq("L2:3:1")),
    Question("ku3", "knowledge-update", 2,
      "Which team does the user work on?", Seq("L2:3:3")),
    Question("ku4", "knowledge-update", 3,
      "Where does the user live?", Seq("L3:3:1")),
    Question("ku5", "knowledge-update", 3,
      "What is the user's coffee order?", Seq("L3:3:3")),
    // abstention: the fact never appears — correct behavior is declining
    Question("abs1_abs", "abstention", 1,
      "Is a pet cat ever mentioned by name?", Nil),
    Question("abs2_abs", "abstention", 2,
      "Which programming certification was earned this year?", Nil),
    Question("abs3_abs", "abstention", 3,
      "What musical instrument gets played in the evenings?", Nil),
    Question("abs4_abs", "abstention", 1,
      "What is the name of the dentist?", Nil),
    Question("abs5_abs", "abstention", 2,
      "What is the manager's name?", Nil))

  def memories(spark: SparkSession): DataFrame =
    memoriesFor(spark, turns, (c, s) => SessionStart((c, s)))

  /** The fixture store builder, parameterized over turns and session
    * start times so the full-tier generator ([[LongMemEvalFull]]) shares
    * the exact ingest shape (tags, metadata sidecar, lexical embeddings).
    */
  def memoriesFor(spark: SparkSession, turns: Seq[Turn],
      start: (Int, Int) => Timestamp): DataFrame = {
    import spark.implicits._
    val rows = turns.map { u =>
      val st = start(u.conv, u.session)
      val ts = new Timestamp(st.getTime + u.idx * 60000L)
      val tags = Seq("longmemeval-test", s"conversation:conv-${u.conv}",
        s"session:${u.session}", s"role:${u.role}")
      val sessionIso = st.toLocalDateTime.toString + "Z"
      val metadata =
        s"""{"source": "longmemeval_benchmark", "conversation_id": "conv-${u.conv}",
           | "session_id": "${u.session}", "dialog_id": "${u.dialogId}",
           | "role": "${u.role}", "session_datetime": "$sessionIso"}"""
          .stripMargin.replaceAll("\n", "")
      (u.dialogId, s"${u.role}: ${u.text}", tags, metadata, ts, 0.5, "Context")
    }
    Ingest.prepare(rows.toDF(
      "id", "content", "tags", "metadata", "timestamp", "importance", "type"),
      embed = Some(graft.domain.LexicalEmbedding.embedColumn()))
  }

  /** Answer one question through the full recall path with the
    * reference evaluator's per-type parameterization (see object doc).
    * Returns ranked (dialogId, final_score).
    */
  def answerScored(memories: DataFrame, edges: DataFrame, q: Question,
      weights: graft.domain.Scoring.Weights = graft.domain.Scoring.Weights())
      : Seq[(String, Double)] = {
    val temporal = q.qtype == "temporal-reasoning"
    val update = q.qtype == "knowledge-update"
    val multi = q.qtype == "multi-session"
    val query = (q.question +:
      (if (temporal) LocomoMini.temporalHints(q.question) else Nil))
      .mkString(" ")
    // NO auto-decompose here: LongMemEval's evaluator runs plain recall
    // with temporal bounds / graph expansion (`test_longmemeval.py:488-540`)
    // — decomposition is the LoCoMo multihop trick, and these entity-less
    // session questions only feed its broadening subqueries noise
    val limit = if (multi) 100 else if (temporal) 75 else 50
    val req = RecallRequest(query = Some(query), limit = limit,
      tags = Seq(s"conversation:conv-${q.conv}"), tagMatch = "exact",
      recencyBias = if (update) "on" else "auto",
      weights = weights,
      queryEmbedder = Some(graft.domain.LexicalEmbedding.embed(_)),
      now = Now)
    Recall.recall(memories, edges, req)
      .select("id", "final_score").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
  }

  /** Ranked ids per question index, run under the LocomoMini session
    * tuning (tiny corpus: AQE off, few shuffle partitions). Sequential
    * for golden determinism (the LocomoMini doctrine).
    */
  def scoredRankings(spark: SparkSession): Map[Int, Seq[(String, Double)]] = {
    val mem = memories(spark).cache()
    mem.count()
    try scoredRankingsOver(spark, mem, questions)
    finally mem.unpersist()
  }

  /** [[scoredRankings]] over an explicit (cached) fixture store and
    * question set — shared with the full tier ([[LongMemEvalFull]]).
    */
  def scoredRankingsOver(spark: SparkSession, mem: DataFrame,
      qs: Seq[Question]): Map[Int, Seq[(String, Double)]] = {
    import spark.implicits._
    val es = Seq.empty[graft.domain.Edge].toDF()
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try qs.zipWithIndex.map { case (q, i) =>
      i -> answerScored(mem, es, q)
    }.toMap
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  def rankings(spark: SparkSession): Map[Int, Seq[String]] =
    scoredRankings(spark).view.mapValues(_.map(_._1)).toMap

  /** Per-type recall@5 / MRR plus the abstention contract, computed off
    * one scoredRankings pass — the Bench headline's and the spec's shared
    * scorer, so goldens and the published record cannot drift.
    */
  case class Report(recall5: Map[String, Double], mrr: Map[String, Double],
      abstentionCeiling: Double, answerableFloor: Double,
      answeredAt5: Int, abstainedOk: Int, nQuestions: Int) {
    def separated: Boolean = abstentionCeiling < answerableFloor
    /** The deterministic analogue of the reference's judged accuracy:
      * an answerable question counts when EVERY evidence id is in the
      * top 5 (the reference's recall@5 gate), an abstention one when its
      * top-1 score stays under the answerable floor.
      */
    def accuracyPct: Double = 100.0 * (answeredAt5 + abstainedOk) / nQuestions
  }

  def report(spark: SparkSession): Report =
    reportOver(scoredRankings(spark), questions)

  /** The per-type scorer as a pure function of rankings + questions —
    * shared with the full tier so its goldens use the IDENTICAL metric
    * definitions (including the single-session-user answerable floor).
    */
  def reportOver(scored: Map[Int, Seq[(String, Double)]],
      qs: Seq[Question]): Report = {
    val answerable = Types.filterNot(_ == "abstention")
    def perType(f: (Seq[String], Seq[String]) => Double): Map[String, Double] =
      answerable.map { t =>
        val sel = qs.zipWithIndex.filter(_._1.qtype == t)
        t -> sel.map { case (q, i) =>
          f(scored(i).map(_._1), q.evidence) }.sum / sel.size
      }.toMap
    val r5 = perType(RetrievalMetrics.recallAtK(_, _, 5))
    val mrr = perType(RetrievalMetrics.mrr)
    def top1(i: Int): Double = scored(i).headOption.map(_._2).getOrElse(0.0)
    val absTop1 = qs.zipWithIndex.filter(_._1.qtype == "abstention")
      .map(x => top1(x._2))
    // the floor is the weakest confidently-answerable top-1 — the
    // single-session-user set, matching the LocomoMini abstention contract
    val floor = qs.zipWithIndex.filter(_._1.qtype == "single-session-user")
      .map(x => top1(x._2)).min
    val answeredAt5 = qs.zipWithIndex
      .filter(x => x._1.qtype != "abstention")
      .count { case (q, i) =>
        q.evidence.forall(scored(i).take(5).map(_._1).contains) }
    val abstainedOk = absTop1.count(_ < floor)
    Report(r5, mrr, absTop1.max, floor, answeredAt5, abstainedOk, qs.size)
  }
}
