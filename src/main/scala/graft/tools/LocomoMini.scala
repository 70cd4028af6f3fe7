package graft.tools

import java.sql.Timestamp

import graft.domain.{Ingest, Recall, RecallRequest}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic LoCoMo-mini conversational retrieval benchmark (VERDICT r3
  * item 4), mirroring the reference's LoCoMo harness shape
  * (`/root/reference/tests/benchmarks/test_locomo.py`):
  *
  *  - multi-session conversations ingested one memory per utterance with
  *    conversation/session/speaker tags and dialog-id metadata
  *    (`test_locomo.py:314-389` `_prepare_conversation_memories`);
  *  - questions in three categories — single-hop, temporal, multi-hop
  *    (LoCoMo categories 1-3; categories 4-5 are open-domain/LLM-judged and
  *    out of deterministic scope) — each with labelled evidence dialog ids;
  *  - per-question recall parameterization ported from the reference
  *    evaluator (`test_locomo.py:730-820` `recall_for_question`): temporal
  *    questions get month/year hints appended and a wider limit, multi-hop
  *    questions run with auto-decompose + entity expansion and union a
  *    speaker-tag-scoped secondary search (`test_locomo.py:793-818`);
  *  - answers scored with evidence-id recall@k / MRR (`lab_metrics.py`).
  *
  * This is the first harness exercising Q6 (auto-decompose), R3 (recency
  * bias in `auto` mode — temporal questions trigger it, others must not),
  * and J3 (entity expansion) together through the FULL `Recall.recall`
  * plan. Everything is bit-stable: fixed session datetimes, fixed `now`,
  * placeholder hash embeddings, uniform importance.
  */
object LocomoMini {

  val Now: Timestamp = Timestamp.valueOf("2026-06-01 00:00:00")

  case class Turn(conv: Int, session: Int, idx: Int, speaker: String,
      text: String, entities: Seq[String] = Nil) {
    def dialogId: String = s"D$conv:$session:$idx"
  }

  /** `category` in {"single", "temporal", "multihop"}; evidence = the dialog
    * ids that answer the question (multi-hop questions have 2+).
    */
  case class Question(category: String, conv: Int, question: String,
      evidence: Seq[String])

  /** Session start datetimes, conversation -> session -> timestamp. */
  val SessionStart: Map[(Int, Int), Timestamp] = Map(
    (1, 1) -> Timestamp.valueOf("2026-03-05 09:00:00"),
    (1, 2) -> Timestamp.valueOf("2026-03-20 18:30:00"),
    (1, 3) -> Timestamp.valueOf("2026-04-10 11:00:00"),
    (1, 4) -> Timestamp.valueOf("2026-04-28 16:00:00"),
    (1, 5) -> Timestamp.valueOf("2026-05-15 10:00:00"),
    (2, 1) -> Timestamp.valueOf("2026-02-10 10:00:00"),
    (2, 2) -> Timestamp.valueOf("2026-03-01 14:00:00"),
    (2, 3) -> Timestamp.valueOf("2026-03-25 09:30:00"),
    (2, 4) -> Timestamp.valueOf("2026-04-15 17:00:00"),
    (2, 5) -> Timestamp.valueOf("2026-05-10 12:00:00"),
    (3, 1) -> Timestamp.valueOf("2026-01-20 09:30:00"),
    (3, 2) -> Timestamp.valueOf("2026-02-14 15:00:00"),
    (3, 3) -> Timestamp.valueOf("2026-03-10 11:30:00"),
    (3, 4) -> Timestamp.valueOf("2026-04-05 17:30:00"),
    (3, 5) -> Timestamp.valueOf("2026-05-20 08:30:00"))

  // Conversation 1: Elena & Marcus. Planted facts: parrot Kiwi (S1),
  // cello/quartet (S1), brother Dario (S1) -> marine biologist (S2) ->
  // research station (S5), glacier visits (S2 first, S4 last), quartet
  // festival performance (S4). Confusers share keywords with every planted
  // fact so the ranking goldens stay sensitive.
  private def conv1: Seq[Turn] = {
    def t(s: Int, i: Int, sp: String, tx: String, e: Seq[String] = Nil) =
      Turn(1, s, i, sp, tx, e)
    Seq(
      t(1, 1, "Elena", "I adopted a parrot named Kiwi from the shelter on Sunday"),
      t(1, 2, "Marcus", "That is great news, parrots are clever companions"),
      t(1, 3, "Marcus", "I play the cello in a string quartet downtown"),
      t(1, 4, "Elena", "My neighbor practices trumpet at odd hours, quite the contrast"),
      t(1, 5, "Elena", "My brother Dario is visiting next week from the coast", Seq("dario")),
      t(1, 6, "Marcus", "I would love to meet Dario, bring him to the rehearsal", Seq("dario")),
      t(1, 7, "Elena", "How do you find time to rehearse every week"),
      t(1, 8, "Marcus", "We rehearse on Thursday evenings after work"),
      t(1, 9, "Elena", "I work as a cartographer at the city map bureau"),
      t(2, 1, "Elena", "I visited the Vatnajokull glacier and hiked the ice caves"),
      t(2, 2, "Marcus", "Incredible, I watched a documentary about glacier caves last winter"),
      t(2, 3, "Marcus", "I started learning Portuguese with a tutor this month"),
      t(2, 4, "Marcus", "I ran into Dario at the harbor aquarium lab, he works as a marine biologist now", Seq("dario")),
      t(2, 5, "Elena", "Dario always loved the sea, the aquarium suits him", Seq("dario")),
      t(2, 6, "Elena", "The glacier hike left me sore for days"),
      t(2, 7, "Marcus", "Portuguese verb conjugations are harder than I expected"),
      t(2, 8, "Elena", "Kiwi the parrot now mimics my alarm clock"),
      t(3, 1, "Marcus", "I bought a tandem bicycle for weekend rides along the river"),
      t(3, 2, "Elena", "Kiwi learned to whistle the kettle tune this week"),
      t(3, 3, "Elena", "I am planning another glacier trip for late April"),
      t(3, 4, "Marcus", "The quartet is preparing a program of Dvorak pieces"),
      t(3, 5, "Elena", "Dario sent photos from a research cruise near the fjords", Seq("dario")),
      t(3, 6, "Marcus", "My Portuguese tutor says I am ready for short conversations"),
      t(3, 7, "Elena", "The tandem bicycle sounds fun, can three people ride it"),
      t(3, 8, "Marcus", "Only two, but you are welcome to try the front seat"),
      t(4, 1, "Elena", "I visited the glacier again and reached the upper ridge this time"),
      t(4, 2, "Marcus", "Our quartet performed at the spring festival in the park"),
      t(4, 3, "Elena", "The ridge view was even better than the ice caves"),
      t(4, 4, "Marcus", "The festival crowd asked for an encore twice"),
      t(4, 5, "Elena", "Kiwi greeted me with a whistle when I returned"),
      t(4, 6, "Marcus", "Dario should hear about the festival, is he still at the lab", Seq("dario")),
      t(4, 7, "Elena", "Yes, though he keeps talking about moving to a field station"),
      t(4, 8, "Marcus", "Tell him the quartet sends greetings"),
      t(4, 9, "Elena", "I left the map bureau job and now guide mountain trails full time"),
      t(5, 1, "Elena", "I started a sourdough baking course at the mill bakery"),
      t(5, 2, "Marcus", "Fresh bread beats anything from the shop"),
      t(5, 3, "Elena", "Dario moved to the coastal research station at Skagen this week", Seq("dario")),
      t(5, 4, "Marcus", "A research station by the sea suits a marine biologist"),
      t(5, 5, "Elena", "The baking course teaches us lamination next"),
      t(5, 6, "Marcus", "I can finally order coffee in Portuguese without pausing"),
      t(5, 7, "Elena", "Kiwi tried to steal a piece of my practice loaf"),
      t(5, 8, "Marcus", "Your parrot has excellent taste"),
      // appended in round 6 (higher idx keeps earlier dialog ids stable):
      // knowledge-update new-fact turn — supersedes D1:1:8
      t(5, 9, "Marcus", "The quartet moved rehearsals to Monday nights for the summer"))
  }

  // Conversation 2: Priya & Tomas. Planted facts: ceramics studio (S1),
  // Valencia marathon training (S1) -> finished (S3) -> trail race planning
  // (S5), mentor Ingrid (S1) -> gallery exhibit (S2) -> handbook (S4),
  // kiln firings (S3 test batch, S5 celadon vases — the recent one).
  private def conv2: Seq[Turn] = {
    def t(s: Int, i: Int, sp: String, tx: String, e: Seq[String] = Nil) =
      Turn(2, s, i, sp, tx, e)
    Seq(
      t(1, 1, "Priya", "I opened a small ceramics studio near the old market"),
      t(1, 2, "Tomas", "I am training for the Valencia marathon this spring"),
      t(1, 3, "Priya", "My mentor Ingrid taught me everything about glazing", Seq("ingrid")),
      t(1, 4, "Tomas", "Running before sunrise is the only quiet time I get"),
      t(1, 5, "Priya", "The studio kiln takes a full day to reach temperature"),
      t(1, 6, "Tomas", "Ingrid sounds like a demanding teacher", Seq("ingrid")),
      t(1, 7, "Priya", "Demanding but generous with her secrets"),
      t(1, 8, "Tomas", "My training plan has me at forty kilometers a week"),
      t(1, 9, "Tomas", "I live in Porto in a small flat near the river"),
      t(2, 1, "Tomas", "I ran a half marathon along the coast road as practice"),
      t(2, 2, "Priya", "I hosted a glazing workshop for six students"),
      t(2, 3, "Tomas", "Ingrid exhibited her porcelain at the harbor gallery last month", Seq("ingrid")),
      t(2, 4, "Priya", "Her porcelain glows like moonlight, I saw the opening night"),
      t(2, 5, "Tomas", "The coast road race gave me confidence for Valencia"),
      t(2, 6, "Priya", "The workshop students fired their first bowls today"),
      t(2, 7, "Tomas", "My knees survived, which counts as victory"),
      t(2, 8, "Priya", "Victory laps in a ceramics studio are slow affairs"),
      t(3, 1, "Tomas", "I finished the Valencia marathon in just under four hours"),
      t(3, 2, "Priya", "I installed a new gas kiln at the studio this week"),
      t(3, 3, "Tomas", "The marathon crowd carried me through the final stretch"),
      t(3, 4, "Priya", "The new kiln fires hotter and more evenly than the old one"),
      t(3, 5, "Tomas", "I may never walk down stairs normally again"),
      t(3, 6, "Priya", "Soak your legs and eat something rich"),
      t(3, 7, "Tomas", "Valencia was worth every blister"),
      t(3, 8, "Priya", "I glazed a test batch in the new kiln yesterday"),
      t(4, 1, "Priya", "The studio now offers evening classes twice a week"),
      t(4, 2, "Tomas", "Ingrid published a handbook on crystalline glazes this spring", Seq("ingrid")),
      t(4, 3, "Priya", "I preordered the handbook for all my students"),
      t(4, 4, "Tomas", "I started light jogging again, nothing serious"),
      t(4, 5, "Priya", "The evening classes filled up within a day"),
      t(4, 6, "Tomas", "Maybe I will sign up for clay instead of running"),
      t(4, 7, "Priya", "Clay is kinder to the knees"),
      t(4, 8, "Tomas", "My physiotherapist would agree"),
      t(4, 9, "Tomas", "I moved to a flat in Valencia to be close to the coast"),
      t(5, 1, "Priya", "I fired a batch of celadon vases in the kiln this morning"),
      t(5, 2, "Tomas", "I am planning a trail race in the autumn hills"),
      t(5, 3, "Priya", "The celadon came out with a perfect crackle"),
      t(5, 4, "Tomas", "Trail running needs new shoes and new courage"),
      t(5, 5, "Priya", "Ingrid visited the studio and approved of the vases", Seq("ingrid")),
      t(5, 6, "Tomas", "High praise from the master"),
      t(5, 7, "Priya", "She rarely approves of anything on the first look"),
      t(5, 8, "Tomas", "Then the vases must truly shine"),
      // appended in round 6: knowledge-update new-fact turns —
      // supersede D2:1:8 and D2:4:1 respectively
      t(5, 9, "Tomas", "My new training plan is sixty kilometers a week for the trail race"),
      t(5, 10, "Priya", "The evening classes now run three times a week after demand grew"))
  }

  // Conversation 3: Aiko & Ben. Planted facts: 1890 telescope restoration
  // (S3), honey harvests (S2 first, S4 last), cousin Mirela (S1) -> bakery
  // (S2), workshop on Castle Lane (S1) -> moved to Mill Street (S4).
  private def conv3: Seq[Turn] = {
    def t(s: Int, i: Int, sp: String, tx: String, e: Seq[String] = Nil) =
      Turn(3, s, i, sp, tx, e)
    Seq(
      t(1, 1, "Aiko", "I restore antique telescopes in my little workshop"),
      t(1, 2, "Ben", "I keep three beehives on the rooftop of my building"),
      t(1, 3, "Aiko", "My cousin Mirela moved back to town this winter", Seq("mirela")),
      t(1, 4, "Ben", "Rooftop bees are calmer than people expect"),
      t(1, 5, "Aiko", "Telescope restoration takes patience and steady hands"),
      t(1, 6, "Ben", "I would love to look through one of your telescopes"),
      t(1, 7, "Aiko", "Come by the workshop when the big refractor is done"),
      t(1, 8, "Ben", "Deal, I will bring honey when the hives produce"),
      t(1, 9, "Aiko", "My workshop sits on Castle Lane near the clock tower"),
      t(2, 1, "Ben", "The hives produced their first honey harvest this week"),
      t(2, 2, "Aiko", "I spent the weekend polishing telescope lenses"),
      t(2, 3, "Aiko", "Mirela opened a bakery on Harbor Street", Seq("mirela")),
      t(2, 4, "Ben", "A bakery next to the harbor sounds perfect"),
      t(2, 5, "Aiko", "Her cinnamon knots sold out on opening day"),
      t(2, 6, "Ben", "I will trade honey for cinnamon knots"),
      t(2, 7, "Aiko", "The lens polishing jig needs a new belt"),
      t(2, 8, "Ben", "Check the hardware stall at the market"),
      t(3, 1, "Aiko", "I finished restoring a brass telescope built in 1890"),
      t(3, 2, "Ben", "An instrument from 1890, that is remarkable"),
      t(3, 3, "Aiko", "The 1890 refractor needed a completely new mount"),
      t(3, 4, "Ben", "The bees are quiet, winter stores are holding"),
      t(3, 5, "Aiko", "Mirela's bakery added a second oven already", Seq("mirela")),
      t(3, 6, "Ben", "Success smells like fresh bread and honey"),
      t(3, 7, "Aiko", "Next project is a pocket sextant from the thirties"),
      t(3, 8, "Ben", "Your workshop must look like a museum"),
      t(4, 1, "Ben", "I harvested honey from all three hives this morning"),
      t(4, 2, "Aiko", "The sextant restoration is halfway done"),
      t(4, 3, "Ben", "This harvest filled twice as many jars as the first"),
      t(4, 4, "Aiko", "Save me a jar for the workshop shelf"),
      t(4, 5, "Ben", "The rooftop garden helps the bees thrive"),
      t(4, 6, "Aiko", "Mirela wants honey for her bakery glazes", Seq("mirela")),
      t(4, 7, "Ben", "A bakery and an apiary make natural partners"),
      t(4, 8, "Aiko", "I will deliver a jar when I visit her"),
      t(4, 9, "Aiko", "I moved the workshop to Mill Street for better light"),
      t(5, 1, "Aiko", "The pocket sextant is finished and calibrated"),
      t(5, 2, "Ben", "I am building two more hives for spring"),
      t(5, 3, "Aiko", "The workshop window display now shows the 1890 telescope"),
      t(5, 4, "Ben", "The new hives should be ready before summer"),
      t(5, 5, "Aiko", "Mirela's bakery started weekend baking classes", Seq("mirela")),
      t(5, 6, "Ben", "Maybe I will learn to bake at last"),
      t(5, 7, "Aiko", "Bring honey to class and you will be popular"),
      t(5, 8, "Ben", "Strategy accepted"),
      // appended in round 6: knowledge-update new-fact turns —
      // supersede D3:1:2 and D3:2:3 respectively
      t(5, 9, "Ben", "With the new builds done I now keep five hives on the rooftop"),
      t(5, 10, "Aiko", "Mirela moved the bakery to the old mill for more oven space", Seq("mirela")))
  }

  def turns: Seq[Turn] = conv1 ++ conv2 ++ conv3

  /** The 61 questions across three conversations — single 25 / temporal 14
    * / multihop 12 / update 10 (every category >= 10; the single-heavy skew
    * mirrors the reference mini tier's 114:63:43
    * single:temporal:multihop category counts,
    * `benchmarks/EXPERIMENT_LOG.md:172`). Question wording is part of
    * the fixture: temporal questions carry a reference-grade temporal-intent keyword
    * (`recently` — `automem/utils/time.py:10-17`; bare `last` is intent
    * only in the harness's own keyword list, not the engine's) so `recencyBias = "auto"` fires for them and ONLY
    * them — which also means non-temporal questions must avoid every
    * harness keyword ("last", "when", "after", ...); multi-hop questions
    * name the speaker possessively so both query entity extraction and the
    * speaker-tag secondary search engage.
    */
  def questions: Seq[Question] = Seq(
    // ---- single-hop (25): one evidence dialog, direct fact retrieval
    Question("single", 1, "What instrument does Marcus play in the quartet?",
      Seq("D1:1:3")),
    Question("single", 1, "What is the name of Elena's parrot?", Seq("D1:1:1")),
    Question("single", 2, "Which city marathon was Tomas training for?",
      Seq("D2:1:2")),
    Question("single", 2, "What did Priya open near the old market?",
      Seq("D2:1:1")),
    Question("single", 3, "What was Aiko restoring that was built in 1890?",
      Seq("D3:3:1")),
    Question("single", 1, "What does Elena's neighbor practice at odd hours?",
      Seq("D1:1:4")),
    Question("single", 1, "What did Marcus buy for weekend rides?",
      Seq("D1:3:1")),
    Question("single", 1, "Which language is Marcus learning with a tutor?",
      Seq("D1:2:3")),
    Question("single", 1, "Which composer is the quartet preparing a program of?",
      Seq("D1:3:4")),
    Question("single", 1, "What course did Elena start at the mill bakery?",
      Seq("D1:5:1")),
    Question("single", 1, "What tune did Kiwi learn to whistle?",
      Seq("D1:3:2")),
    Question("single", 1, "What did Elena hike at the Vatnajokull glacier?",
      Seq("D1:2:1")),
    Question("single", 2, "Who taught Priya everything about glazing?",
      Seq("D2:1:3")),
    Question("single", 2, "How many students attended Priya's glazing workshop?",
      Seq("D2:2:2")),
    Question("single", 2, "What finishing result did Tomas achieve at the Valencia marathon?",
      Seq("D2:3:1")),
    Question("single", 2, "Where did Tomas run a half marathon as practice?",
      Seq("D2:2:1")),
    Question("single", 2, "What did Priya glaze in the new kiln?",
      Seq("D2:3:8")),
    Question("single", 2, "What came out of the kiln with a perfect crackle?",
      Seq("D2:5:3")),
    Question("single", 2, "What does Priya say is kinder to the knees?",
      Seq("D2:4:7")),
    Question("single", 3, "What did Ben promise to bring once the hives produce?",
      Seq("D3:1:8")),
    Question("single", 3, "What sold out on the bakery's opening day?",
      Seq("D3:2:5")),
    Question("single", 3, "What needs a new belt in Aiko's workshop?",
      Seq("D3:2:7")),
    Question("single", 3, "What did the 1890 refractor need?",
      Seq("D3:3:3")),
    Question("single", 3, "Which telescope is in the workshop window display?",
      Seq("D3:5:3")),
    Question("single", 3, "What project from the thirties is Aiko planning?",
      Seq("D3:3:7")),
    // ---- temporal (14): repeated-topic facts where the LATEST event is
    // the answer; "recently" carries engine-grade temporal intent
    Question("temporal", 1, "When did Elena most recently visit the glacier?",
      Seq("D1:4:1")),
    Question("temporal", 1, "What did the quartet do recently?", Seq("D1:4:2")),
    Question("temporal", 2, "When did Tomas most recently run a race?", Seq("D2:3:1")),
    Question("temporal", 2, "What did Priya fire in the kiln recently?",
      Seq("D2:5:1")),
    Question("temporal", 3, "When did Ben most recently harvest honey?", Seq("D3:4:1")),
    Question("temporal", 1, "What did Kiwi do recently?", Seq("D1:5:7")),
    Question("temporal", 1, "What did Marcus say about Portuguese recently?",
      Seq("D1:5:6")),
    Question("temporal", 1, "What did the quartet crowd ask for recently?",
      Seq("D1:4:4")),
    Question("temporal", 2, "What did Ingrid do recently?", Seq("D2:5:5")),
    Question("temporal", 2, "What race did Tomas plan recently?", Seq("D2:5:2")),
    Question("temporal", 2, "What did Priya install at the studio recently?",
      Seq("D2:3:2")),
    Question("temporal", 3, "What did Mirela's bakery add recently?",
      Seq("D3:3:5")),
    Question("temporal", 3, "What did Aiko finish restoring recently?",
      Seq("D3:5:1")),
    Question("temporal", 3, "What did Ben build recently for spring?",
      Seq("D3:5:2")),
    // ---- multi-hop (12): 2+ evidence dialogs bridged by a named third
    // party; possessive speaker wording engages the secondary tag search
    Question("multihop", 1, "What job does Elena's brother have?",
      Seq("D1:1:5", "D1:2:4")),
    Question("multihop", 1, "Where does Elena's brother work?",
      Seq("D1:1:5", "D1:5:3")),
    Question("multihop", 2, "What did Priya's mentor publish?",
      Seq("D2:1:3", "D2:4:2")),
    Question("multihop", 2, "Where did Priya's mentor exhibit her porcelain?",
      Seq("D2:1:3", "D2:2:3")),
    Question("multihop", 3, "What did Aiko's cousin open?",
      Seq("D3:1:3", "D3:2:3")),
    Question("multihop", 1, "Where does Elena's brother keep talking about moving to?",
      Seq("D1:1:5", "D1:4:7")),
    Question("multihop", 1, "What did Elena's brother send photos from?",
      Seq("D1:1:5", "D1:3:5")),
    Question("multihop", 1, "Where did Marcus run into Elena's brother?",
      Seq("D1:1:5", "D1:2:4")),
    Question("multihop", 2, "What did Priya's mentor approve of on her visit?",
      Seq("D2:1:3", "D2:5:5")),
    Question("multihop", 3, "What did Aiko's cousin add to the bakery?",
      Seq("D3:1:3", "D3:3:5")),
    Question("multihop", 3, "What does Aiko's cousin want honey for?",
      Seq("D3:1:3", "D3:4:6")),
    Question("multihop", 3, "What classes did Aiko's cousin start at the bakery?",
      Seq("D3:1:3", "D3:5:5")),
    // ---- knowledge-update (10; the LongMemEval category the reference's
    // second conversational benchmark adds, `tests/benchmarks/longmemeval/
    // test_longmemeval.py`): a later session supersedes an earlier fact;
    // the harness answers them with stateMode="current", so the J4
    // supersession walk must surface the NEW dialog and suppress the old
    Question("update", 1, "What job does Elena do for a living?",
      Seq("D1:4:9")),
    Question("update", 2, "Which city does Tomas live in?", Seq("D2:4:9")),
    Question("update", 3, "Which street is Aiko's workshop on?",
      Seq("D3:4:9")),
    Question("update", 1, "Which night does the quartet rehearse?",
      Seq("D1:5:9")),
    Question("update", 1, "Where does Dario work these days?",
      Seq("D1:5:3")),
    Question("update", 2, "How many kilometers a week does Tomas train?",
      Seq("D2:5:9")),
    Question("update", 2, "How often do the studio evening classes run?",
      Seq("D2:5:10")),
    Question("update", 2, "What kiln does Priya's studio use?",
      Seq("D2:3:2")),
    Question("update", 3, "How many beehives does Ben keep?",
      Seq("D3:5:9")),
    Question("update", 3, "Where is Mirela's bakery located?",
      Seq("D3:5:10")))

  /** Superseded facts, old dialog -> new dialog (`EVOLVED_INTO` is the
    * supersession relation the current-state walk follows, Schema
    * .SupersessionRelations). In the reference these edges come from the
    * enrichment/consolidation pass; the fixture declares them directly.
    */
  val Supersessions: Seq[(String, String)] = Seq(
    "D1:1:9" -> "D1:4:9", // Elena: map bureau -> mountain-trail guide
    "D2:1:9" -> "D2:4:9", // Tomas: Porto flat -> Valencia flat
    "D3:1:9" -> "D3:4:9", // Aiko: Castle Lane workshop -> Mill Street
    "D1:1:8" -> "D1:5:9", // quartet: Thursday rehearsals -> Monday nights
    "D1:2:4" -> "D1:5:3", // Dario: aquarium lab -> Skagen research station
    "D2:1:8" -> "D2:5:9", // Tomas: 40 km/week plan -> 60 km/week
    "D2:4:1" -> "D2:5:10", // classes: twice a week -> three times a week
    "D2:1:5" -> "D2:3:2", // studio kiln: slow old kiln -> new gas kiln
    "D3:1:2" -> "D3:5:9", // Ben: three hives -> five hives
    "D3:2:3" -> "D3:5:10") // Mirela's bakery: Harbor Street -> old mill

  def edges(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Supersessions.map { case (old, nu) =>
      val turn = turns.find(_.dialogId == nu).get
      val ts = new Timestamp(
        SessionStart((turn.conv, turn.session)).getTime + turn.idx * 60000L)
      graft.domain.Edge(old, nu, "EVOLVED_INTO", Some(1.0), None, None, None,
        None, None, None, ts)
    }.toDF()
  }

  /** Ingest the conversations through the real batch-store transform
    * ([[Ingest.prepare]]), one memory per utterance with the reference's tag
    * and metadata shape (`test_locomo.py:351-387`): content "Speaker: text",
    * tags locomo-test / conversation:<id> / session:<n> / speaker:<name>
    * (+ enrichment-style entity:people:<slug> tags for named third
    * parties), dialog-id + session-datetime metadata, importance 0.5.
    */
  def memories(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = turns.map { u =>
      val start = SessionStart((u.conv, u.session))
      val ts = new Timestamp(start.getTime + u.idx * 60000L)
      val tags = Seq("locomo-test", s"conversation:conv-${u.conv}",
        s"session:${u.session}", s"speaker:${u.speaker.toLowerCase}") ++
        u.entities.map(e => s"entity:people:$e")
      val sessionIso = start.toLocalDateTime.toString + "Z"
      val metadata =
        s"""{"source": "locomo_benchmark", "conversation_id": "conv-${u.conv}",
           | "session_id": "${u.session}", "dialog_id": "${u.dialogId}",
           | "speaker": "${u.speaker}", "session_datetime": "$sessionIso"}"""
          .stripMargin.replaceAll("\n", "")
      (u.dialogId, s"${u.speaker}: ${u.text}", tags, metadata, ts, 0.5, "Context")
    }
    Ingest.prepare(rows.toDF(
      "id", "content", "tags", "metadata", "timestamp", "importance", "type"))
  }

  /** Temporal-question detection, ported from `test_locomo.py:618-638`. */
  private val TemporalKeywords = Seq("when", "what time", "what date",
    "which year", "which month", "how long ago", "before", "after", "during",
    "since", "until", "first time", "last time", "recently", "previously",
    "last")

  def isTemporalQuestion(q: String): Boolean = {
    val lower = q.toLowerCase
    TemporalKeywords.exists(lower.contains)
  }

  /** Month/year hints appended to temporal queries
    * (`test_locomo.py:640-668`; the year pattern is the reference's
    * 2020-2025 window, kept verbatim).
    */
  def temporalHints(q: String): Seq[String] = {
    val lower = q.toLowerCase
    val months = Seq("january", "february", "march", "april", "may", "june",
      "july", "august", "september", "october", "november", "december")
      .filter(lower.contains)
    val years = "\\b(202[0-5])\\b".r.findAllIn(q).toSeq
    months ++ years
  }

  /** Speaker-name extraction from a question
    * (`test_locomo.py:523-596`): first capitalized mid-sentence
    * non-stopword word, with a possessive ("Elena's") fallback.
    */
  def speakerFromQuestion(q: String): Option[String] = {
    val stop = Recall.EntityStopwords
    val words = q.split("\\s+").filter(_.nonEmpty)
    val direct = words.zipWithIndex.collectFirst {
      case (w, i) if {
        val clean = w.replaceAll("[^\\w]", "")
        clean.length > 1 && !stop.contains(clean) &&
          !w.contains("'s") && !w.contains("\u2019s") &&
          clean.head.isUpper && clean.tail.forall(_.isLower) && i != 0
      } => w.replaceAll("[^\\w]", "")
    }
    direct.orElse(
      "\\b([A-Z][a-z]+)['\u2019]s\\b".r.findFirstMatchIn(q).map(_.group(1))
        .filterNot(stop.contains))
  }

  /** Answer one question through the full recall path with the reference
    * evaluator's parameterization (`test_locomo.py:730-820`): conversation
    * tag scope, category-dependent limit (multi-hop 100 / temporal 75 /
    * single 50), temporal hints appended, auto-decompose + entity expansion
    * for multi-hop, `recencyBias = "auto"` throughout (only temporal-intent
    * queries trigger it), plus the multi-hop speaker-tag secondary search
    * union. Returns the ranked dialog ids.
    */
  def answer(memories: DataFrame, edges: DataFrame, q: Question,
      weights: graft.domain.Scoring.Weights = graft.domain.Scoring.Weights())
      : Seq[String] = {
    val temporal = isTemporalQuestion(q.question)
    val multiHop = q.evidence.size > 1
    val query = (q.question +: (if (temporal) temporalHints(q.question) else Nil))
      .mkString(" ")
    val limit = if (multiHop) 100 else if (temporal) 75 else 50
    val req = RecallRequest(query = Some(query), limit = limit,
      tags = Seq(s"conversation:conv-${q.conv}"), tagMatch = "exact",
      autoDecompose = multiHop, expandEntities = multiHop,
      entityBridge = multiHop,
      recencyBias = "auto",
      stateMode = if (q.category == "update") "current" else "all",
      weights = weights,
      now = Now)
    var ids = Recall.recall(memories, edges, req)
      .select("id").collect().map(_.getString(0)).toSeq
    if (multiHop) speakerFromQuestion(q.question).foreach { sp =>
      val bySpeaker = Recall.recall(memories, edges, RecallRequest(
        query = None, limit = 50,
        tags = Seq(s"speaker:${sp.toLowerCase}", s"conversation:conv-${q.conv}"),
        tagMode = "all", tagMatch = "exact", now = Now))
        .select("id").collect().map(_.getString(0))
      ids = ids ++ bySpeaker.filterNot(ids.contains)
    }
    ids
  }

  /** Ranked ids per question index — the spec's golden input. Questions run
    * SEQUENTIALLY: a concurrent variant was measured barely faster (the
    * per-question cost is driver planning, which serializes on analyzer
    * locks) and produced one unreproduced golden flake — determinism of
    * the pinned goldens outranks the wall-clock. Instead the session is
    * tuned for the 129-row corpus while the questions run: AQE off (its
    * per-stage re-planning only pays off on real shuffles) and few shuffle
    * partitions — ~2x per question (tools.RecallProfile measurement).
    */
  def rankings(spark: SparkSession): Map[Int, Seq[String]] = {
    val mem = memories(spark).cache()
    mem.count()
    val es = edges(spark)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      questions.zipWithIndex.map { case (q, i) =>
        i -> answer(mem, es, q)
      }.toMap
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      mem.unpersist()
    }
  }
}
