package graft.tools

import java.sql.Timestamp

import graft.tools.LongMemEvalMini.{Question, Report, Turn}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic LongMemEval FULL-shaped tier (r17, VERDICT r16 item 6):
  * the mini fixture's 5-questions-per-type makes each per-type pin coarse
  * (one rank flip moves an MRR golden by 0.033, multi-session rests on 5
  * questions). This tier GENERATES 10 further conversations from a
  * parameterized template — every fact slot filled from pinned word
  * tables indexed by conversation, no RNG anywhere — yielding
  * **20 questions per type, 120 total** (vs the reference full tier's
  * 500; its published anchors, `benchmarks/EXPERIMENT_LOG.md:92-93`:
  * accuracy 87.00%, recall@5 97.00%). Scoring machinery is
  * [[LongMemEvalMini]]'s own (`memoriesFor` / `scoredRankingsOver` /
  * `reportOver`), so metric definitions cannot drift between tiers.
  *
  * Template per conversation (4 sessions, 27 turns): two
  * single-session-user facts, two assistant recommendations, two
  * multi-session arcs (a race: signup session 1 → finish session 4; a
  * build project: start session 2 → done session 4), two dated events
  * (trip booking, pet adoption), two knowledge updates (training club
  * and cafe order, stale value session 1 → revision session 3 — the
  * stale row is a planted distractor recency bias must beat), and
  * confuser turns sharing each fact's vocabulary so rankings stay
  * sensitive. Abstention questions ask about per-conversation topics
  * that are never planted.
  *
  * The mini tier stays the bench headline (its ~1 min wall clock is the
  * budget); this tier is spec-gated (LongMemEvalFullSpec) with its own
  * goldens.
  */
object LongMemEvalFull {

  /** Conversations 11..20 — disjoint from the mini tier's 1..3. */
  val NumConvs = 10
  private val ConvBase = 11

  // ---- pinned slot tables, one entry per conversation -------------------
  private val allergens = Seq("shellfish", "walnuts", "sesame", "soy",
    "eggs", "dairy", "kiwi", "mustard", "celery", "almonds")
  private val dishes = Seq("paella", "brownie", "bagel", "tofu", "quiche",
    "gelato", "pavlova", "pretzel", "chowder", "torte")
  private val drinks1 = Seq("vanilla latte", "ginger tea", "mocha",
    "chai latte", "cold brew", "matcha latte", "hot chocolate",
    "fresh lemonade", "iced tea", "oat cappuccino")
  private val drinks2 = Seq("plain espresso", "green tea", "americano",
    "black coffee", "herbal tea", "sparkling water", "macchiato",
    "cortado", "filter coffee", "mint tea")
  private val gyms1 = Seq("StoneGate", "PeakForm", "IronBay", "NorthFit",
    "CoreHouse", "RapidRow", "SummitGym", "DeltaFit", "ForgeClub",
    "AtlasRoom")
  private val gyms2 = Seq("HarborFit", "WestWorks", "PulsePoint",
    "GraniteGym", "EmberFit", "TrueForm", "NovaClub", "ZenithFit",
    "OakHouse", "PrimeRow")
  private val streets = Seq("cedar", "willow", "juniper", "spruce",
    "chestnut", "aspen", "poplar", "linden", "rowan", "alder")
  private val restaurants = Seq("Blue Anchor", "Copper Pot", "Old Mill",
    "Red Lantern", "Green Fern", "Stone Bridge", "Amber Door",
    "Silver Spoon", "Quiet Corner", "Brave Fox")
  private val races = Seq("valley trail race", "bridge loop run",
    "forest relay", "city night run", "lakeside half marathon",
    "canyon dash", "meadow sprint series", "coastal dune run",
    "winter fell race", "sunrise track mile")
  private val finishTimes = Seq("two hours ten minutes",
    "fifty two minutes", "three hours flat", "one hour five minutes",
    "two hours one minute", "forty nine minutes", "ninety minutes",
    "one hour forty minutes", "two hours thirty minutes",
    "six minutes ten seconds")
  private val activities = Seq("yoga", "spin", "pilates", "boxing",
    "rowing", "climbing", "fencing", "karate", "squash", "badminton")
  private val classTimes = Seq("seven thirty", "six fifteen",
    "eight sharp", "noon", "five forty", "nine thirty", "six fifty",
    "seven ten", "eight twenty", "five fifteen")
  private val weekdays = Seq("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday")
  private val cities = Seq("Oslo", "Madrid", "Prague", "Vienna", "Dublin",
    "Athens", "Porto", "Krakow", "Zagreb", "Tallinn")
  private val tripMonths = Seq("February", "January", "March", "February",
    "January", "March", "February", "January", "March", "February")
  private val things = Seq("bookshelf", "terrarium", "quilt", "birdhouse",
    "spice rack", "reading bench", "plant stand", "coffee table",
    "window seat", "tool chest")
  private val problems = Seq("flaky wifi", "squeaky door",
    "overflowing inbox", "drafty window", "slow laptop",
    "tangled cables", "noisy fridge", "dim balcony light",
    "sticky drawer", "leaky faucet")
  private val fixes = Seq("moving the router to the hallway",
    "waxing the hinges", "three simple folder rules",
    "a foam seal strip", "clearing the startup list",
    "velcro ties under the desk", "leveling the front feet",
    "a warmer led bulb", "paraffin on the runners",
    "a new rubber washer")
  private val pets = Seq("beagle", "parrot", "gecko", "hamster", "corgi",
    "ferret", "rabbit", "turtle", "canary", "kitten")
  private val petMonths = Seq("March", "April", "February", "May",
    "January", "June", "March", "April", "February", "May")
  private val absTopics1 = Seq("dentist", "piano teacher", "accountant",
    "barber", "landlord", "chess partner", "driving instructor",
    "optician", "tailor", "plumber")
  private val absTopics2 = Seq("florist", "mechanic", "notary",
    "babysitter", "swim coach", "electrician", "beekeeper", "locksmith",
    "archery coach", "violin tuner")

  /** Session start times: staggered per conversation, fixed offsets —
    * all before [[LongMemEvalMini.Now]] (2026-06-15).
    */
  def sessionStart(conv: Int, session: Int): Timestamp = {
    val c = conv - ConvBase
    val base = Timestamp.valueOf("2026-01-06 09:00:00").getTime
    val dayMs = 86400000L
    val sessionOffsetDays = Seq(0L, 21L, 49L, 84L)(session - 1)
    val hourMs = Seq(0L, 5L, 2L, 7L)(session - 1) * 3600000L
    new Timestamp(base + c * 2L * dayMs + sessionOffsetDays * dayMs + hourMs)
  }

  /** The generated turns: 27 per conversation, 270 total. */
  def turns: Seq[Turn] = (0 until NumConvs).flatMap { c =>
    val conv = ConvBase + c
    def t(s: Int, i: Int, r: String, tx: String) = Turn(conv, s, i, r, tx)
    Seq(
      // session 1: allergy, stale club + cafe order, recommendation,
      // race signup, class schedule
      t(1, 1, "user", s"I am allergic to ${allergens(c)} so most " +
        s"${dishes(c)} dishes are off the table for me"),
      t(1, 2, "assistant", s"Noted, I will keep ${dishes(c)} suggestions " +
        s"light on ${allergens(c)}"),
      t(1, 3, "user", s"My usual order at the cafe is a ${drinks1(c)}"),
      t(1, 4, "user", s"I train at the ${gyms1(c)} club on " +
        s"${streets(c)} street these days"),
      t(1, 5, "assistant", s"For a ${allergens(c)} free dinner I " +
        s"recommend the ${restaurants(c)} on ${streets((c + 3) % 10)} street"),
      t(1, 6, "user", s"I signed up for the ${races(c)} yesterday morning"),
      t(1, 7, "assistant", s"A steady build of weekly distance will have " +
        s"you ready for the ${races(c)}"),
      t(1, 8, "user", s"My weekly ${activities(c)} class is at " +
        s"${classTimes(c)} every ${weekdays(c)}"),
      // session 2: trip booking, build project start, assistant tip,
      // pet adoption
      t(2, 1, "user", s"I booked a trip to ${cities(c)} in " +
        s"${tripMonths(c)} for later this year"),
      t(2, 2, "assistant", s"${cities(c)} is lovely, the old town market " +
        "is worth a slow morning"),
      t(2, 3, "user", s"I started building a ${things(c)} for the " +
        "spare room"),
      t(2, 4, "assistant", s"For the ${problems(c)} try ${fixes(c)} " +
        "before anything drastic"),
      t(2, 5, "user", s"The ${problems(c)} got better after one week " +
        "of that"),
      t(2, 6, "user", s"I adopted a ${pets(c)} in early ${petMonths(c)}"),
      t(2, 7, "assistant", s"A ${pets(c)} settles faster with a fixed " +
        "feeding routine"),
      // session 3: both knowledge updates + project/racing confusers
      t(3, 1, "user", s"I now train at the ${gyms2(c)} club near the " +
        "park after switching this week"),
      t(3, 2, "assistant", s"${gyms2(c)} has better morning hours, " +
        "good pick"),
      t(3, 3, "user", s"My cafe order is now a ${drinks2(c)}, " +
        "trying to cut back"),
      t(3, 4, "user", s"The ${things(c)} build hit a snag with the " +
        "corner joints"),
      t(3, 5, "assistant", s"Clamp the corner joints overnight and the " +
        s"${things(c)} frame will hold"),
      t(3, 6, "user", s"Training for the ${races(c)} is up to long " +
        "weekend sessions now"),
      // session 4: race finish, project done, trip/pet confusers
      t(4, 1, "user", s"I finished the ${races(c)} in ${finishTimes(c)}"),
      t(4, 2, "assistant", "Strong result, recovery walks this week " +
        "will pay off"),
      t(4, 3, "user", s"The ${things(c)} is finally done and standing " +
        "in the spare room"),
      t(4, 4, "assistant", s"Nice work, a coat of oil will keep the " +
        s"${things(c)} sharp looking"),
      t(4, 5, "user", s"${cities(c)} packing list is started, the trip " +
        "is close now"),
      t(4, 6, "user", s"The ${pets(c)} learned to come when called"))
  }

  /** 120 questions: 20 per type (2 per type per conversation). */
  def questions: Seq[Question] = (0 until NumConvs).flatMap { c =>
    val conv = ConvBase + c
    def ev(s: Int, i: Int) = s"L$conv:$s:$i"
    Seq(
      Question(s"f${conv}_ssu1", "single-session-user", conv,
        s"Is the user allergic to ${allergens(c)}?", Seq(ev(1, 1))),
      Question(s"f${conv}_ssu2", "single-session-user", conv,
        s"What time is the user's weekly ${activities(c)} class?",
        Seq(ev(1, 8))),
      Question(s"f${conv}_ssa1", "single-session-assistant", conv,
        s"Which restaurant did the assistant recommend for a " +
          s"${allergens(c)} free dinner?", Seq(ev(1, 5))),
      Question(s"f${conv}_ssa2", "single-session-assistant", conv,
        s"What did the assistant suggest trying for the ${problems(c)}?",
        Seq(ev(2, 4))),
      Question(s"f${conv}_ms1", "multi-session", conv,
        s"Tell me about the user signing up for and finishing the " +
          s"${races(c)}", Seq(ev(1, 6), ev(4, 1))),
      Question(s"f${conv}_ms2", "multi-session", conv,
        s"What happened with the ${things(c)} the user started building?",
        Seq(ev(2, 3), ev(4, 3))),
      Question(s"f${conv}_tr1", "temporal-reasoning", conv,
        s"When did the user book the trip to ${cities(c)}?", Seq(ev(2, 1))),
      Question(s"f${conv}_tr2", "temporal-reasoning", conv,
        s"When did the user adopt the ${pets(c)}?", Seq(ev(2, 6))),
      Question(s"f${conv}_ku1", "knowledge-update", conv,
        "Which club does the user train at?", Seq(ev(3, 1))),
      Question(s"f${conv}_ku2", "knowledge-update", conv,
        "What is the user's cafe order?", Seq(ev(3, 3))),
      // abstention questions must avoid the word "user": every stored
      // turn is "user:"/"assistant:"-prefixed, so that token alone
      // keyword-matches most of the corpus and lifts the abstention
      // top-1 above the answerable floor (measured 0.498 vs 0.429 —
      // separation broken; the mini tier's abstention phrasing avoids
      // the word for the same reason)
      Question(s"f${conv}_abs1_abs", "abstention", conv,
        s"What is the name of the ${absTopics1(c)}?", Nil),
      Question(s"f${conv}_abs2_abs", "abstention", conv,
        s"What is the ${absTopics2(c)}'s first name?", Nil))
  }

  /** The stale-distractor turn each knowledge-update question must beat
    * (spec-asserted like the mini tier's).
    */
  def staleTwin(qid: String): String = {
    val conv = qid.stripPrefix("f").takeWhile(_.isDigit).toInt
    if (qid.endsWith("ku1")) s"L$conv:1:4" else s"L$conv:1:3"
  }

  def memories(spark: SparkSession): DataFrame =
    LongMemEvalMini.memoriesFor(spark, turns, sessionStart)

  def report(spark: SparkSession): Report = {
    val mem = memories(spark).cache()
    mem.count()
    try LongMemEvalMini.reportOver(
      LongMemEvalMini.scoredRankingsOver(spark, mem, questions), questions)
    finally mem.unpersist()
  }

  def rankings(spark: SparkSession): Map[Int, Seq[String]] = {
    val mem = memories(spark).cache()
    mem.count()
    try LongMemEvalMini.scoredRankingsOver(spark, mem, questions)
      .view.mapValues(_.map(_._1)).toMap
    finally mem.unpersist()
  }
}
