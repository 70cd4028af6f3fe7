package graft

import java.sql.Timestamp

import graft.domain._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conversational-QA ingestion shape (FIXTURES.md §4, mirroring the
  * reference's LoCoMo/LongMemEval harness): one memory per utterance with
  * conversation/speaker tags and session metadata; questions are recall
  * requests scored by evidence-id recall@5.
  */
class ConversationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val now: Timestamp = Timestamp.valueOf("2026-01-10 00:00:00")

  case class Utterance(conv: Int, session: Int, speaker: String, text: String)
  case class Question(question: String, evidenceText: String)

  val conversations: Seq[Utterance] = Seq(
    Utterance(1, 1, "alice", "I adopted a golden retriever puppy named Biscuit last weekend"),
    Utterance(1, 1, "bob", "That sounds wonderful, how old is Biscuit?"),
    Utterance(1, 2, "alice", "Biscuit just turned four months and loves the beach"),
    Utterance(1, 2, "bob", "I started a pottery class on Tuesdays at the community center"),
    Utterance(2, 1, "carol", "My favorite framework for data work is definitely Spark"),
    Utterance(2, 1, "dave", "I moved to Lisbon in March for the new job"),
    Utterance(2, 2, "carol", "The Lisbon office has a great rooftop for demos"),
    Utterance(2, 2, "dave", "I presented our quarterly metrics dashboard on Friday"))

  val questions: Seq[Question] = Seq(
    Question("What pet did Alice adopt?", "golden retriever puppy named Biscuit"),
    Question("What class did Bob start?", "pottery class on Tuesdays"),
    Question("Where did Dave move?", "moved to Lisbon in March"),
    Question("What did Dave present?", "quarterly metrics dashboard"))

  test("conversational ingestion -> recall@5 over evidence utterances") {
    import spark.implicits._
    // ingest: one memory per utterance, tagged by conversation + speaker
    val raw = conversations.zipWithIndex.map { case (u, i) =>
      (u.text, Seq(s"conversation:conv-${u.conv}", s"speaker:${u.speaker}"),
        s"""{"session": ${u.session}, "speaker": "${u.speaker}"}""",
        Timestamp.valueOf(f"2026-01-0${u.session} 10:0$i:00"))
    }.toDF("content", "tags", "metadata", "timestamp")
    val memories = Ingest.prepare(raw)
    assert(memories.count() == conversations.size.toLong)
    val edges = Seq.empty[Edge].toDF()

    // each question must recall its evidence utterance in the top-5
    val hits = questions.count { q =>
      val top = Recall.recall(memories, edges,
        RecallRequest(query = Some(q.question), limit = 5, now = now))
        .select("content").collect().map(_.getString(0))
      top.exists(_.contains(q.evidenceText.split(" ").take(3).mkString(" ")))
    }
    assert(hits >= 3, s"recall@5 hit $hits/4 questions")

    // conversation scoping: tag filter restricts to one conversation
    val scoped = Recall.recall(memories, edges,
      RecallRequest(query = Some("what happened"),
        tags = Seq("conversation:conv-2"), tagMatch = "prefix",
        limit = 10, now = now))
    val tags = scoped.select("tags").collect()
      .flatMap(_.getSeq[String](0))
    assert(tags.nonEmpty && tags.filter(_.startsWith("conversation:"))
      .forall(_ == "conversation:conv-2"))
  }

  test("multi-hop QA: entity expansion bridges from the seed to the answer") {
    import spark.implicits._
    // the LoCoMo multi-hop shape: "What is Amanda's sister's career?" —
    // the seed names the sister, entity expansion surfaces her memory
    val raw = Seq(
      ("Amanda mentioned her sister is Rachel",
        Seq("conversation:conv-9", "entity:people:amanda", "entity:people:rachel")),
      ("Rachel works as a school counselor in Austin",
        Seq("conversation:conv-9", "entity:people:rachel")),
      ("Amanda enjoys rock climbing on weekends",
        Seq("conversation:conv-9", "entity:people:amanda")),
      ("Unrelated note about grocery shopping", Seq("conversation:conv-8")))
      .toDF("content", "tags")
    val memories = Ingest.prepare(raw)
    val edges = Seq.empty[Edge].toDF()
    val q = "What career does Amanda's sister have"
    // without expansion the answer utterance does not surface at limit=2
    val plain = Recall.recall(memories, edges,
      RecallRequest(query = Some(q), limit = 2, now = now))
      .select("content").collect().map(_.getString(0))
    val expanded = Recall.recall(memories, edges,
      RecallRequest(query = Some(q), limit = 2, expandEntities = true, now = now))
      .select("content", "match_type").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(expanded.exists { case (c, mt) =>
      c.contains("school counselor") && mt == "entity_expansion" },
      s"plain=${plain.toSeq}\nexpanded=${expanded.toSeq}")
  }
}
