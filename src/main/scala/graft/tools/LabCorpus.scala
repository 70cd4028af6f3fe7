package graft.tools

import java.sql.Timestamp

import graft.domain.PlaceholderEmbedding
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic 10k-memory retrieval-quality corpus, the batch engine's
  * stand-in for the reference's Recall Quality Lab corpora (distractor shape
  * `/root/reference/scripts/lab/lab_corpus.py:45-76`; conversational QA
  * shape `tests/benchmarks/test_locomo.py` — per-question evidence ids
  * scored with recall@k / NDCG@10 / MRR, FIXTURES.md §4).
  *
  * Three difficulty bands make the metric goldens SENSITIVE (strictly
  * between 0 and 1 in every band), so a ranking regression in either
  * direction moves them:
  *  - easy: fresh, important evidence holds both unique question tokens
  *    adjacently (phrase bonus); always in the top-5, usually rank 1
  *    (hash-embedding vector noise occasionally interleaves above it —
  *    deterministic, part of the pinned golden).
  *  - medium: TWO evidence rows hold both tokens; 10 newer confusers hold
  *    one token each -> evidence leads, the second row sits near the
  *    confuser boundary.
  *  - hard: aged low-importance evidence holds the tokens apart (no phrase
  *    bonus) while 3 newer confusers hold them adjacently -> evidence ranks
  *    behind the confuser block, mostly outside the top-5 but inside the
  *    top-10; NDCG@10/MRR catch its exact position.
  * Question tokens end in a terminator letter (`zeta3z`, not `zeta3`) so
  * substring token matching cannot cross question boundaries (zeta3 would
  * be a substring of zeta30's tokens).
  *
  * All ages are relative to a fixed `now`, embeddings are the deterministic
  * placeholder hash — the corpus is bit-stable across runs and machines.
  */
object LabCorpus {

  val Now: Timestamp = Timestamp.valueOf("2026-06-01 00:00:00")
  val QuestionsPerBand = 20
  val NumQuestions: Int = QuestionsPerBand * 3

  case class Question(qid: Int, query: String, expectedIds: Seq[String])

  case class CorpusRow(
      id: String, content: String, timestamp: Timestamp, importance: Double,
      confidence: Double, `type`: String, tags: Seq[String], metadata: String,
      relevance_score: Double, archived: Boolean, embedding: Array[Float])

  private def daysAgo(days: Double): Timestamp =
    new Timestamp(Now.getTime - (days * 86400000L).toLong)

  private def row(id: String, content: String, ageDays: Double,
      importance: Double, tags: Seq[String] = Seq("work"),
      metadata: String = "{}"): CorpusRow =
    CorpusRow(id, content, daysAgo(ageDays), importance, 0.7, "Context",
      tags, metadata, 1.0, archived = false,
      PlaceholderEmbedding.embed(content))

  /** The 60 questions: two unique tokens each, band-dependent phrasing. */
  def questions: Seq[Question] = (0 until NumQuestions).map { q =>
    val (t1, t2) = (s"zeta${q}z", s"quasar${q}z")
    val band = q / QuestionsPerBand
    val expected =
      if (band == 1) Seq(s"ev-$q-0", s"ev-$q-1") else Seq(s"ev-$q-0")
    Question(q, s"$t1 $t2 deployment", expected)
  }

  /** Ids of the injected never-relevant rows (`lab_corpus.py:45-76`). */
  def distractorIds(nDistractors: Int): Set[String] =
    (0 until nDistractors).map(i => s"dist-$i").toSet

  /** Build the corpus as rows; `total` defaults to 10,000. */
  def rows(total: Int = 10000, nDistractors: Int = 2000): Seq[CorpusRow] = {
    val evidence = questions.flatMap { question =>
      val q = question.qid
      val (t1, t2) = (s"zeta${q}z", s"quasar${q}z")
      val band = q / QuestionsPerBand
      band match {
        case 0 => // easy: adjacent tokens, fresh, important, unique
          Seq(row(s"ev-$q-0",
            s"decision record: $t1 $t2 deployment pipeline approved",
            ageDays = 2, importance = 0.9))
        case 1 => // medium: two evidence rows; confusers added below
          Seq(
            row(s"ev-$q-0", s"meeting notes $t1 $t2 deployment window confirmed",
              ageDays = 8, importance = 0.75),
            row(s"ev-$q-1", s"follow-up summary $t1 $t2 rollout checklist",
              ageDays = 7, importance = 0.75))
        case _ => // hard: tokens separated (no phrase bonus), aged, faint
          Seq(row(s"ev-$q-0",
            s"archive item $t1 review of the older $t2 deployment attempt",
            ageDays = 60, importance = 0.35))
      }
    }
    val confusers = questions.flatMap { question =>
      val q = question.qid
      val t2 = s"quasar${q}z"
      val t1 = s"zeta${q}z"
      val band = q / QuestionsPerBand
      if (band == 1)
        (0 until 10).map(i => row(s"conf-$q-$i",
          s"status update $i mentioning $t2 in passing during standup",
          ageDays = 1, importance = 0.9))
      else if (band == 2)
        (0 until 3).map(i => row(s"conf-$q-$i",
          s"fresh recap $i of the $t1 $t2 deployment retro",
          ageDays = 2, importance = 0.9))
      else Nil
    }
    val distractors = (0 until nDistractors).map { i =>
      // lab_corpus.py:45-76 shape: aged, low-importance, tagged + flagged
      row(s"dist-$i",
        s"[lab-distractor #$i] stale unrelated note about miscellaneous topic $i; safe to forget.",
        ageDays = 180, importance = 0.05, tags = Seq("lab-distractor"),
        metadata = """{"lab_distractor": true}""")
    }
    val nFiller = total - evidence.size - confusers.size - distractors.size
    require(nFiller > 0, s"total=$total too small for the fixed bands")
    val vocab = Seq("pipeline", "review", "standup", "retro", "incident",
      "migration", "rollout", "oncall", "postmortem", "planning")
    val fillers = (0 until nFiller).map { i =>
      val w1 = vocab(i % vocab.size)
      val w2 = vocab((i / vocab.size) % vocab.size)
      row(s"fill-$i", s"routine $w1 note $i covering the weekly $w2 cycle",
        ageDays = (i % 120) + 1.0, importance = 0.2 + (i % 5) * 0.1)
    }
    evidence ++ confusers ++ distractors ++ fillers
  }

  def corpus(spark: SparkSession, total: Int = 10000,
      nDistractors: Int = 2000): DataFrame = {
    import spark.implicits._
    rows(total, nDistractors).toDF()
  }
}
