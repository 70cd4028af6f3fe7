package graft

import java.sql.Timestamp

import graft.domain._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Score golden-parity (SURVEY §7.3: "golden tests against recomputed values
  * are mandatory") and retrieval-quality (recall@k over a seeded corpus with
  * deterministic embeddings — the BASELINE.md functional gate for the recall
  * pipeline).
  */
class QualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  val now: Timestamp = ts("2026-01-10 00:00:00")

  def mkMem(id: String, content: String, t: String, tags: Seq[String],
      importance: Double, confidence: Double): Memory = {
    val tstamp = ts(t)
    Memory(id, content, tstamp, tstamp, None, tstamp, tstamp, importance,
      confidence, "Context", tags, Nil, "{}", None, enriched = false,
      processed = false, 1.0, archived = false, protected_flag = false,
      PlaceholderEmbedding.embed(content))
  }

  test("golden: 9-component final score matches hand-computed value") {
    import spark.implicits._
    val m = mkMem("g1", "postgres tuning guide", "2026-01-05 00:00:00",
      Seq("database", "postgres"), importance = 0.8, confidence = 0.6)
    val memories = Seq(m).toDF()
      .withColumn("tag_prefixes", graft.functions.TextFunctions.tagPrefixes(col("tags")))
    val req = RecallRequest(query = Some("postgres tuning"), limit = 5, now = now)
    val row = Recall.recall(memories, spark.emptyDataFrame
        .withColumn("src", lit("")).withColumn("dst", lit(""))
        .withColumn("rel_type", lit("")).withColumn("strength", lit(0.0))
        .withColumn("score", lit(0.0)).withColumn("confidence", lit(0.0))
        .withColumn("similarity", lit(0.0)).withColumn("count", lit(0L))
        .withColumn("updated_at", lit(now)).limit(0), req)
      .select("id", "final_score", "s_vector", "s_keyword", "s_tag", "s_recency")
      .head()

    // hand-computed expectation:
    val w = Scoring.Weights()
    val qvec = PlaceholderEmbedding.embed("postgres tuning")
    val sim = {
      val e = m.embedding
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      (0 until 64).foreach { i =>
        dot += e(i).toDouble * qvec(i); nx += e(i).toDouble * e(i)
        ny += qvec(i).toDouble * qvec(i)
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    // raw = content hits (2+2) + tag hit ("postgres" tag, +1) + phrase in
    // content (+2) = 7; theoretical max = 3*2 keywords + 3 phrase = 9
    val kw = 7.0 / 9.0
    val tag = 1.0 // both query tokens hit tags ("postgres") or... recompute below
    val tagExpected = {
      val toks = Seq("postgres", "tuning")
      toks.count(t => m.tags.contains(t)).toDouble / toks.length
    }
    val ageDays = (now.getTime - m.timestamp.getTime) / 86400000.0
    val recency = math.max(0.0, 1.0 - ageDays / 180.0)
    val expected = sim * w.vector + kw * w.keyword +
      // metadata channel: "{}" contains no keyword -> no metadata score
      0.0 * w.metadata + 0.0 * w.relation +
      tagExpected * w.tag + m.importance * w.importance +
      m.confidence * w.confidence + recency * w.recency + 0.0 * w.exact
    assert(math.abs(row.getAs[Double]("final_score") - expected) < 1e-9,
      s"got ${row.getAs[Double]("final_score")}, expected $expected " +
        s"(sim=$sim kw=$kw tag=$tagExpected rec=$recency)")
    assert(math.abs(row.getAs[Double]("s_vector") - sim) < 1e-9)
    assert(math.abs(row.getAs[Double]("s_keyword") - 7.0 / 9.0) < 1e-12)
  }

  test("context bonus: slash/colon tag canonicalization, metadata-term keywords") {
    import spark.implicits._
    val df = Seq((
      "m1", Seq("project/foo", "work"), "Decision",
      Seq("alpha", "rollout plan"))) // metadata term set
      .toDF("id", "tags", "type", "md_terms")
    def bonus(priorityTags: Seq[String] = Nil, priorityTypes: Seq[String] = Nil,
        contextKeywords: Seq[String] = Nil, priorityIds: Seq[String] = Nil): Double =
      df.select(Scoring.contextBonus(col("tags"), col("type"), col("md_terms"),
        col("id"), priorityTags, priorityTypes, contextKeywords, priorityIds)
        .as("b")).head().getDouble(0)
    // scoring.py:84-97: context tag project:foo must hit the project/foo tag
    assert(bonus(priorityTags = Seq("project:foo")) == 0.45)
    // and the slash-priority direction (test_context_tag_separator.py:19)
    assert(bonus(priorityTags = Seq("project/foo")) == 0.45)
    // prefix semantics: priority 'project:' hits too
    assert(bonus(priorityTags = Seq("project:")) == 0.45)
    assert(bonus(priorityTags = Seq("other:thing")) == 0.0)
    // scoring.py:125-127: keyword hit probes METADATA TERMS, not content
    assert(bonus(contextKeywords = Seq("alpha")) == 0.2)
    assert(bonus(contextKeywords = Seq("missing")) == 0.0)
    // type normalization via strip().title()
    assert(bonus(priorityTypes = Seq("Decision")) == 0.25)
    assert(bonus(priorityIds = Seq("m1")) == 0.9)
    assert(bonus(Seq("project:foo"), Seq("Decision"), Seq("alpha"), Seq("m1")) ==
      0.45 + 0.25 + 0.2 + 0.9)
  }

  test("golden: exact component is metadata-term membership, not raw-JSON substring") {
    import spark.implicits._
    // content/tags are chosen so both probe queries miss them entirely:
    // every score difference comes from the metadata term set alone.
    val base = Seq(("x1", "zzz qqq", ts("2026-01-05 00:00:00"), 0.8, 0.6,
      Seq.empty[String], """{"project": "alpha"}""", 1.0))
      .toDF("id", "content", "timestamp", "importance", "confidence",
        "tags", "metadata", "relevance_score")
      .withColumn("vector_score", lit(null).cast("double"))
      .withColumn("keyword_score", lit(null).cast("double"))
      .withColumn("metadata_score", lit(null).cast("double"))
    def scoreWith(q: String): Double =
      Recall.scoreCandidates(base, RecallRequest(query = Some(q), limit = 5,
        now = now), Some(q)).select("final_score").head().getDouble(0)
    val w = Scoring.Weights()
    val recency = math.max(0.0, 1.0 - (5.0 * 86400000 / 86400000.0) / 180.0)
    val floor = 0.8 * w.importance + 0.6 * w.confidence + recency * w.recency
    // 'project' appears ONLY as a JSON key: the old substring probe scored
    // exact=1.0 here; the reference term set (scoring.py:40-63 — values
    // and their tokens, keys never collected) says 0
    assert(math.abs(scoreWith("project") - floor) < 1e-9,
      s"query matching a JSON key must not fire exact: ${scoreWith("project")} vs $floor")
    // 'alpha' is a metadata VALUE term: exact fires, and the tag component
    // counts the token via the tags-or-metadata-terms set (scoring.py:150-158)
    val expectAlpha = floor + 1.0 * w.exact + 1.0 * w.tag
    assert(math.abs(scoreWith("alpha") - expectAlpha) < 1e-9,
      s"value-term query must fire exact+tag: ${scoreWith("alpha")} vs $expectAlpha")
    // cross-token-boundary substring ('pha be' inside 'alpha beta') must not fire
    val crossDf = base.withColumn("metadata", lit("""{"project": "alpha beta"}"""))
    val cross = Recall.scoreCandidates(crossDf, RecallRequest(
      query = Some("pha be"), limit = 5, now = now), Some("pha be"))
      .select("final_score").head().getDouble(0)
    assert(math.abs(cross - floor) < 1e-9,
      s"cross-boundary substring must not fire exact: $cross vs $floor")
  }

  test("golden: expanded candidate scores the full formula incl. relation component") {
    import spark.implicits._
    val seed = mkMem("s1", "postgres tuning guide", "2026-01-05 00:00:00",
      Seq("database", "postgres"), importance = 0.8, confidence = 0.6)
    val related = mkMem("r1", "weekly standup summary notes", "2026-01-03 00:00:00",
      Seq("noise"), importance = 0.4, confidence = 0.6)
    val memories = Seq(seed, related).toDF()
      .withColumn("tag_prefixes", graft.functions.TextFunctions.tagPrefixes(col("tags")))
    val edges = Seq(Edge("s1", "r1", "RELATES_TO", Some(0.8), None, None, None,
      None, None, None, ts("2026-01-05 00:00:00"))).toDF()

    val req = RecallRequest(query = Some("postgres tuning"), limit = 1,
      expandRelations = true, now = now)
    val rows = Recall.recall(memories, edges, req)
      .select("id", "final_score", "match_type").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(rows("r1")._2 == "relation")

    // hand-computed: relation_score = strength + 0.25 * max(seed_score, 0);
    // r1's full formula = 0.25*relation + 0.1*importance + 0.05*confidence
    // + 0.1*recency (vector/keyword/metadata/tag/exact all 0 for r1)
    val w = Scoring.Weights()
    val seedScore = rows("s1")._1
    val relationScore = 0.8 + 0.25 * math.max(seedScore, 0.0)
    val ageDays = (now.getTime - related.timestamp.getTime) / 86400000.0
    val recency = math.max(0.0, 1.0 - ageDays / 180.0)
    val expected = w.relation * relationScore + w.importance * 0.4 +
      w.confidence * 0.6 + w.recency * recency
    assert(math.abs(rows("r1")._1 - expected) < 1e-9,
      s"got ${rows("r1")._1}, expected $expected (seed=$seedScore)")
  }

  test("retrieval quality: recall@5 = 1.0 for exact-content queries on seeded corpus") {
    import spark.implicits._
    val targets = (0 until 10).map(i =>
      mkMem(s"t$i", s"unique target memory number $i about topic-$i details",
        f"2026-01-0${i % 9 + 1} 00:00:00", Seq(s"topic$i"), 0.5, 0.7))
    val distractors = (0 until 50).map(i =>
      mkMem(s"d$i", s"distractor filler text $i with unrelated words",
        "2026-01-02 00:00:00", Seq("noise"), 0.5, 0.7))
    val memories = (targets ++ distractors).toDF()
      .withColumn("tag_prefixes", graft.functions.TextFunctions.tagPrefixes(col("tags")))
    val edges = Seq.empty[Edge].toDF()

    val hits = targets.count { t =>
      val res = Recall.recall(memories, edges,
        RecallRequest(query = Some(t.content), limit = 5, now = now))
      res.select("id").collect().map(_.getString(0)).take(5).contains(t.id)
    }
    val recallAt5 = hits.toDouble / targets.size
    assert(recallAt5 == 1.0,
      s"recall@5 = $recallAt5 — exact-content vector match must rank in top-5")
  }

  test("retrieval quality: distractor rate@5 is low for tag-scoped queries") {
    import spark.implicits._
    val targets = (0 until 5).map(i =>
      mkMem(s"t$i", s"project report section $i", "2026-01-05 00:00:00",
        Seq("project:rpt"), 0.8, 0.7))
    val distractors = (0 until 40).map(i =>
      mkMem(s"d$i", s"noise item $i", "2026-01-06 00:00:00", Seq("noise"), 0.9, 0.7))
    val memories = (targets ++ distractors).toDF()
      .withColumn("tag_prefixes", graft.functions.TextFunctions.tagPrefixes(col("tags")))
    val res = Recall.recall(memories, Seq.empty[Edge].toDF(),
      RecallRequest(tags = Seq("project:rpt"), limit = 5, now = now))
    val got = res.select("id").collect().map(_.getString(0)).toSet
    assert(got.forall(_.startsWith("t")), s"tag scope must exclude distractors: $got")
  }
}
