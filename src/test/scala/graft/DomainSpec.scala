package graft

import java.sql.Timestamp

import graft.domain._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end specs for the automem-semantic domain library over a seeded
  * synthetic corpus (FIXTURES.md §3 scenarios): classification, enrichment
  * edges, recall channels + scoring + dedup, supersession chain/cycle,
  * expansion bridge, consolidation decay/forget/cluster rules.
  */
class DomainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  val now: Timestamp = ts("2026-01-10 00:00:00")

  def mem(id: String, content: String, t: String, tags: Seq[String] = Nil,
      typ: String = "Context", importance: Double = 0.5,
      archived: Boolean = false, relevance: Double = 1.0): Memory = {
    val tstamp = ts(t)
    Memory(id, content, tstamp, tstamp, None, tstamp, tstamp, importance, 0.7,
      typ, tags.map(_.toLowerCase), Nil, "{}", None, enriched = false,
      processed = false, relevance, archived, protected_flag = false,
      PlaceholderEmbedding.embed(content))
  }

  def edge(src: String, dst: String, rel: String, t: String = "2026-01-05 00:00:00",
      strength: Option[Double] = Some(0.8)): Edge =
    Edge(src, dst, rel, strength, None, None, None, None, None, None, ts(t))

  lazy val corpus: Seq[Memory] = Seq(
    mem("m1", "We decided to use postgres for the main database", "2026-01-01 10:00:00",
      Seq("database", "project:alpha"), "Decision", importance = 0.9),
    mem("m2", "postgres connection pooling pattern with pgbouncer", "2026-01-02 10:00:00",
      Seq("database"), "Pattern", importance = 0.6),
    mem("m3", "I prefer dark mode editors", "2026-01-03 10:00:00",
      Seq("preferences"), "Preference", importance = 0.4),
    mem("m4", "We decided to use postgres for the main database", "2026-01-04 10:00:00",
      Seq("database"), "Decision", importance = 0.5), // dup content of m1
    mem("m5", "Old decision: use mysql for storage", "2025-12-01 10:00:00",
      Seq("database"), "Decision", importance = 0.7),
    mem("m6", "archived note about redis", "2026-01-05 10:00:00",
      Seq("database"), "Context", archived = true),
    mem("m7", "internal meta artifact", "2026-01-06 10:00:00",
      Nil, "MetaPattern"),
    mem("m8", "Sprint planning notes for project alpha", "2026-01-07 10:00:00",
      Seq("project:alpha:sprint1"), "Context"))

  lazy val edgesSeq: Seq[Edge] = Seq(
    edge("m5", "m1", "EVOLVED_INTO"), // m5 superseded by m1
    edge("m1", "m2", "RELATES_TO"),
    edge("m2", "m3", "SIMILAR_TO", strength = None),
    // cycle: c1 -> c2 -> c1
    edge("c1", "c2", "INVALIDATED_BY"),
    edge("c2", "c1", "INVALIDATED_BY"))

  lazy val memories: DataFrame = {
    import spark.implicits._
    val df = corpus.toDF()
    df.withColumn("tag_prefixes",
      graft.functions.TextFunctions.tagPrefixes(col("tags")))
  }
  lazy val edgesDf: DataFrame = {
    import spark.implicits._
    edgesSeq.toDF()
  }

  test("ingest classifies types from content and fills derived columns") {
    import spark.implicits._
    val raw = Seq(
      ("We decided to go with spark", Seq("Infra", "infra")),
      ("I prefer tabs rather than spaces", Seq("style ")),
      ("just a note", Seq.empty[String]))
      .toDF("content", "tags")
    val out = Ingest.prepare(raw).collect().sortBy(_.getAs[String]("content"))
    val byContent = out.map(r => r.getAs[String]("content") -> r).toMap
    assert(byContent("We decided to go with spark").getAs[String]("type") == "Decision")
    assert(byContent("I prefer tabs rather than spaces").getAs[String]("type") == "Preference")
    assert(byContent("just a note").getAs[String]("type") == "Context")
    val infra = byContent("We decided to go with spark")
    assert(infra.getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("infra"))
    assert(infra.getAs[String]("id") != null)
    assert(infra.getAs[scala.collection.Seq[Float]]("embedding").length == PlaceholderEmbedding.DefaultDim)
  }

  test("content-size governance: the reference's ok/summarize/reject boundaries") {
    import spark.implicits._
    // test_content_size.py:16-38 pins the trichotomy at the exact limits
    val cases = Seq("" -> "ok", "Short memory content." -> "ok",
      ("x" * 500) -> "ok", ("x" * 501) -> "summarize",
      ("x" * 2000) -> "summarize", ("x" * 2001) -> "reject")
    val got = cases.map(_._1).toDF("content")
      .select(col("content"), Ingest.contentFate(col("content")).as("fate"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (c, want) =>
      assert(got(c) == want, s"len=${c.length}: got ${got(c)}, want $want") }
    // prepareWithRejects: dropped rows surface with a reason instead of
    // vanishing; survivors above the soft limit carry the summary
    val raw = Seq("fine", "x" * 501, "x" * 2001, "").toDF("content")
    val (prepared, rejected) = Ingest.prepareWithRejects(raw)
    assert(prepared.count() == 2)
    val reasons = rejected.select("reject_reason").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(reasons == Seq("content_exceeds_hard_limit", "empty_content"))
    val longRow = prepared.filter(length(col("content")) === 501).head()
    assert(longRow.getAs[String]("summary") != null,
      "above-soft-limit survivor must carry the extractive summary")
  }

  test("placeholder embeddings are deterministic and unit-norm") {
    val a = PlaceholderEmbedding.embed("hello world")
    val b = PlaceholderEmbedding.embed("hello world")
    val c = PlaceholderEmbedding.embed("different")
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("recall: keyword query finds postgres memories, excludes archived and artifacts") {
    val res = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres database"), limit = 5, now = now))
    val ids = res.select("id").collect().map(_.getString(0)).toSeq
    assert(ids.nonEmpty)
    assert(!ids.contains("m6"), "archived must be excluded")
    assert(!ids.contains("m7"), "MetaPattern artifact must be excluded")
    assert(ids.contains("m1") || ids.contains("m4"))
    // dedup by content fingerprint: m1 and m4 share content -> only one survives
    assert(!(ids.contains("m1") && ids.contains("m4")))
  }

  test("recall: tag filters any/all/prefix and exclude") {
    val anyRes = Recall.recall(memories, edgesDf,
      RecallRequest(tags = Seq("database"), limit = 10, now = now))
    val anyIds = anyRes.select("id").collect().map(_.getString(0)).toSet
    assert(Set("m1", "m2", "m5").subsetOf(anyIds) || Set("m1", "m2", "m4").subsetOf(anyIds))

    val prefixRes = Recall.recall(memories, edgesDf,
      RecallRequest(tags = Seq("project:alpha"), tagMatch = "prefix",
        limit = 10, now = now))
    val prefixIds = prefixRes.select("id").collect().map(_.getString(0)).toSet
    assert(prefixIds.contains("m8"), "prefix match must hit project:alpha:sprint1")
    assert(prefixIds.contains("m1"))

    val exclRes = Recall.recall(memories, edgesDf,
      RecallRequest(tags = Seq("database"), excludeTags = Seq("project:alpha"),
        limit = 10, now = now))
    val exclIds = exclRes.select("id").collect().map(_.getString(0)).toSet
    assert(!exclIds.contains("m1"), "exclude-tags drops prefix-matching tags")
  }

  test("recall: current-state mode replaces superseded memory with head") {
    // limit=1 isolates m5 (top keyword match) so its head m1 is NOT
    // already a result — the reference only records provenance in that case
    val res = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("mysql storage"), limit = 1,
        stateMode = "current", now = now))
    val rows = res.select("id", "superseded_from").collect()
    val ids = rows.map(_.getString(0)).toSeq
    assert(!ids.contains("m5"), "superseded m5 must not appear")
    val replaced = rows.find(r => r.getString(1) == "m5")
    assert(replaced.isDefined, "head must carry superseded_from=m5 provenance")
    assert(replaced.get.getString(0) == "m1")
  }

  test("supersession: cycle-safe bounded walk") {
    import spark.implicits._
    val ids = Seq("c1").toDF("id")
    val heads = Supersession.resolveHeads(ids, edgesDf).collect()
    assert(heads.length == 1)
    // c1 -> c2, then c2 -> c1 is a cycle: walk stops at c2
    assert(heads.head.getAs[String]("head_id") == "c2")
    assert(heads.head.getAs[Int]("depth") == 1)
  }

  test("recall: graph expansion surfaces related memory via edges") {
    val res = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres database decision"), limit = 2,
        expandRelations = true, now = now))
    val byId = res.select("id", "match_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId.contains("m2") || byId.contains("m3"),
      s"expansion should pull a related memory, got ${byId.keys}")
    assert(byId.exists(_._2 == "relation"),
      s"expanded rows carry match_type=relation, got $byId")
    assert(res.columns.contains("relations"), "final results must hydrate relations")
  }

  test("U2 type aliases normalize on ingest; unknown explicit types reject " +
    "(config.py:187-241)") {
    import spark.implicits._
    val cases = Seq(
      "decision" -> "Decision", "learning is fun" -> null, // unknown -> reject
      "analysis" -> "Insight", "observation" -> "Insight",
      "meeting_notes" -> "Context", "template" -> "Pattern",
      "health_habits" -> "Habit", "communication" -> "Preference",
      "legal_analysis" -> "Insight", "Decision" -> "Decision",
      "person" -> "Context", "interests" -> "Preference")
    val df = cases.zipWithIndex.map { case ((raw, _), i) =>
      (s"content $i", Seq.empty[String], raw)
    }.toDF("content", "tags", "type")
    val out = Ingest.prepare(df).select("content", "type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((raw, want), i) =>
      if (want == null)
        assert(!out.contains(s"content $i"), s"'$raw' must be rejected")
      else assert(out(s"content $i") == want, s"'$raw' -> ${out.get(s"content $i")}")
    }
    // absent type still classifies from content
    val classified = Ingest.prepare(Seq(("We decided to use spark", Seq.empty[String]))
      .toDF("content", "tags")).select("type").head().getString(0)
    assert(classified == "Decision")
  }

  test("legacy DISCOVERED edge kinds canonicalize on ingest (config.py:420-469)") {
    import spark.implicits._
    val raw = Seq(
      Edge("a", "b", "EXPLAINS", None, None, None, None, None, None, None, now),
      Edge("a", "c", "shares_theme", None, None, None, None, None, None, None, now),
      Edge("a", "d", "DISCOVERED", None, None, None, None, None, Some("Parallel_Context"),
        None, now),
      Edge("a", "e", "relates_to", None, None, None, None, None, None, None, now)).toDF()
    val got = Ingest.normalizeEdges(raw)
      .select("dst", "rel_type", "kind").collect()
      .map(r => r.getString(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    assert(got("b") == ("DISCOVERED", Some("explains")))
    assert(got("c") == ("DISCOVERED", Some("shares_theme")))
    assert(got("d") == ("DISCOVERED", Some("parallel_context")))
    assert(got("e") == ("RELATES_TO", None))
  }

  test("J3 entity expansion: multi-hop via person tags (README.md:89-97 story)") {
    import spark.implicits._
    val seed = mem("e1", "Amanda's sister is Rachel", "2026-01-02 00:00:00",
      Seq("family", "entity:people:amanda", "entity:people:rachel"))
    val target = mem("e2", "Rachel works as a counselor", "2026-01-03 00:00:00",
      Seq("entity:people:rachel"), importance = 0.6)
    val noise = mem("e3", "grocery list apples", "2026-01-04 00:00:00", Seq("noise"))
    val df = Seq(seed, target, noise).toDF()
      .withColumn("tag_prefixes",
        graft.functions.TextFunctions.tagPrefixes(col("tags")))
    val noEdges = spark.emptyDataset[Edge].toDF()
    val without = Recall.recall(df, noEdges, RecallRequest(
      query = Some("amanda sister"), limit = 1, now = now))
    assert(without.select("id").collect().map(_.getString(0)).toSeq == Seq("e1"))
    val res = Recall.recall(df, noEdges, RecallRequest(
      query = Some("amanda sister"), limit = 1, expandEntities = true, now = now))
    val byId = res.select("id", "match_type", "final_score").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(byId.contains("e2"),
      s"rachel memory must surface via entity expansion, got ${byId.keys}")
    assert(byId("e2")._1 == "entity_expansion")
    assert(!byId.contains("e3"), "noise must not be expanded")
    // flat 0.15 boost: e2's score = formula + 0.15; its query-independent
    // parts alone (imp .6*.1 + conf .7*.05 + recency*.1 < 0.2) cannot reach
    // 0.15 without the boost at these weights
    assert(byId("e2")._2 > 0.15, s"entity boost missing: ${byId("e2")._2}")
  }

  test("S4 delete-by-tag detaches edges of deleted memories (memory.py:326-364)") {
    val (mems, edgesLeft) = GraphOps.deleteByTag(memories, edgesDf,
      Seq("preferences"))
    val ids = mems.select("id").collect().map(_.getString(0)).toSet
    assert(!ids.contains("m3"), "tagged memory must be deleted")
    assert(ids.contains("m1"), "untagged memories survive")
    val pairs = edgesLeft.select("src", "dst").collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    assert(!pairs.exists(p => p._1 == "m3" || p._2 == "m3"),
      s"edges touching m3 must detach, got $pairs")
    assert(pairs.contains("m1" -> "m2"), "unrelated edges survive")
    // prefix deletes take the whole subtree
    val (memsP, _) = GraphOps.deleteByTag(memories, edgesDf,
      Seq("project:alpha"), tagMatch = "prefix")
    val idsP = memsP.select("id").collect().map(_.getString(0)).toSet
    assert(!idsP.contains("m1") && !idsP.contains("m8"), s"got $idsP")
  }

  test("entity identity injection returns matching unmerged identities " +
    "(recall.py:2454-2491)") {
    import spark.implicits._
    val results = Seq(
      ("r1", Seq("work", "entity:people:alice")),
      ("r2", Seq("entity:tools:spark-submit"))).toDF("id", "tags")
    val entities = Seq(
      ("e1", "alice", Some("alice: async reviews"), None: Option[String], Seq.empty[String]),
      ("e2", "spark-submit", Some("tool profile"), Some("e9"), Seq.empty[String]), // merged
      ("e3", "bob", Some("bob profile"), None, Seq.empty[String]), // not referenced
      ("e4", "carol", None, None, Seq.empty[String]), // no identity yet
      ("e5", "orion-project", Some("alias hit"), None, Seq("orion")))
      .toDF("id", "slug", "identity", "merged_into", "aliases")
    val got = Recall.entityIdentities(results, entities, Some("Orion roadmap"))
      .select("id").collect().map(_.getString(0)).toSet
    // alice via result tags; e5 via the query entity alias; e2 merged out,
    // e3 unreferenced, e4 identity-less
    assert(got == Set("e1", "e5"), s"got $got")
  }

  test("sort=time_desc ranks by the timestamp tuple, not the score") {
    val byScore = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres"), limit = 3, now = now))
      .select("id").collect().map(_.getString(0)).toSeq
    val byTime = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres"), limit = 3, sort = "time_desc", now = now))
      .select("id", "timestamp").collect()
    val ts = byTime.map(_.getTimestamp(1).getTime).toSeq
    assert(ts == ts.sorted.reverse, s"time_desc must be newest-first: ${ts}")
    assert(byScore.nonEmpty && byTime.nonEmpty)
    // score order puts the strongest keyword hit first (m1/m4 duplicate
    // content), which is not the newest row — the two orders must differ
    assert(byScore.head != byTime.head.getString(0),
      s"score head ${byScore.head} should differ from time head")
  }

  test("expansion knobs: expandMinImportance filters and expandRespectTags scopes") {
    val req = RecallRequest(query = Some("postgres database decision"), limit = 2,
      expandRelations = true, now = now)
    val all = Recall.recall(memories, edgesDf, req)
      .select("id", "match_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val expandedIds = all.filter(_._2 == "relation").keySet
    assert(expandedIds.nonEmpty, s"need an expanded row to test, got $all")
    // every expanded candidate here has importance <= 0.6 -> a 0.99 floor
    // leaves only channel rows
    val strict = Recall.recall(memories, edgesDf,
      req.copy(expandMinImportance = Some(0.99)))
      .select("match_type").collect().map(_.getString(0))
    assert(!strict.contains("relation"), s"importance floor must prune: ${strict.toSeq}")
    // respecting a scope tag that expanded rows lack also prunes them
    val scoped = Recall.recall(memories, edgesDf,
      req.copy(tags = Seq("project:alpha"), expandRespectTags = true))
      .select("id", "match_type").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(!scoped.exists(kv => kv._2 == "relation" && !Set("m1", "m8").contains(kv._1)),
      s"expanded rows outside the tag scope must be pruned: ${scoped.toSeq}")
  }

  test("bitemporal validity: expired/not-yet-valid rows are state-suppressed " +
    "(recall.py:437-449)") {
    import spark.implicits._
    val valid = mem("b1", "current fact about deploys", "2026-01-02 00:00:00")
    val expired = mem("b2", "expired fact about deploys", "2026-01-03 00:00:00")
      .copy(t_invalid = Some(ts("2026-01-05 00:00:00"))) // <= now -> expired
    val future = mem("b3", "future fact about deploys", "2026-01-04 00:00:00")
      .copy(t_valid = ts("2027-01-01 00:00:00")) // > now -> not yet valid
    val df = Seq(valid, expired, future).toDF()
      .withColumn("tag_prefixes",
        graft.functions.TextFunctions.tagPrefixes(col("tags")))
    val noEdges = spark.emptyDataset[Edge].toDF()
    val current = Recall.recall(df, noEdges, RecallRequest(
      query = Some("fact deploys"), limit = 10, stateMode = "current", now = now))
      .select("id").collect().map(_.getString(0)).toSet
    assert(current == Set("b1"), s"got $current")
    // default mode keeps the full history
    val all = Recall.recall(df, noEdges, RecallRequest(
      query = Some("fact deploys"), limit = 10, now = now))
      .select("id").collect().map(_.getString(0)).toSet
    assert(all == Set("b1", "b2", "b3"), s"got $all")
  }

  test("R5 priority guarantee: absent priority id is injected and ranked first") {
    // m8 never surfaces for this query through any channel
    val plain = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres database"), limit = 3, now = now))
    assert(!plain.select("id").collect().map(_.getString(0)).contains("m8"))
    val res = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres database"), limit = 3,
        priorityIds = Seq("m8"), now = now))
    val ids = res.select("id").collect().map(_.getString(0))
    assert(ids.head == "m8", s"priority id must appear first, got ${ids.toSeq}")
    assert(ids.length == 3, "injection must not exceed the limit")
    // priority rows honor base filters: an archived priority id stays out
    val archived = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres database"), limit = 3,
        priorityIds = Seq("m6"), now = now))
    assert(!archived.select("id").collect().map(_.getString(0)).contains("m6"))
  }

  test("R5 priority tags inject top rows by importance (capped at 3)") {
    val res = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("zzz nothing matches"), limit = 5,
        priorityTags = Seq("preferences"), now = now))
    val ids = res.select("id").collect().map(_.getString(0)).toSet
    assert(ids.contains("m3"), s"priority-tag row must be injected, got $ids")
  }

  test("recall: min_score and adaptive floor cut low scores") {
    val all = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres"), limit = 10, now = now))
    val scores = all.select("final_score").collect().map(_.getDouble(0))
    assert(scores.nonEmpty)
    val cut = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres"), limit = 10,
        minScore = Some(scores.max + 0.001), now = now))
    assert(cut.count() == 0)
  }

  test("recall leaves no CacheManager entry behind (ADVICE r5 #5)") {
    // recall's bounded result frame is re-consumed by driver-side actions;
    // it must materialize via localCheckpoint, NOT a cache() that the
    // reassignment of `agg` makes impossible to unpersist — a long-lived
    // session would accumulate one cached plan per call
    spark.sharedState.cacheManager.clearCache()
    Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres database"), tags = Seq("preferences"),
        limit = 4, scopeFallback = true, adaptiveFloor = true,
        expandEntities = true, now = now)).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "recall must not leak cached plans into the session CacheManager")
  }

  test("recall: scope fallback tops up and flags out-of-scope rows") {
    val res = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres database"), tags = Seq("preferences"),
        limit = 4, scopeFallback = true, now = now))
    val rows = res.select("id", "outside_tag_scope").collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getBoolean(1)), "fallback rows must be flagged")
    // in-scope rows sort before out-of-scope rows
    val flags = rows.map(_.getBoolean(1)).toSeq
    assert(flags == flags.sorted)
  }

  test("enrichment: temporal links respect 7-day window and direction") {
    val links = Enrichment.temporalLinks(memories).collect()
    assert(links.nonEmpty)
    links.foreach { r =>
      assert(r.getAs[String]("rel_type") == "PRECEDED_BY")
    }
    // m1 (jan 1) has no earlier memory within 7 days (m5 is dec 1)
    assert(!links.exists(_.getAs[String]("src") == "m1"))
    // m2 (jan 2) links back to m1
    assert(links.exists(r => r.getAs[String]("src") == "m2" &&
      r.getAs[String]("dst") == "m1"))
  }

  test("enrichment: similar-to edges link identical-content memories") {
    val sims = Enrichment.similarToEdges(memories, threshold = 0.99).collect()
    // m1 and m4 have identical content -> identical embeddings -> sim 1.0
    assert(sims.exists(r => r.getAs[String]("src") == "m1" &&
      r.getAs[String]("dst") == "m4"))
    assert(sims.exists(r => r.getAs[String]("src") == "m4" &&
      r.getAs[String]("dst") == "m1"), "SIMILAR_TO must be bidirectional")
  }

  test("enrichment: pattern detection requires >= 3 confident same-type memories") {
    val pats = Enrichment.detectPatterns(memories).collect()
    val types = pats.map(_.getAs[String]("type")).toSet
    assert(types.contains("Decision"), "3 Decision memories -> Decision pattern")
    assert(!types.contains("Preference"), "1 Preference memory is not enough")
    val dec = pats.find(_.getAs[String]("type") == "Decision").get
    assert(dec.getAs[Double]("confidence") == 0.35 + 3 * 0.05)
    assert(dec.getAs[scala.collection.Seq[String]]("key_terms").nonEmpty)
  }

  test("enrichment: entity extraction finds tools/people and writes entity tags") {
    import spark.implicits._
    val df = Ingest.prepare(Seq(
      // two-token person name: the quality gate's person-shape exemption
      // admits it despite the "tooling"/"project" context hints, which
      // (faithful to the reference) reject single-token people in
      // tool-context prose
      ("Met with Alice Barton about the `spark-submit` tooling for project Orion", Seq("work")))
      .toDF("content", "tags"))
    val (enriched, _, _) = Enrichment.enrich(df)
    val tags = enriched.select("tags").head().getSeq[String](0)
    assert(tags.exists(_.startsWith("entity:people:alice-barton")), s"got $tags")
    assert(tags.exists(_.startsWith("entity:tools:spark-submit")), s"got $tags")
    assert(tags.exists(_.startsWith("entity:projects:orion")), s"got $tags")
  }

  test("consolidation: decay is bounded, floored by importance, relevant edges help") {
    val scored = Consolidation.decay(memories, edgesDf, now)
    val rows = scored.select("id", "relevance_score", "importance").collect()
    rows.foreach { r =>
      val rel = r.getDouble(1)
      assert(rel <= 1.0 && rel >= r.getDouble(2) * 0.3 - 1e-12,
        s"${r.getString(0)}: $rel out of bounds")
    }
  }

  test("consolidation: forget protects important/young/Decision memories") {
    val fates = Consolidation.forget(memories, edgesDf, now)
      .select("id", "fate").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fates("m1") == "keep") // Decision + importance 0.9 + young
    assert(fates("m3") == "keep") // young (grace window)
  }

  test("consolidation: clustering groups identical embeddings into components") {
    val (clusters, metas) = Consolidation.cluster(memories, threshold = 0.99,
      minSize = 2, metaSize = 10)
    val c = clusters.collect()
    assert(c.exists(_.getAs[Long]("cluster_size") >= 2),
      "m1/m4 identical embeddings must cluster")
    assert(metas.collect().isEmpty, "no cluster reaches metaSize 10")
  }

  test("C3 blocked similarity graph recalls >= 95% of exact pairs at 0.75") {
    import spark.implicits._
    // clusters of noisy copies around gaussian centers: within-cluster cosine
    // >> 0.75, cross-cluster ~ 0. Deterministic via a fixed seed.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 25).flatMap { ci =>
      val center = Array.fill(64)(rnd.nextGaussian().toFloat)
      (0 until 3).map { mi =>
        val noisy = center.map(v => v + rnd.nextGaussian().toFloat * 0.1f)
        (s"c$ci-m$mi", noisy, 1.0)
      }
    }
    val df = rows.toDF("id", "embedding", "relevance_score")
    def pairSet(exact: Boolean): Set[(String, String)] =
      Consolidation.similarityEdges(df, 0.75, exact = exact)
        .select("src", "dst").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val exactPairs = pairSet(exact = true)
    val blockedPairs = pairSet(exact = false)
    assert(exactPairs.size >= 50, s"corpus must produce pairs, got ${exactPairs.size}")
    assert(blockedPairs.subsetOf(exactPairs), "blocking must not invent pairs")
    val recall = blockedPairs.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.95, s"blocked recall $recall < 0.95 " +
      s"(${blockedPairs.size}/${exactPairs.size})")
  }

  test("consolidation: creative associations emit rule-based kinds, skip existing") {
    val out = Consolidation.creativeAssociations(memories, edgesDf, now)
    val kinds = out.select("kind").collect().map(_.getString(0)).toSet
    assert(out.count() > 0)
    assert(kinds.subsetOf(Set("contradicts", "explains", "shares_theme", "parallel_context")))
    // m1 -> m2 already connected: no new edge for that pair
    assert(!out.collect().exists(r => r.getAs[String]("src") == "m1" &&
      r.getAs[String]("dst") == "m2"))
  }

  test("consolidation: creative sample is constant in corpus size (C2 scale contract)") {
    import spark.implicits._
    // 2,000-row corpus: pair count must be bounded by C(30,2), not grow
    // with the corpus — the reference samples a fixed 20-30 rows
    // (`consolidation.py:348`), and a proportional sample would make the
    // self-cross-join quadratic at 100 TB.
    val big = spark.range(2000).select(
      concat(lit("m"), col("id")).as("id"),
      lit("Insight").as("type"),
      array((0 until 8).map(i => (rand(42 + i) * 2 - 1).cast("float")): _*)
        .as("embedding"),
      lit(ts("2026-01-01 00:00:00")).as("timestamp"),
      lit(0.9).as("relevance_score"))
    val empty = Seq.empty[(String, String, String)].toDF("src", "dst", "rel_type")
    val out = Consolidation.creativeAssociations(big, empty, now, sampleSize = 30)
    val n = out.count()
    assert(n <= 30L * 29 / 2, s"pair count $n exceeds C(30,2) — sample not bounded")
    val distinctIds = out.select(explode(array(col("src"), col("dst"))))
      .distinct().count()
    assert(distinctIds <= 30, s"$distinctIds distinct ids in pairs — sample not bounded")
  }

  test("'*' and stopword-only queries fall back to trending (importance browse)") {
    // runtime_recall_helpers.py:618-629: no keywords and no >=3-char phrase
    // -> importance-ordered trending rows, score = importance feeding the
    // keyword component
    // the keyword channel redirects to trending; the vector channel still
    // runs (the reference embeds the literal query text), so results are a
    // vector/trending union — trending-claimed rows must carry
    // s_keyword = min(1, importance)
    val star = Recall.trendingChannel(
      Recall.baseFilter(memories, RecallRequest(now = now)), limit = 5)
    val chan = star.collect()
    assert(chan.nonEmpty && chan.forall(_.getAs[String]("match_type") == "trending"))
    // component mapping (scoring.py:186-190): a trending-claimed candidate
    // scores its (clamped) channel score as the keyword component; a
    // vector-claimed row does NOT borrow it (seen_ids semantics)
    import spark.implicits._
    val cand = Seq(
      ("t1", "browse row", ts("2026-01-05 00:00:00"), 0.9, 0.7,
        Seq.empty[String], "{}", 1.0, Option.empty[Double], Some(0.9)),
      ("v1", "vector row", ts("2026-01-05 00:00:00"), 0.8, 0.7,
        Seq.empty[String], "{}", 1.0, Some(0.5), Some(0.8)))
      .toDF("id", "content", "timestamp", "importance", "confidence",
        "tags", "metadata", "relevance_score", "vector_score", "trending_score")
      .withColumn("keyword_score", lit(null).cast("double"))
      .withColumn("metadata_score", lit(null).cast("double"))
      .withColumn("match_type",
        when(col("vector_score").isNotNull, "vector").otherwise("trending"))
    val req = RecallRequest(query = Some("*"), limit = 5, now = now)
    val scored = Recall.scoreCandidates(cand, req, Some("*")).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Double]("s_keyword")).toMap
    assert(math.abs(scored("t1") - 0.9) < 1e-9,
      s"trending row folds importance into keyword: $scored")
    assert(scored("v1") == 0.0,
      s"vector-claimed row keeps the (empty-token) fallback: $scored")
  }

  test("scope fallback never resurrects in-scope rows dropped by min_score") {
    // api/recall.py:857-870: an in-scope candidate cut by a score filter
    // must not come back mislabeled outside_tag_scope
    val req = RecallRequest(query = Some("postgres database"), limit = 10,
      tags = Seq("database"), scopeFallback = true, minScore = Some(0.45),
      now = now)
    val out = Recall.recall(memories, edgesDf, req)
      .select("id", "outside_tag_scope", "tags", "final_score").collect()
    val fills = out.filter(_.getAs[Boolean]("outside_tag_scope"))
    fills.foreach { r =>
      assert(!r.getSeq[String](r.fieldIndex("tags")).contains("database"),
        s"in-scope row returned as fill: $r")
    }
    out.filterNot(_.getAs[Boolean]("outside_tag_scope")).foreach { r =>
      assert(r.getAs[Double]("final_score") >= 0.45, s"min_score violated: $r")
    }
  }

  test("vector fetch pool widens for tag-scoped queries (api/recall.py:1963-1977)") {
    val plain = RecallRequest(query = Some("q"), limit = 10, now = now)
    assert(Recall.vectorFetchLimit(plain, hasQuery = true) == 40, "limit*4")
    val scoped = plain.copy(tags = Seq("work"))
    assert(Recall.vectorFetchLimit(scoped, hasQuery = true) == 100,
      "tag-scoped pools widen to RECALL_MAX_LIMIT")
    val prio = plain.copy(priorityTags = Seq("project:x"))
    assert(Recall.vectorFetchLimit(prio, hasQuery = true) == 100)
    // no query/embedding -> no boost; big limits keep their own overfetch
    assert(Recall.vectorFetchLimit(scoped, hasQuery = false) == 40)
    assert(Recall.vectorFetchLimit(scoped.copy(limit = 40), hasQuery = true) == 160)
    assert(Recall.vectorFetchLimit(plain.copy(limit = 60), hasQuery = true) == 200,
      "overfetch cap 200")
  }

  test("content-size gates sit exactly on the reference boundaries (test_content_size.py)") {
    import spark.implicits._
    val rows = Seq(
      ("at_soft", "x" * 500), ("over_soft", "y" * 501),
      ("at_hard", "z" * 2000), ("over_hard", "w" * 2001))
      .toDF("id", "content").withColumn("tags", array().cast("array<string>"))
    val out = Ingest.prepare(rows).select("id", "summary").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out.keySet == Set("at_soft", "over_soft", "at_hard"),
      s"content above the hard limit must be rejected, kept: ${out.keySet}")
    assert(out("at_soft").isEmpty, "content AT the soft limit is ok, no summary")
    assert(out("over_soft").isDefined && out("at_hard").isDefined,
      "content above soft / at hard must summarize")
  }

  test("recency re-rank: zero timestamp spread contributes nothing (recall.py:2337)") {
    import spark.implicits._
    val t = ts("2026-01-05 00:00:00")
    val same = Seq(("a", t, 0.8), ("b", t, 0.5)).toDF("id", "timestamp", "final_score")
    val req = RecallRequest(query = Some("latest plan"), recencyBias = "on", now = now)
    val out = Recall.recencyRerank(same, req).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out == Map("a" -> 0.8, "b" -> 0.5),
      s"uniform-timestamp sets must keep reference score values, got $out")
    // non-zero spread: newest gains 0.1, oldest gains 0
    val spread = Seq(("old", ts("2026-01-01 00:00:00"), 0.5),
      ("new", ts("2026-01-03 00:00:00"), 0.5)).toDF("id", "timestamp", "final_score")
    val out2 = Recall.recencyRerank(spread, req).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(out2("new") - 0.6) < 1e-9 && math.abs(out2("old") - 0.5) < 1e-9, s"got $out2")
  }

  test("recall: multi-query union and auto-decompose (Q6)") {
    val multi = Recall.recall(memories, edgesDf,
      RecallRequest(queries = Seq("postgres", "dark mode"), limit = 10, now = now))
    val ids = multi.select("id").collect().map(_.getString(0)).toSet
    assert(ids.exists(Set("m1", "m4").contains), "first query results present")
    assert(ids.contains("m3"), "second query results present")

    // the reference's own example (api/recall.py:2160-2163 and
    // test_recall_entity_extraction.py): possessive entity + topic focus +
    // the career-intent broadening query
    val q = "Would Caroline's sister pursue writing as a career?"
    assert(Recall.extractQueryEntities(q) == Seq("Caroline"),
      "possessive name extraction (sentence-start 'Would' is a stopword)")
    assert(Recall.extractQueryEntities(
      "Would Caroline’s sister pursue writing as a career?") == Seq("Caroline"),
      "curly-apostrophe possessive")
    val decomposed = Recall.autoDecompose(q)
    assert(decomposed.head == q)
    assert(decomposed.contains("Caroline"), s"entity alone: $decomposed")
    assert(decomposed.contains("Caroline writing") &&
      decomposed.contains("Caroline career"), s"entity x topic: $decomposed")
    assert(decomposed.contains("Caroline interests goals plans"),
      s"career-intent broadening: $decomposed")
    // sentence-start capitals are never entities
    assert(Recall.extractQueryEntities("Postgres decision for Alpha migration") ==
      Seq("Alpha"))
    val res = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("Postgres decision for Alpha migration"),
        autoDecompose = true, limit = 5, now = now))
    assert(res.count() > 0)
  }

  test("recall: per-query limit caps each sub-query; limits clamp to guards") {
    // per_query_limit=1 (`recall.py:1875-1887`): each sub-query contributes
    // its single best row before the aggregate re-rank
    val capped = Recall.recall(memories, edgesDf,
      RecallRequest(queries = Seq("postgres", "dark mode"), limit = 10,
        perQueryLimit = Some(1), now = now))
    assert(capped.count() <= 2, "two sub-queries x per-query cap of 1")
    val uncapped = Recall.recall(memories, edgesDf,
      RecallRequest(queries = Seq("postgres", "dark mode"), limit = 10, now = now))
    assert(uncapped.count() > capped.count(),
      "the cap must actually cut sub-query contributions")
    // limit clamps to the reference's [1,100] guard (`app.py:234`)
    val clamped = Recall.recall(memories, edgesDf,
      RecallRequest(query = Some("postgres"), limit = 100000, now = now))
    assert(clamped.count() <= 100, "limit must clamp to 100")
  }

  test("batch recall: one plan for many queries matches single-query recall") {
    import spark.implicits._
    // m1 carries metadata whose KEY equals query 3 ("project"): the old
    // substring-on-raw-JSON exact component fired on it while the single
    // path's term-set membership does not — this row pins the term-set
    // semantics in BOTH engines. Query 4 pins the trending fallback.
    val memsMd = memories.withColumn("metadata",
      when(col("id") === "m1", lit("""{"project": "alpha"}"""))
        .otherwise(col("metadata")))
    // query 5 ("project alpha") HITS m1's metadata value through the Q5
    // channel (strong-evidence score 1.0, weight 0.35): it pins the batch
    // metadata channel against the single path — omitted, it flips m1's
    // rank (VERDICT r8 item 2)
    val queries = Seq((1, "postgres database"), (2, "dark mode editors"),
      (3, "project"), (4, "*"), (5, "project alpha"))
      .toDF("qid", "query")
    val batch = BatchRecall.batchRecall(memsMd, edgesDf, queries, limit = 5,
      now = now).collect()
    val byQid = batch.groupBy(_.getAs[Int]("qid"))
    Seq(1 -> "postgres database", 2 -> "dark mode editors",
      3 -> "project", 4 -> "*", 5 -> "project alpha").foreach {
      case (qid, q) =>
        val single = Recall.recall(memsMd, edgesDf,
          RecallRequest(query = Some(q), limit = 5, now = now))
          .select("id", "final_score").collect()
        val got = byQid(qid).sortBy(_.getAs[Long]("rank"))
          .map(r => (r.getAs[String]("id"), r.getAs[Double]("final_score")))
        val want = single.map(r => (r.getString(0), r.getDouble(1)))
        assert(got.map(_._1).toSeq == want.map(_._1).toSeq,
          s"qid=$qid ids: got ${got.map(_._1).toSeq} want ${want.map(_._1).toSeq}")
        got.zip(want).foreach { case ((_, gs), (_, ws)) =>
          assert(math.abs(gs - ws) < 1e-9, s"qid=$qid score $gs vs $ws")
        }
    }
  }

  test("batch keyword forms are bitwise interchangeable across the query " +
    "classes (index vs scan, r16)") {
    import spark.implicits._
    // the same five-class query mix the batch-vs-single parity test uses
    // (keyword, metadata-carrying, trending via "*", phrase) — both forms
    // must produce IDENTICAL rows, scores included: the scan form is the
    // measured escape hatch for the common-token fan-out at corpus scale
    // (tools.KeywordFormProbe: 61.7 -> 23.5 s at 10^6 docs) and may never
    // diverge from the oracle-gated index form
    val memsMd = memories.withColumn("metadata",
      when(col("id") === "m1", lit("""{"project": "alpha"}"""))
        .otherwise(col("metadata")))
    val queries = Seq((1, "postgres database"), (2, "dark mode editors"),
      (3, "project"), (4, "*"), (5, "project alpha"), (6, "the of and a"))
      .toDF("qid", "query")
    def run(form: String): Seq[String] =
      BatchRecall.batchRecall(memsMd, edgesDf, queries, limit = 5,
        now = now, keywordForm = form)
        .collect().map(_.toString).sorted.toSeq
    val a = run("index")
    val b = run("scan")
    assert(a.nonEmpty && a == b,
      s"forms diverged: ${a.diff(b)} vs ${b.diff(a)}")
    // and against the ORACLE corpus + request mix (roundScores, qvec):
    val (mems, qdf) = graft.operators.RecallPipeline
      .batchRecall100Inputs(spark, "/root/testdata/sf0.001")
    def run100(form: String): Seq[String] =
      BatchRecall.batchRecall(mems, spark.emptyDataFrame, qdf, limit = 5,
        now = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
        roundScores = true, keywordForm = form)
        .collect().map(_.toString).sorted.toSeq
    val ai = run100("index")
    val bs = run100("scan")
    mems.unpersist()
    assert(ai.nonEmpty && ai == bs, "forms diverged on the oracle corpus")
  }

  test("entity bridge boosts rows spoken-by or mentioning a top-seed " +
    "entity, opt-in only") {
    import spark.implicits._
    val corpus = Seq(
      mem("s1", "Elena said her brother Tomas visited", "2026-01-01 10:00:00",
        Seq("entity:people:tomas"), "Context", importance = 0.9),
      mem("s2", "Tomas: my new job at the arboretum is great",
        "2026-01-02 10:00:00", Seq("speaker:tomas"), "Context",
        importance = 0.3),
      mem("s3", "unrelated note about gardening tools", "2026-01-03 10:00:00",
        Seq("speaker:ingrid"), "Context", importance = 0.3)).toDF()
    val req = RecallRequest(query = Some("Elena brother"), limit = 10,
      entityBridge = true, now = now)
    val boosted = Recall.recall(corpus, edgesDf.limit(0), req)
      .select("id", "final_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = Recall.recall(corpus, edgesDf.limit(0),
      req.copy(entityBridge = false))
      .select("id", "final_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // s1 is the top seed and names tomas -> s1 (mentions) and s2 (spoken by)
    // get +0.15; s3 is untouched; the flag off leaves everything untouched
    assert(math.abs(boosted("s2") - (plain("s2") + 0.15)) < 1e-9,
      s"spoken-by row not boosted: ${boosted("s2")} vs ${plain("s2")}")
    assert(math.abs(boosted("s1") - (plain("s1") + 0.15)) < 1e-9,
      s"mentioning row not boosted: ${boosted("s1")} vs ${plain("s1")}")
    if (boosted.contains("s3"))
      assert(math.abs(boosted("s3") - plain("s3")) < 1e-9,
        "unrelated row must not move")
  }

  test("entity bridge probes every collected category with exact slug " +
    "match and survives null tags") {
    import spark.implicits._
    def row(id: String, score: Double, tags: Option[Seq[String]],
        metadata: String) =
      (id, score, "keyword", 0.5, ts("2026-01-01 00:00:00"), tags, metadata)
    val df = Seq(
      // top seed: null tags (collect-side null guard) + place/org metadata
      row("seed", 1.0, None,
        """{"entities":{"places":["Santa Cruz"],"organizations":["Acme"]}}"""),
      row("place-hit", 0.5, Some(Seq("entity:places:santa-cruz")), "{}"),
      row("place-ext", 0.5, Some(Seq("entity:places:santa-cruzara")), "{}"),
      row("org-hit", 0.5, Some(Seq("entity:organizations:acme")), "{}"),
      row("null-tags", 0.4, None, "{}"))
      .toDF("id", "final_score", "match_type", "importance", "timestamp",
        "tags", "metadata")
      .withColumn("updated_at", col("timestamp"))
      .withColumn("last_accessed", col("timestamp"))
    val out = Recall.entityBridgeBoost(df, RecallRequest(now = now), topN = 1)
      .select("id", "final_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("place-hit") - 0.65) < 1e-9,
      s"place bridge must boost: ${out("place-hit")}")
    assert(math.abs(out("org-hit") - 0.65) < 1e-9,
      s"organization bridge must boost: ${out("org-hit")}")
    assert(math.abs(out("place-ext") - 0.5) < 1e-9,
      "slug prefix-extension (santa-cruzara vs santa-cruz) must not boost")
    assert(math.abs(out("null-tags") - 0.4) < 1e-9,
      "null-tags row must pass through unboosted, not NPE")
    assert(math.abs(out("seed") - 1.0) < 1e-9)
  }

  test("entity bridge checkpoint gate: the pre-bridge DAG executes once") {
    import spark.implicits._
    // Count per-row evaluations of the corpus with an accumulator-ticking
    // UDF. Without req.entityBridge in the localCheckpoint gate, the bridge
    // seed collect runs the channel-union DAG once and the returned frame
    // re-runs it at the final collect (~2x). With the gate, the bridge-on
    // count stays within noise of the bridge-off count.
    def measure(bridge: Boolean): Long = {
      val acc = spark.sparkContext.longAccumulator(s"bridge-ticks-$bridge")
      val tick = udf { (s: String) => acc.add(1); s }.asNondeterministic()
      val corpus = Seq(
        mem("s1", "Elena said her brother Tomas visited",
          "2026-01-01 10:00:00", Seq("entity:people:tomas"), "Context",
          importance = 0.9),
        mem("s2", "Tomas: my new job at the arboretum is great",
          "2026-01-02 10:00:00", Seq("speaker:tomas"), "Context",
          importance = 0.3),
        mem("s3", "unrelated note about gardening tools",
          "2026-01-03 10:00:00", Seq("speaker:ingrid"), "Context",
          importance = 0.3)).toDF()
        .withColumn("content", tick(col("content")))
      Recall.recall(corpus, edgesDf.limit(0),
        RecallRequest(query = Some("Elena brother"), limit = 10,
          entityBridge = bridge, now = now)).collect()
      acc.value
    }
    val off = measure(bridge = false)
    val on = measure(bridge = true)
    assert(on <= off * 3 / 2,
      s"entityBridge re-executes the recall DAG: $on evals vs $off without")
  }

  test("EXEMPLIFIES edges link confident memories to their type pattern") {
    val pats = Enrichment.detectPatterns(memories)
    val edges = Enrichment.exemplifiesEdges(memories, pats).collect()
    assert(edges.nonEmpty)
    edges.foreach { r =>
      assert(r.getAs[String]("rel_type") == "EXEMPLIFIES")
      assert(r.getAs[String]("dst").startsWith("pattern-"))
    }
    // the three Decision memories each exemplify pattern-decision
    val decSrcs = edges.filter(_.getAs[String]("dst") == "pattern-decision")
      .map(_.getAs[String]("src")).toSet
    assert(decSrcs == Set("m1", "m4", "m5"))
  }

  test("identity synthesis writes versioned profiles per entity") {
    import spark.implicits._
    val df = Ingest.prepare(Seq(
      ("Met with Alice about the roadmap", Seq("work")),
      ("Alice prefers async reviews", Seq("work")),
      ("Met with Alice to plan the launch", Seq("work")))
      .toDF("content", "tags"))
    val (enriched, _, _) = Enrichment.enrich(df)
    val ids = IdentitySynthesis.synthesize(enriched, new ExtractiveIdentityWriter)
      .collect()
    val alice = ids.find(_.getAs[String]("slug") == "alice")
    assert(alice.isDefined, s"got ${ids.map(_.getAs[String]("slug")).toSeq}")
    assert(alice.get.getAs[String]("identity").startsWith("alice: "))
    assert(alice.get.getAs[Long]("identity_source_count") >= 2)
    assert(alice.get.getAs[Int]("identity_version") == 1)
  }

  test("bounded neighbors traversal respects depth and excludes the start") {
    val d1 = GraphOps.neighbors(memories, edgesDf, "m1", depth = 1)
      .select("id").collect().map(_.getString(0)).toSet
    // 1 hop from m1: m5 (EVOLVED_INTO, reversed) and m2 (RELATES_TO)
    assert(d1 == Set("m2", "m5"), s"got $d1")
    val d2 = GraphOps.neighbors(memories, edgesDf, "m1", depth = 2)
      .select("id").collect().map(_.getString(0)).toSet
    assert(d2 == Set("m2", "m5", "m3"), s"got $d2") // m3 via m2 SIMILAR_TO
    val typed = GraphOps.neighbors(memories, edgesDf, "m1", depth = 2,
      relTypes = Seq("RELATES_TO"))
      .select("id").collect().map(_.getString(0)).toSet
    assert(typed == Set("m2"), s"got $typed")
  }

  test("R4 adaptive floor cuts below a pronounced top-half gap (recall.py:2351-2375)") {
    import spark.implicits._
    // n=8, halfway=max(3,4)=4: largest examined gap at i=3 (0.9 -> 0.3);
    // floor 0.3 retains 4 >= ceil(8/2) -> cut applies
    val gapped = Seq(1.0, 0.95, 0.9, 0.3, 0.25, 0.2, 0.15, 0.1).toDF("final_score")
    val cut = Recall.adaptiveFloor(gapped).collect().map(_.getDouble(0)).sorted
    assert(cut.toSeq == Seq(0.3, 0.9, 0.95, 1.0), s"got ${cut.toSeq}")
    // big gap below the top half is never examined -> no cut
    val lateGap = Seq(1.0, 0.98, 0.96, 0.94, 0.92, 0.9, 0.1, 0.05).toDF("final_score")
    assert(Recall.adaptiveFloor(lateGap).count() == 8)
    // cut would retain fewer than half -> no cut
    val topHeavy = Seq(1.0, 0.2, 0.15, 0.1, 0.05, 0.04).toDF("final_score")
    assert(Recall.adaptiveFloor(topHeavy).count() == 6)
    // flat scores -> no gap -> no cut
    val flat = Seq(0.5, 0.5, 0.5, 0.5, 0.5).toDF("final_score")
    assert(Recall.adaptiveFloor(flat).count() == 5)
  }

  test("C1 decay matches the reference formula incl. same-day access clamp " +
    "(consolidation.py:250-282)") {
    import spark.implicits._
    val sameDay = mem("d1", "accessed today", "2025-12-31 00:00:00", importance = 0.5)
      .copy(last_accessed = ts("2026-01-09 12:00:00")) // 0.5d ago -> factor 1.0
    val stale = mem("d2", "accessed long ago", "2025-12-21 00:00:00", importance = 0.5)
      .copy(last_accessed = ts("2025-12-21 00:00:00")) // 20d ago -> exp(-1.0)
    val df = Seq(sameDay, stale).toDF()
    val noEdges = spark.emptyDataset[Edge].toDF()
    val got = Consolidation.decay(df, noEdges, now)
      .select("id", "relevance_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    def expected(ageDays: Double, accessDays: Double): Double = {
      val accessFactor = if (accessDays < 1) 1.0 else math.exp(-0.05 * accessDays)
      val rel = math.min(1.0, math.exp(-0.01 * ageDays) *
        (0.3 + 0.3 * accessFactor) * (1.0 + 0.3 * math.log1p(0.0)) *
        (0.5 + 0.5) * (0.7 + 0.3 * 0.7))
      math.max(0.5 * 0.3, rel)
    }
    assert(math.abs(got("d1") - expected(10.0, 0.5)) < 1e-9, s"d1=${got("d1")}")
    assert(math.abs(got("d2") - expected(20.0, 20.0)) < 1e-9, s"d2=${got("d2")}")
  }

  test("baseFilter end bound is exclusive (half-open [start, end) window)") {
    val req = RecallRequest(
      start = Some(ts("2026-01-02 00:00:00")),
      end = Some(ts("2026-01-04 10:00:00")), now = now)
    val ids = Recall.baseFilter(memories, req)
      .select("id").collect().map(_.getString(0)).toSet
    // m4 is stamped exactly at the end bound -> excluded; m2/m3 inside
    assert(ids == Set("m2", "m3"), s"got $ids")
  }

  test("applyPatches: field-wise merge, tag recompute, re-embed only on " +
    "content change (S1b, memory.py:789-886)") {
    import spark.implicits._
    val store = Seq(
      mem("p1", "original content one", "2026-01-01 10:00:00",
        Seq("database", "project:alpha")),
      mem("p2", "original content two", "2026-01-02 10:00:00", Seq("keep")),
      mem("p3", "untouched row", "2026-01-03 10:00:00", Seq("keep"))).toDF()
    val patches = Seq(
      // content + importance + explicit updated_at
      ("p1", Some("new content one"), None: Option[Seq[String]], Some(0.9),
        Some(ts("2026-05-05 00:00:00"))),
      // tags-only payload, raw mixed case — exercises normalize + prefixes
      ("p2", None, Some(Seq(" New:Tag ", "UPPER", "")), None, None),
      // id not in the store: the reference 404s -> dropped
      ("px", Some("ghost"), None, None, None))
      .toDF("id", "content", "tags", "importance", "updated_at")
    val out = Ingest.applyPatches(store, patches,
        now = to_timestamp(lit("2026-06-01 00:00:00")))
      .collect().map(r => r.getAs[String]("id") -> r).toMap

    assert(out.keySet == Set("p1", "p2", "p3"),
      s"store rows pass through, ghost patch drops: ${out.keySet}")
    val p1 = out("p1")
    assert(p1.getAs[String]("content") == "new content one")
    assert(p1.getAs[Double]("importance") == 0.9)
    assert(p1.getAs[Timestamp]("updated_at") == ts("2026-05-05 00:00:00"),
      "explicit updated_at in the payload wins")
    // changed content -> re-embedded from the NEW content
    assert(p1.getSeq[Float](p1.fieldIndex("embedding")) ==
      PlaceholderEmbedding.embed("new content one").toSeq)
    // tags not in payload: normalize+prefix recompute still runs (handler
    // behavior) but values are unchanged for already-normalized tags
    assert(p1.getSeq[String](p1.fieldIndex("tags")) == Seq("database", "project:alpha"))
    assert(p1.getSeq[String](p1.fieldIndex("tag_prefixes")).sorted ==
      Seq("database", "project", "project:alpha"))

    val p2 = out("p2")
    assert(p2.getAs[String]("content") == "original content two")
    // unchanged content keeps the stored vector BIT-FOR-BIT (no re-embed)
    assert(p2.getSeq[Float](p2.fieldIndex("embedding")) ==
      PlaceholderEmbedding.embed("original content two").toSeq)
    assert(p2.getSeq[String](p2.fieldIndex("tags")) == Seq("new:tag", "upper"),
      s"raw payload tags must trim/lower/drop-empties: ${p2.getSeq[String](p2.fieldIndex("tags"))}")
    assert(p2.getSeq[String](p2.fieldIndex("tag_prefixes")).sorted ==
      Seq("new", "new:tag", "upper"))
    assert(p2.getAs[Timestamp]("updated_at") == ts("2026-01-02 10:00:00"),
      "no payload updated_at -> the CURRENT row's survives (memory.py:817)")
    assert(p2.getAs[Double]("importance") == 0.5, "absent fields keep current")

    val p3 = out("p3")
    assert(p3.getAs[String]("content") == "untouched row")
    assert(p3.getSeq[String](p3.fieldIndex("tag_prefixes")).isEmpty,
      "unpatched rows are byte-identical — no prefix recompute")
    assert(p3.getAs[Double]("importance") == 0.5)
  }

  test("applyPatches guards (ADVICE r16): duplicate-id batch fails loudly; " +
    "null merged metadata takes the handler's {} floor on patched rows") {
    import spark.implicits._
    val store = Seq(
      mem("p1", "content one", "2026-01-01 10:00:00", Seq("keep")),
      mem("p2", "content two", "2026-01-02 10:00:00", Seq("keep"))).toDF()
      // NULL stored metadata on both rows: p1 gets patched (no metadata in
      // the payload), p2 does not
      .withColumn("metadata", lit(null).cast("string"))
    val patches = Seq(("p1", 0.9)).toDF("id", "importance")
    val out = Ingest.applyPatches(store, patches).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("metadata")).toMap
    assert(out("p1") == "{}",
      "patched row with null merged metadata re-serializes as {} " +
        "(memory.py json.dumps(metadata or {}))")
    assert(out("p2") == null,
      "unpatched rows stay byte-identical — no {} rewrite")
    val dup = Seq(("p1", 0.9), ("p1", 0.8)).toDF("id", "importance")
    val e = intercept[Exception] {
      Ingest.applyPatches(store, dup).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(e).contains("more than one patch row"),
      s"expected the duplicate-id guard, got: ${messages(e).take(300)}")
    // ADVICE r17: two NULL-id patch rows are inert (null never equi-joins)
    // — they must pass the guard and leave the store untouched, not abort
    // the batch as a "duplicate"
    val nullIds = Seq((null.asInstanceOf[String], 0.9),
      (null.asInstanceOf[String], 0.8)).toDF("id", "importance")
    val outNull = Ingest.applyPatches(store, nullIds).collect()
    assert(outNull.length == 2, "null-id patches leave the store intact")
    assert(outNull.forall(_.getAs[Double]("importance") == 0.5),
      "null-id patch rows match no store row — nothing is patched")
  }
}
