package graft.domain

import java.sql.Timestamp

import graft.functions.TextFunctions
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Every `/recall` parameter the engine honors (reference param parse:
  * `/root/reference/automem/api/recall.py:1738-1915`). `now` is explicit so
  * recency scoring is deterministic in tests.
  */
case class RecallRequest(
    query: Option[String] = None,
    queries: Seq[String] = Nil,
    embedding: Option[Array[Float]] = None,
    limit: Int = 10,
    tags: Seq[String] = Nil,
    tagMode: String = "any",
    tagMatch: String = "exact",
    excludeTags: Seq[String] = Nil,
    start: Option[Timestamp] = None,
    end: Option[Timestamp] = None,
    sort: String = "score",
    minScore: Option[Double] = None,
    adaptiveFloor: Boolean = false,
    expandRelations: Boolean = false,
    expandEntities: Boolean = false,
    relationLimit: Int = 5,
    expansionLimit: Int = 25,
    expandMinStrength: Option[Double] = None,
    expandMinImportance: Option[Double] = None,
    expandRespectTags: Boolean = false,
    // multi-query: each sub-query runs with this as ITS limit and cuts its
    // ranked output to it before the aggregate re-rank
    // (`recall.py:1875-1887,2193-2199`; None = defaults to `limit`, the
    // reference's default — the per-query cut always applies)
    perQueryLimit: Option[Int] = None,
    stateMode: String = "all",
    // reference default is OFF (`config.py:586-589` RECALL_RECENCY_BIAS);
    // "auto" further requires temporal intent in the query
    recencyBias: String = "off",
    scopeFallback: Boolean = false,
    autoDecompose: Boolean = false,
    // engine extension (not in the reference): second-hop re-rank for
    // multi-hop questions — rows already retrieved that are entity-linked
    // to the top seeds get the entity-expansion boost. The reference's
    // expansion only INJECTS unseen rows (`recall.py:1606-1608` seen_ids),
    // so two-hop evidence that is already inside the tag-scoped seed pool
    // keeps whatever rank the direct query signals give it — usually deep.
    entityBridge: Boolean = false,
    weights: Scoring.Weights = Scoring.Weights(),
    relevanceGate: Option[Double] = None,
    priorityTags: Seq[String] = Nil,
    priorityTypes: Seq[String] = Nil,
    priorityIds: Seq[String] = Nil,
    contextKeywords: Seq[String] = Nil,
    // query-text embedder for the vector channel when no explicit
    // `embedding` is supplied; None = the placeholder hash provider. In
    // multi-query / auto-decompose mode each sub-query embeds its own text
    // through this, whereas `embedding` (a single vector) only makes sense
    // for single-query requests. The quality harnesses pass
    // LexicalEmbedding.embed so the vector channel carries real signal.
    queryEmbedder: Option[String => Array[Float]] = None,
    now: Timestamp = Timestamp.valueOf("2026-01-01 00:00:00"))

/** The flagship read path (SURVEY.md §3.1): channel union -> 9-component
  * scoring -> dedup -> sort -> expansion -> current-state -> recency re-rank
  * -> adaptive floor -> scope fallback -> relation hydration, compiled into
  * one DataFrame plan per request. Channel fan-out is a union of narrow
  * scans; everything up to the dedup window is shuffle-free; the final top-k
  * is a TakeOrderedAndProject. Driver-side actions are bounded by `limit`
  * (adaptive floor collect, scope-fallback count) exactly like the
  * reference's in-process post-processing.
  */
object Recall {

  val Stopwords: Set[String] = Set("the", "and", "for", "with", "that", "this",
    "from", "was", "are", "has", "had", "were", "will", "would", "into", "about")

  /** Keyword extraction (`automem/utils/text.py:81-101`): lowercase tokens,
    * >= 3 chars, stopword-filtered, deduped, order-preserving.
    */
  def keywords(query: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(query.toLowerCase).toSeq
      .filter(t => t.length >= 3 && !Stopwords.contains(t)).distinct

  val OverfetchFactor = 4
  val OverfetchCap = 200

  /** `RECALL_MAX_LIMIT` (`app.py:234`). */
  val RecallMaxLimit = 100

  private def overfetch(limit: Int): Int =
    math.min(limit * OverfetchFactor, OverfetchCap)

  /** Vector candidate pool size (`api/recall.py:1963-1977`): limit x 4
    * capped at 200; TAG-SCOPED queries (tag filters or priority tags, with
    * a query/embedding present) widen the pool to at least RECALL_MAX_LIMIT
    * — inside a scope the vector ranking is confounded by the scope itself,
    * so the richer final scoring needs a wider pool to re-rank.
    */
  def vectorFetchLimit(req: RecallRequest, hasQuery: Boolean): Int = {
    val base = math.max(req.limit, overfetch(req.limit))
    if ((req.tags.nonEmpty || req.priorityTags.nonEmpty) && hasQuery)
      math.max(req.limit,
        math.min(math.max(base, RecallMaxLimit), OverfetchCap))
    else base
  }

  /** Tag predicate (F2): any/all x exact/prefix; prefix matches against the
    * materialized tag_prefixes column (`runtime_recall_helpers.py:420-470`).
    */
  def tagPredicate(tags: Seq[String], mode: String, matchKind: String): Column = {
    val lower = tags.map(_.toLowerCase)
    val target = if (matchKind == "prefix") col("tag_prefixes") else col("tags")
    val lits = array(lower.map(lit): _*)
    if (mode == "all") forall(lits, t => array_contains(target, t))
    else arrays_overlap(target, lits)
  }

  /** F3 exclude-tags: drop if any tag equals or starts with an excluded tag. */
  def excludePredicate(excludeTags: Seq[String]): Column =
    if (excludeTags.isEmpty) lit(true)
    else !exists(col("tags"),
      t => excludeTags.map(e => t.startsWith(e.toLowerCase)).reduce(_ || _))

  /** Universal base filters F1/F3/F4/F5. */
  def baseFilter(df: DataFrame, req: RecallRequest): DataFrame = {
    var out = df
      .filter(coalesce(col("archived"), lit(false)) === false)
      .filter(!col("type").isin(Schema.RecallExcludedTypes: _*))
      .filter(excludePredicate(req.excludeTags))
    req.start.foreach(s => out = out.filter(col("timestamp") >= lit(s)))
    // half-open [start, end): TimeExpressions constructs exclusive end bounds
    // ('yesterday'/'today' must not overlap at midnight)
    req.end.foreach(e => out = out.filter(col("timestamp") < lit(e)))
    // derived partition predicate: a Layout-written corpus
    // (Layout.writeMemories) is date-partitioned on `day` =
    // date_format(timestamp). A row filter on `timestamp` alone cannot
    // prune those partitions (Spark prunes on partition COLUMNS), so the
    // time window is restated as day bounds — at 100 TB this is the
    // difference between scanning the window's days and scanning the
    // whole corpus. Redundant (never wrong) on non-layout frames that
    // happen to carry a day column derived the same way.
    // The bounds MUST be rendered in the Spark session timezone: Layout
    // derives the partition values with date_format (session TZ).
    // Formatting with the JVM default TZ instead shifts a bound by one
    // day whenever the two zones differ, silently pruning partitions that
    // hold in-window rows.
    def partitionBounds(column: String, pattern: String): Unit = {
      val zone = java.time.ZoneId.of(
        df.sparkSession.sessionState.conf.sessionLocalTimeZone)
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern(pattern).withZone(zone)
      req.start.foreach(s =>
        out = out.filter(col(column) >= lit(fmt.format(s.toInstant))))
      req.end.foreach(e =>
        out = out.filter(col(column) <= lit(fmt.format(e.toInstant))))
    }
    if (df.columns.contains(Layout.DayColumn))
      partitionBounds(Layout.DayColumn, "yyyy-MM-dd")
    if (df.columns.contains(Layout.MonthColumn))
      partitionBounds(Layout.MonthColumn, "yyyy-MM")
    out
  }

  private val channelCols = Seq("id", "match_type", "channel_score")

  /** Q1 vector channel: brute-force cosine top-(limit x overfetch);
    * per-partition top-k then merge (TakeOrderedAndProject) — the plan that
    * survives 100 TB. At larger deployments the same column works after an
    * LSH/IVF pre-filter (see graft.operators.Similarity).
    */
  def vectorChannel(scoped: DataFrame, qvec: Array[Float], limit: Int,
      fetchLimit: Option[Int] = None): DataFrame =
    scoped.withColumn("channel_score", cosineSim(col("embedding"), typedlit(qvec)))
      .withColumn("match_type", lit("vector"))
      .orderBy(desc("channel_score"), asc("id"))
      .limit(fetchLimit.getOrElse(overfetch(limit)))
      .select(channelCols.map(col): _*)

  /** Q3 keyword channel: +2 per keyword in content, +1 per keyword in any
    * tag, whole-phrase bonus (+2 content AND +1 tag — ADDITIVE, both can
    * fire), normalized to 0-1 by the THEORETICAL maximum
    * `3*|keywords| + (3 if phrase)` and clamped
    * (`runtime_recall_helpers.py:655-660,714-717` — NOT by the observed
    * candidate max, which would inflate weak matches to 1.0 whenever no
    * strong match exists). Stopword-only queries fall into the phrase-only
    * branch (max 3, `:683-700`). The constant divisor also needs no
    * max-aggregate pass over the candidates — one less exchange.
    */
  def keywordChannel(scoped: DataFrame, query: String, limit: Int): DataFrame = {
    val normalized = query.trim.toLowerCase
    val kws = keywords(query)
    val phrase = if (normalized.length >= 3 && normalized != "*") normalized else ""
    // empty / "*" / sub-3-char stopword-only queries redirect to TRENDING
    // (`runtime_recall_helpers.py:618-629,701-713`): importance-ordered
    // browse rows whose score (= importance) feeds the keyword component
    if (kws.isEmpty && phrase.isEmpty) return trendingChannel(scoped, limit)
    val lc = lower(col("content"))
    val contentHits = if (kws.isEmpty) lit(0)
      else kws.map(k => when(lc.contains(k), 2).otherwise(0)).reduce(_ + _)
    val tagHits = if (kws.isEmpty) lit(0)
      else kws.map(k =>
        when(exists(col("tags"), t => t.contains(k)), 1).otherwise(0)).reduce(_ + _)
    val phraseBonus = if (phrase.isEmpty) lit(0)
      else when(lc.contains(phrase), 2).otherwise(0) +
        when(exists(col("tags"), t => t.contains(phrase)), 1).otherwise(0)
    val maxRaw: Double =
      if (kws.nonEmpty) 3.0 * kws.length + (if (phrase.nonEmpty) 3.0 else 0.0)
      else 3.0
    scoped.withColumn("raw", contentHits + tagHits + phraseBonus)
      .filter(col("raw") > 0)
      .withColumn("channel_score", least(lit(1.0), col("raw") / lit(maxRaw)))
      .withColumn("match_type", lit("keyword"))
      .orderBy(desc("channel_score"), desc("importance"), desc("timestamp"), asc("id"))
      .limit(overfetch(limit))
      .select(channelCols.map(col): _*)
  }

  /** Q5 metadata channel: cheap contains-prefilter on the raw JSON string
    * using the reference's VALUE terms (query tokens minus field tokens and
    * metadata stopwords, capped at 12 — `runtime_recall_helpers.py:192-199`),
    * then the full strong-evidence re-score
    * (`runtime_recall_helpers.py:270-340` via [[MetadataScoring]]) on the
    * capped survivor set only.
    */
  def metadataChannel(scoped: DataFrame, query: String, limit: Int): DataFrame = {
    val terms = MetadataScoring.prefilterTerms(query)
    if (terms.isEmpty) return scoped.sparkSession.emptyDataFrame
      .withColumn("id", lit("")).withColumn("match_type", lit(""))
      .withColumn("channel_score", lit(0.0)).limit(0)
    val scanCap = math.max(200, math.min(limit * 25, 1000))
    val scoreUdf = udf((json: String) => MetadataScoring.matchScore(query, json))
    // deterministic cap: order by id before limiting (TakeOrderedAndProject)
    // so the scanned subset does not depend on partition order — the
    // reference's cap is arbitrary-order, but our determinism contract
    // (NOTES.md) pins which rows survive
    scoped.filter(terms.map(t => lower(col("metadata")).contains(t)).reduce(_ || _))
      .orderBy(asc("id"))
      .limit(scanCap)
      .withColumn("channel_score", scoreUdf(col("metadata")))
      .filter(col("channel_score") > 0.0)
      .withColumn("match_type", lit("metadata"))
      .orderBy(desc("channel_score"), asc("id"))
      .limit(overfetch(limit))
      .select(channelCols.map(col): _*)
  }

  /** Q2 tag-only channel (no query): score := importance. */
  def tagOnlyChannel(scoped: DataFrame, limit: Int): DataFrame =
    scoped.withColumn("channel_score", col("importance"))
      .withColumn("match_type", lit("tag"))
      .orderBy(desc("channel_score"), desc("timestamp"), asc("id"))
      .limit(overfetch(limit))
      .select(channelCols.map(col): _*)

  /** Q4 trending fallback (`runtime_recall_helpers.py:524-595`): importance-
    * ordered browse results, match_type "trending", score := importance —
    * which the scorer folds into the keyword component
    * (`scoring.py:186-190`).
    */
  def trendingChannel(scoped: DataFrame, limit: Int): DataFrame =
    scoped.withColumn("channel_score", col("importance"))
      .withColumn("match_type", lit("trending"))
      .orderBy(desc("importance"), desc("timestamp"), asc("id"))
      .limit(overfetch(limit))
      .select(channelCols.map(col): _*)

  /** Run one query through all channels and score it (SURVEY §3.1 steps
    * 3b-3g). Returns the scored candidate set before expansion.
    */
  def runSingleQuery(memories: DataFrame, req: RecallRequest,
      queryOpt: Option[String]): DataFrame = {
    val base = baseFilter(memories, req)
    val scoped = if (req.tags.nonEmpty)
      base.filter(tagPredicate(req.tags, req.tagMode, req.tagMatch)) else base
    val qvecOpt = req.embedding.orElse(
      queryOpt.map(q =>
        req.queryEmbedder.getOrElse(PlaceholderEmbedding.embed(_: String))(q)))
    val chans = Seq(
      qvecOpt.map(v => vectorChannel(scoped, v, req.limit,
        Some(vectorFetchLimit(req, hasQuery = true)))),
      queryOpt.map(q => keywordChannel(scoped, q, req.limit)),
      queryOpt.map(q => metadataChannel(scoped, q, req.limit)),
      if (queryOpt.isEmpty && req.tags.nonEmpty) Some(tagOnlyChannel(scoped, req.limit))
      else None).flatten.filter(_.columns.nonEmpty)
    if (chans.isEmpty) return scoped.limit(0)
      .withColumn("final_score", lit(0.0)).withColumn("match_type", lit(""))
    // union channels; best score per channel per id (seen-id semantics 2.8)
    val union = chans.reduce(_ unionByName _)
    val perId = union.groupBy(col("id")).agg(
      max(when(col("match_type") === "vector", col("channel_score"))).as("vector_score"),
      max(when(col("match_type") === "keyword", col("channel_score"))).as("keyword_score"),
      max(when(col("match_type") === "metadata", col("channel_score"))).as("metadata_score"),
      max(when(col("match_type") === "trending", col("channel_score"))).as("trending_score"),
      max(when(col("match_type") === "tag", col("channel_score"))).as("tagonly_score"))
      .withColumn("match_type",
        when(col("vector_score").isNotNull, "vector")
          .when(col("keyword_score").isNotNull, "keyword")
          .when(col("metadata_score").isNotNull, "metadata")
          .when(col("trending_score").isNotNull, "trending")
          .otherwise("tag"))
    val hydrated = perId.join(scoped, Seq("id"))
    scoreCandidates(hydrated, req, queryOpt)
  }

  /** 9-component scoring + final score (SURVEY §2.5). The relation component
    * comes from a `relation_score` column when the caller provides one
    * (expanded candidates carry strength + 0.25 x seed score); channel
    * results have none and score 0 (`scoring.py:239-245`).
    */
  def scoreCandidates(df: DataFrame, req: RecallRequest,
      queryOpt: Option[String]): DataFrame = {
    val kws = queryOpt.map(keywords).getOrElse(Nil)
    val lc = lower(col("content"))
    val ageDays = (unix_timestamp(lit(req.now)) - unix_timestamp(col("timestamp"))) / 86400.0
    val relationComp =
      if (df.columns.contains("relation_score")) coalesce(col("relation_score"), lit(0.0))
      else lit(0.0)
    // metadata TERM SET (scoring.py:40-63): feeds both the tag component
    // (token in tags OR metadata terms, scoring.py:150-153) and the exact
    // component (whole query in the term set, scoring.py:155-158 — NOT a
    // substring probe on raw JSON, which fires on key names / across token
    // boundaries). Scalar walk over the bounded candidate set only.
    val termsUdf = udf((json: String) => MetadataScoring.collectTerms(json).toSeq)
    val mdTerms = col("_md_terms")
    val termSet = array_union(col("tags"), mdTerms)
    // trending rows fold their importance score into the keyword component
    // (`scoring.py:186-190`: match_type in {keyword, trending} -> clamped
    // match_score); rows claimed by an earlier channel keep the fallback
    // (the reference's seen_ids dedup never hands them to trending)
    val trendingComp =
      if (df.columns.contains("trending_score"))
        when(col("match_type") === "trending",
          least(lit(1.0), col("trending_score")))
      else lit(null).cast("double")
    val comps = Scoring.ComponentColumns(
      vector = coalesce(col("vector_score"), lit(0.0)),
      keyword = coalesce(col("keyword_score"), trendingComp,
        Scoring.keywordFallback(kws, lc)),
      metadata = coalesce(col("metadata_score"), lit(0.0)),
      relation = relationComp,
      tag = Scoring.tagScore(kws, termSet),
      importance = coalesce(col("importance"), lit(0.0)),
      confidence = coalesce(col("confidence"), lit(0.0)),
      recency = Scoring.recency(ageDays),
      exact = queryOpt.map { q =>
        val nq = q.toLowerCase.trim
        if (nq.isEmpty) lit(0.0)
        else when(array_contains(mdTerms, nq), lit(1.0)).otherwise(lit(0.0))
      }.getOrElse(lit(0.0)),
      relevance = coalesce(col("relevance_score"), lit(0.0)),
      context = Scoring.contextBonus(col("tags"), col("type"), mdTerms,
        col("id"), req.priorityTags, req.priorityTypes, req.contextKeywords,
        req.priorityIds))
    df.withColumn("_md_terms", termsUdf(col("metadata")))
      .withColumn("s_vector", comps.vector)
      .withColumn("s_keyword", comps.keyword)
      .withColumn("s_tag", comps.tag)
      .withColumn("s_recency", comps.recency)
      .withColumn("final_score",
        Scoring.finalScore(comps, req.weights, req.relevanceGate))
      .drop("_md_terms")
  }

  /** R1 dedup by id then by 320-char normalized content fingerprint, keeping
    * the highest score (tie -> newest), recording merged ids
    * (`recall.py:310-389`).
    */
  def dedup(df: DataFrame): DataFrame = {
    val fp = TextFunctions.fingerprint(col("content"), 320)
    val w = Window.partitionBy(col("_fp"))
      .orderBy(desc("final_score"), desc("timestamp"), asc("id"))
    // re-applicable (the reference dedups per sub-query AND after the
    // aggregate union, `recall.py:2094,2216`): provenance ACCUMULATES — the
    // survivor's deduped_from is the union of every group member's prior
    // provenance plus the other merged ids. (The reference's own two-pass
    // behavior is order-dependent here — same-id re-occurrences can
    // self-reference or drop prior sources depending on arrival order,
    // `recall.py:355-387`; the accumulate rule is the determinism-over-
    // arbitrary choice, like the other documented divergences.)
    // collect_list skips NULLs, so rows injected via unionByName with
    // allowMissingColumns (R5 priority fetch) fold in as empty provenance.
    val prior: Column =
      if (df.columns.contains("deduped_from")) col("deduped_from")
      else lit(null).cast("array<string>")
    val wFp = Window.partitionBy(col("_fp"))
    df.withColumn("_fp", when(length(fp) > 0, fp).otherwise(col("id")))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prov",
        flatten(collect_list(prior).over(wFp)))
      .withColumn("_sources", collect_set(col("id")).over(wFp))
      .filter(col("_rn") === 1)
      .withColumn("deduped_from",
        array_sort(array_remove(
          array_distinct(concat(col("_prov"), col("_sources"))), col("id"))))
      .drop("_fp", "_rn", "_prov", "_sources")
  }

  /** Rank of an id within the requested priority list (1-based; absent ->
    * MaxValue), the `_guarantee_priority_results` sort key
    * (`recall.py:1273-1312`).
    */
  private def priorityRank(priorityIds: Seq[String]): Column =
    if (priorityIds.isEmpty) lit(0L)
    else {
      val pos = array_position(typedlit(priorityIds), col("id"))
      when(pos > 0, pos).otherwise(lit(Long.MaxValue))
    }

  /** Request sort key (R2): `score` ranks by the weighted score tuple
    * (`recall.py:420-434`); the time modes rank by the lexicographic
    * timestamp tuple — prefer updated_at, then timestamp, then
    * last_accessed (`recall.py:1928-1937`), whole tuple reversed for the
    * desc variants exactly like the reference's `reverse=True`.
    */
  private def sortKey(req: RecallRequest): Seq[Column] = {
    val primary = coalesce(col("updated_at"), col("timestamp"), col("last_accessed"))
    val secondary = coalesce(col("timestamp"), col("updated_at"), col("last_accessed"))
    req.sort match {
      case "time_desc" | "updated_desc" =>
        Seq(primary.desc, secondary.desc, col("id").desc)
      case "time_asc" | "updated_asc" =>
        Seq(primary.asc, secondary.asc, col("id").asc)
      case _ =>
        Seq(desc("final_score"),
          when(col("match_type") === "vector", 0).otherwise(1).asc,
          desc("importance"), desc("timestamp"), asc("id"))
    }
  }

  /** R2 score-sort key: final desc, vector-channel first, importance desc,
    * timestamp desc (`recall.py:420-434`). One definition — the default
    * branch of [[sortKey]] — so the main ranking and the scope-fallback
    * fill ranking can never drift apart.
    */
  def scoreSort(df: DataFrame): DataFrame =
    df.orderBy(sortKey(RecallRequest(sort = "score")): _*)

  /** J2 graph expansion (`recall.py:1498-1700`): undirected 1-hop from the
    * seed results over whitelisted relation types, per-seed top-k by
    * strength, global cap, dedup keeping the max relation score. Expanded
    * candidates carry relation_score = strength + 0.25 * max(seed_score, 0)
    * and are re-scored through the FULL 9-component formula with
    * match_type = "relation" (`recall.py:1686-1698`) — the relation
    * component (weight 0.25) enters alongside keyword fallback, tag,
    * importance, confidence, and recency. Seeds are <= limit rows ->
    * broadcast to the edge join.
    */
  def expand(results: DataFrame, memories: DataFrame, edges: DataFrame,
      req: RecallRequest): DataFrame = {
    val strength = coalesce(col("strength"), col("score"), col("confidence"),
      col("similarity"), col("count").cast("double"), lit(0.0))
    val undirected = edges.select(col("src"), col("dst"), col("rel_type"),
        strength.as("strength"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"),
        col("rel_type"), strength.as("strength")))
      .filter(col("rel_type").isin(Schema.DefaultExpandRelations: _*))
    val seeds = results.select(col("id").as("seed_id"),
      col("final_score").as("seed_score"))
    val w = Window.partitionBy(col("seed_id"))
      .orderBy(desc("strength"), asc("dst"))
    var hop = undirected.join(broadcast(seeds), col("src") === col("seed_id"))
    req.expandMinStrength.foreach(m => hop = hop.filter(col("strength") >= m))
    val picked = hop.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= req.relationLimit)
      .withColumn("relation_score",
        col("strength") + lit(0.25) * greatest(col("seed_score"), lit(0.0)))
      .groupBy(col("dst"))
      .agg(max(col("relation_score")).as("relation_score"),
        min(col("rel_type")).as("via_rel"))
      .join(results.select(col("id").as("dst")), Seq("dst"), "left_anti")
    // expanded-only filters (`recall.py:1620-1643`): min importance and
    // (opt-in) the request's tag scope; applied BEFORE the expansion cap so
    // rejected candidates do not consume cap slots
    var mem = baseFilter(memories, req)
    if (req.expandRespectTags && req.tags.nonEmpty)
      mem = mem.filter(tagPredicate(req.tags, req.tagMode, req.tagMatch))
    req.expandMinImportance.foreach(m =>
      mem = mem.filter(coalesce(col("importance"), lit(0.0)) >= m))
    val hydrated = picked.join(mem, picked("dst") === mem("id"))
      .drop("dst")
      .withColumn("match_type", lit("relation"))
      .withColumn("vector_score", lit(null).cast("double"))
      .withColumn("keyword_score", lit(null).cast("double"))
      .withColumn("metadata_score", lit(null).cast("double"))
    scoreCandidates(hydrated, req, req.query)
      .orderBy(desc("relation_score"), asc("id"))
      .limit(req.expansionLimit)
  }

  /** J3 entity expansion (`recall.py:1337-1495`): extract entity names from
    * the seed results (metadata.entities people/places/organizations +
    * `entity:people:` tags), take <= 5 (sorted for determinism where the
    * reference iterates an unordered set), prefix-search
    * `entity:people:{slug}` tags for <= limitPerEntity rows each (tag-only
    * channel: ranked by importance), score through the full formula and add
    * the flat 0.15 entity boost. Seeds are bounded (<= limit + expansion
    * rows), so extraction is a driver-side collect exactly like the
    * reference's in-process loop.
    */
  def expandEntities(results: DataFrame, memories: DataFrame,
      req: RecallRequest, limitPerEntity: Int = 5): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val metaNames = Seq("people", "places", "organizations").map(c =>
      coalesce(from_json(get_json_object(col("metadata"), s"$$.entities.$c"),
        ArrayType(StringType)), array()))
    val tagNames = transform(
      filter(col("tags"), t => t.startsWith("entity:people:")),
      t => regexp_replace(element_at(split(t, ":"), -1), "-", " "))
    val entities = results
      .select(explode(concat(metaNames :+ tagNames: _*)).as("name"))
      .select(lower(trim(col("name"))).as("name"))
      .filter(length(col("name")) > 1)
      .distinct().collect().map(_.getString(0))
      .sorted.take(5)
    if (entities.isEmpty)
      return results.limit(0).withColumn("expanded_from_entity", lit(""))
    val base = baseFilter(memories, req)
    // the request tag scope applies to entity-expanded rows only when
    // expandRespectTags asks for it (`recall.py:2273-2297`)
    val scoped = if (req.expandRespectTags && req.tags.nonEmpty)
      base.filter(tagPredicate(req.tags, req.tagMode, req.tagMatch)) else base
    val perEntity = entities.zipWithIndex.map { case (ent, i) =>
      val slug = ent.replaceAll("\\s+", "-")
      scoped.filter(tagPredicate(Seq(s"entity:people:$slug"), "any", "prefix"))
        .orderBy(desc("importance"), desc("timestamp"), asc("id"))
        .limit(limitPerEntity)
        .withColumn("_e_idx", lit(i))
        .withColumn("expanded_from_entity", lit(ent))
    }
    // first-entity-wins per id (the reference's seen_ids threading), then the
    // full 9-component score + flat 0.15 entity boost
    val wFirst = Window.partitionBy(col("id")).orderBy(asc("_e_idx"))
    val picked = perEntity.reduce(_ unionByName _)
      .join(results.select(col("id")), Seq("id"), "left_anti")
      .withColumn("_rn", row_number().over(wFirst))
      .filter(col("_rn") === 1)
      .drop("_rn", "_e_idx")
      .withColumn("match_type", lit("entity_expansion"))
      .withColumn("vector_score", lit(null).cast("double"))
      .withColumn("keyword_score", lit(null).cast("double"))
      .withColumn("metadata_score", lit(null).cast("double"))
    scoreCandidates(picked, req, req.query)
      .withColumn("final_score", col("final_score") + lit(0.15))
      .orderBy(desc("final_score"), asc("id"))
      .limit(req.expansionLimit)
  }

  /** Second-hop entity-bridge re-rank (engine extension; see
    * [[RecallRequest.entityBridge]]). Bridge entities are collected from the
    * TOP seeds in rank order (first-seen wins, like the reference's
    * expansion iterates ranked seeds — `recall.py:1404-1430` — not
    * alphabetically), then every retrieved row that MENTIONS one
    * (`entity:<category>:<slug>` tag — people, places, or organizations,
    * the same categories the collect reads — or metadata entity) or is
    * SPOKEN by one (`speaker:<slug>` tag) gets the flat entity boost the injected
    * expansion rows already get. This is what ranks the second hop of
    * "What job does Elena's brother have?": the seeds name the brother, the
    * brother's own utterances carry the answer, and those rows are already
    * inside the tag-scoped pool where the reference's seen-ids expansion
    * can never lift them.
    */
  def entityBridgeBoost(df: DataFrame, req: RecallRequest, topN: Int = 10,
      maxEntities: Int = 5, boost: Double = 0.15): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val cats = Seq("people", "places", "organizations")
    val metaNames = cats.map(c =>
      coalesce(from_json(get_json_object(col("metadata"), s"$$.entities.$c"),
        ArrayType(StringType)), array()))
    // coalesce: transform(filter(null, ...)) is null, and a null element in
    // concat() nulls the whole array — a single null-tags seed row would
    // otherwise NPE the driver-side getSeq below (ADVICE r7)
    val tagNames = coalesce(transform(
      filter(col("tags"), t => cats.map(c =>
        t.startsWith(s"entity:$c:")).reduce(_ || _)),
      t => regexp_replace(element_at(split(t, ":"), -1), "-", " ")), array())
    val ranked = df.orderBy(sortKey(req.copy(sort = "score")): _*).limit(topN)
      .select(concat(metaNames :+ tagNames: _*).as("names")).collect()
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    ranked.foreach(r => Option(r.getSeq[String](0)).getOrElse(Nil).foreach { n =>
      val slug = n.toLowerCase.trim.replaceAll("\\s+", "-")
      if (slug.length > 1) seen += slug
    })
    val slugs = seen.take(maxEntities).toSeq
    if (slugs.isEmpty) df
    else {
      // exact tag equality, not startsWith: seed slug "tom" must not boost
      // entity:people:tomas (ADVICE r7); every collected category is probed
      val hit = slugs.map(s => exists(col("tags"), t =>
        cats.map(c => t === s"entity:$c:$s").reduce(_ || _) ||
          t === s"speaker:$s"))
        .reduce(_ || _)
      df.withColumn("final_score",
        when(hit, col("final_score") + lit(boost)).otherwise(col("final_score")))
    }
  }

  /** Entity identity injection (`recall.py:2454-2491`): gather entity slugs
    * from the query's capitalized entities and the `entity:` tags of the
    * top-10 results (<= 10 slugs, sorted for determinism), then one filter
    * over the entities relation: unmerged rows with a written identity whose
    * slug or alias matches. Returned as the side relation the reference
    * attaches to the response.
    */
  def entityIdentities(results: DataFrame, entities: DataFrame,
      queryOpt: Option[String]): DataFrame = {
    val fromQuery = queryOpt.toSeq.flatMap(q =>
      "\\b[A-Z][a-z]{2,}\\b".r.findAllIn(q).map(_.toLowerCase.replaceAll("\\s+", "-")))
    val fromTags = results.limit(10).select(col("tags")).collect()
      .flatMap(_.getSeq[String](0))
      .filter(_.startsWith("entity:")).map(_.split(":"))
      .collect { case parts if parts.length >= 3 => parts(2) }
    val slugs = (fromQuery ++ fromTags).distinct.sorted.take(10)
    if (slugs.isEmpty) return entities.limit(0)
    var out = entities.filter(col("identity").isNotNull)
    if (entities.columns.contains("merged_into"))
      out = out.filter(col("merged_into").isNull)
    val slugMatch = col("slug").isin(slugs: _*)
    val aliasMatch =
      if (entities.columns.contains("aliases"))
        arrays_overlap(coalesce(col("aliases"),
          array().cast("array<string>")), typedlit(slugs))
      else lit(false)
    out.filter(slugMatch || aliasMatch)
  }

  /** R3 recency-bias re-rank (`recall.py:2315-2349`): min-max normalize
    * candidate epochs, add 0.1 x relative recency. `auto` applies only when
    * the query shows temporal intent (`automem/utils/time.py:10-27`).
    */
  def recencyRerank(df: DataFrame, req: RecallRequest): DataFrame = {
    val temporalIntent = req.query.exists(TimeExpressions.hasTemporalIntent)
    val apply = req.recencyBias == "on" || (req.recencyBias == "auto" && temporalIntent)
    if (!apply) df
    else {
      val epoch = unix_timestamp(col("timestamp"))
      val bounds = df.agg(min(epoch).as("_min_ep"), max(epoch).as("_max_ep"))
      val span = col("_max_ep") - col("_min_ep")
      // spread == 0 contributes NOTHING (`recall.py:2337` guards on
      // spread > 0) — a uniform constant would preserve order but shift
      // every final_score off the reference values
      df.crossJoin(broadcast(bounds))
        .withColumn("final_score",
          col("final_score") + lit(0.1) *
            when(span === 0, 0.0).otherwise((epoch - col("_min_ep")) / span))
        .drop("_min_ep", "_max_ep")
    }
  }

  /** R4 adaptive score floor (`recall.py:2351-2375`): largest gap in the top
    * half; cut below when the gap exceeds 25% of the top score and at least
    * half survive. Bounded driver-side computation (candidate set <= limit +
    * expansionLimit).
    */
  def adaptiveFloor(df: DataFrame): DataFrame = {
    val scores = df.select(col("final_score")).collect().map(_.getDouble(0))
      .sorted(Ordering[Double].reverse)
    val n = scores.length
    if (n <= 3) return df
    // largest gap between consecutive scores in the top half (first max wins
    // ties), floor at the score BELOW the gap; cut only when the gap exceeds
    // 25% of the top score and at least ceil(n/2) rows survive
    val halfway = math.max(3, n / 2)
    var maxGap = 0.0
    var gapIdx = -1
    var i = 1
    while (i < halfway) {
      val gap = scores(i - 1) - scores(i)
      if (gap > maxGap) { maxGap = gap; gapIdx = i }
      i += 1
    }
    if (maxGap > 0.25 * scores(0) && gapIdx > 0) {
      val floor = scores(gapIdx)
      val retained = scores.count(_ >= floor)
      if (retained >= (n + 1) / 2) df.filter(col("final_score") >= floor) else df
    } else df
  }

  /** J1 relation hydration for the final survivors (`runtime_relations.py:
    * 21-76`): per result, top-`relationLimit` outgoing edges joined to their
    * target memory summary, newest first. Join-after-limit: only the final
    * top-k rows reach this join.
    */
  def hydrateRelations(results: DataFrame, memories: DataFrame, edges: DataFrame,
      relationLimit: Int): DataFrame = {
    val strength = coalesce(col("strength"), col("score"), col("confidence"),
      col("similarity"), col("count").cast("double"), lit(0.0))
    val ids = results.select(col("id").as("rid"))
    val w = Window.partitionBy(col("rid")).orderBy(desc("rel_updated"), asc("dst"))
    val rel = edges.join(broadcast(ids), col("src") === col("rid"))
      .select(col("rid"), col("dst"), col("rel_type"), strength.as("strength"),
        coalesce(col("updated_at")).as("rel_updated"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= relationLimit)
    val relWithTarget = rel.join(memories.select(col("id").as("dst"),
        col("type").as("rel_target_type"),
        substring(col("content"), 1, 160).as("rel_snippet")), Seq("dst"), "left")
      .groupBy(col("rid"))
      .agg(collect_list(struct(col("dst").as("id"), col("rel_type"),
        col("strength"), col("rel_target_type"), col("rel_snippet"))).as("relations"))
    results.join(relWithTarget, results("id") === relWithTarget("rid"), "left")
      .drop("rid")
  }

  /** Q6 auto-decompose (`recall.py:152-307,2151-2199`): extract capitalized
    * entities and topic keywords from the query and fabricate entity x topic
    * sub-queries alongside the original.
    */
  /** Question-word / month / weekday / demonym capitals that are never
    * query entities (`api/recall.py:90-148` ENTITY_STOPWORDS).
    */
  val EntityStopwords: Set[String] = Set(
    "What", "Would", "Could", "Does", "Did", "How", "Why", "When", "Where",
    "Which", "Who", "Whose", "Will", "Can", "Should", "Has", "Have", "Had",
    "Is", "Are", "Was", "Were", "Do", "Been", "Being", "The", "Answer",
    "Yes", "No", "Likely", "Based", "According", "Since", "Because",
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December", "Monday",
    "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday",
    "National", "American", "European", "Asian", "African")

  /** Filler words excluded from topic keywords (`api/recall.py:212-292`). */
  private val TopicSkipWords: Set[String] = Set(
    "would", "could", "should", "will", "can", "may", "might", "does",
    "did", "has", "have", "had", "is", "are", "was", "were", "be", "been",
    "being", "the", "a", "an", "to", "for", "of", "in", "on", "at", "by",
    "with", "about", "as", "if", "or", "and", "but", "what", "which",
    "who", "whom", "whose", "where", "when", "why", "how", "this", "that",
    "these", "those", "it", "its", "they", "them", "their", "he", "she",
    "his", "her", "him", "likely", "probably", "possibly", "considered",
    "pursue", "want", "like", "prefer", "interested", "still", "ever",
    "more", "most", "some", "any", "all", "only")

  private val PossessiveName = "\\b([A-Z][a-z]+)['’]s\\b".r

  /** Named-entity extraction from a QUERY (`api/recall.py:152-195`):
    * capitalized mid-sentence words (never the first word or one following
    * `.?!`), possessives handled separately (ASCII and curly apostrophes),
    * stopword-gated. The reference returns `list(set(...))` — arbitrary
    * order; we keep first-occurrence order (determinism contract).
    */
  def extractQueryEntities(query: String): Seq[String] = {
    if (query == null || query.isEmpty) return Nil
    val words = query.split("\\s+").filter(_.nonEmpty)
    val found = scala.collection.mutable.LinkedHashSet.empty[String]
    for (i <- words.indices) {
      val word = words(i)
      val clean = word.replaceAll("[^\\w]", "")
      // Python clean[1:].islower(): every cased char lower, at least one
      val tailLower = clean.length > 1 && clean.tail.exists(_.isLetter) &&
        clean.tail.filter(_.isLetter).forall(_.isLower) &&
        !clean.tail.exists(_.isUpper)
      if (clean.length >= 2 && !EntityStopwords.contains(clean) &&
        !word.contains("'s") && !word.contains("’s") &&
        clean.head.isUpper && tailLower &&
        i != 0 && !".?!".contains(words(i - 1).last))
        found += clean
    }
    for (m <- PossessiveName.findAllMatchIn(query)) {
      val p = m.group(1)
      if (!EntityStopwords.contains(p)) found += p
    }
    found.toSeq
  }

  /** Topic keywords from a query (`api/recall.py:198-307`): 4+-letter
    * lowercase words minus fillers minus the entities, first-occurrence
    * order, max 5.
    */
  def extractTopicKeywords(query: String,
      excludeEntities: Seq[String] = Nil): Seq[String] = {
    if (query == null || query.isEmpty) return Nil
    val exclude = excludeEntities.map(_.toLowerCase).toSet
    "\\b[a-z]{4,}\\b".r.findAllIn(query.toLowerCase).toSeq
      .filter(w => !TopicSkipWords.contains(w) && !exclude.contains(w))
      .distinct.take(5)
  }

  /** Q6 auto-decompose (`api/recall.py:2150-2186`): original query first,
    * then per entity (max 2): the entity alone, entity x topic (topics[:3]),
    * and `"<entity> interests goals plans"` when the query asks about
    * career/job/work; topic-only sub-queries when no entity was found.
    */
  def autoDecompose(query: String): Seq[String] = {
    val entities = extractQueryEntities(query)
    val topics = extractTopicKeywords(query, entities)
    val decomposed = scala.collection.mutable.ArrayBuffer.empty[String]
    for (entity <- entities.take(2)) {
      decomposed += entity
      topics.take(3).foreach(t => decomposed += s"$entity $t")
      // bug-for-bug faithful: the reference tests TOPICS (`recall.py:2173`),
      // and its topic extractor also only emits 4+-letter words
      // (`recall.py:296` \b[a-z]{4,}\b) — so "job" can never fire there
      // either; "fixing" this here would diverge from reference rankings
      if (Seq("career", "job", "work").exists(topics.contains))
        decomposed += s"$entity interests goals plans"
    }
    if (entities.isEmpty && topics.nonEmpty)
      topics.take(3).foreach(decomposed += _)
    if (decomposed.nonEmpty) query +: decomposed.toSeq else Seq(query)
  }

  /** Full recall pipeline (SURVEY §3.1). Returns the ranked result set with
    * score components, provenance, and (optionally) hydrated relations.
    */
  def recall(memories: DataFrame, edges: DataFrame, rawReq: RecallRequest): DataFrame = {
    // reference guard rails: limit in [1, RecallMaxLimit]
    // (`recall.py:1749-1752`, `app.py:234`), relation_limit in [1,200],
    // expansion_limit in [1,500] (`recall.py:1875-1887` — both sides clamp)
    val req = rawReq.copy(
      limit = math.max(1, math.min(rawReq.limit, RecallMaxLimit)),
      relationLimit = math.max(1, math.min(rawReq.relationLimit, 200)),
      expansionLimit = math.max(1, math.min(rawReq.expansionLimit, 500)))
    val queriesToRun: Seq[Option[String]] =
      if (req.queries.nonEmpty) req.queries.map(Some(_))
      else if (req.autoDecompose && req.query.isDefined)
        autoDecompose(req.query.get).map(Some(_))
      else Seq(req.query)
    // per_query_limit defaults to limit and is handed to `_run_single_query`
    // as ITS limit (`recall.py:2193-2199, 2207-2209`): channels overfetch
    // from pq, and each sub-query's ranked output cuts to pq
    // (`_guarantee_priority_results(..., per_query_limit)` = [:pq]) — then
    // the aggregate dedups and re-ranks the union (`recall.py:2216-2223`)
    val pq = math.max(1,
      math.min(req.perQueryLimit.getOrElse(req.limit), RecallMaxLimit))
    val subReq = req.copy(limit = pq)
    val perQuery = queriesToRun.map { q =>
      // reference per-query flow (`_rank_local_results` + cut): min_score ->
      // dedup -> sort -> [:pq]
      val scored = runSingleQuery(memories, subReq, q)
      val gated = req.minScore match {
        case Some(m) => scored.filter(col("final_score") >= m)
        case None => scored
      }
      dedup(gated).orderBy(sortKey(req): _*).limit(pq)
    }
    var agg = perQuery.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    // R5 priority injection (`recall.py:1094-1270`): priority ids absent from
    // every channel are fetched directly; priority tags contribute up to
    // max(1, min(limit, 3)) rows by importance. Injected rows pass the same
    // base/tag/time filters and the same 9-component scoring as channel rows
    // (the reference re-ranks with filters after injecting,
    // `recall.py:2066-2143`).
    if (req.priorityIds.nonEmpty || req.priorityTags.nonEmpty) {
      val base = baseFilter(memories, req)
      val scoped = if (req.tags.nonEmpty)
        base.filter(tagPredicate(req.tags, req.tagMode, req.tagMatch)) else base
      val byId = if (req.priorityIds.isEmpty) None
        else Some(scoped.filter(col("id").isin(req.priorityIds: _*)))
      val byTag = if (req.priorityTags.isEmpty) None
        else Some(scoped
          .filter(tagPredicate(req.priorityTags, "any", "prefix"))
          .orderBy(desc("importance"), desc("timestamp"), asc("id"))
          .limit(math.max(1, math.min(req.limit, 3))))
      val fetched = (byId.toSeq ++ byTag.toSeq).reduce(_ unionByName _)
        .dropDuplicates("id")
        .join(agg.select(col("id")), Seq("id"), "left_anti")
        .withColumn("match_type", lit("priority_id"))
        .withColumn("vector_score", lit(null).cast("double"))
        .withColumn("keyword_score", lit(null).cast("double"))
        .withColumn("metadata_score", lit(null).cast("double"))
      agg = agg.unionByName(scoreCandidates(fetched, req, req.query),
        allowMissingColumns = true)
    }
    agg = dedup(agg)
    req.minScore.foreach(m => agg = agg.filter(col("final_score") >= m))
    // priority guarantee ordering (`recall.py:1273-1312`): requested priority
    // ids come first (in request order), the rest follow in score order
    val prioRank = priorityRank(req.priorityIds)
    agg = agg.orderBy(prioRank.asc +: sortKey(req): _*).limit(req.limit)
    // the bounded (<= limit rows) result set is re-consumed by driver-side
    // actions — the entity collect, the scope-fallback count, and the
    // adaptive-floor score collect. localCheckpoint (NOT cache) materializes
    // the channel-union DAG exactly once without registering a CacheManager
    // entry: `agg` is reassigned below, so a plain cache() could never be
    // unpersisted and a long-lived session would accumulate one cached plan
    // per recall call (same leak class fixed in Supersession.resolveHeads).
    // TRADEOFF (ADVICE r6): localCheckpoint is eager and TRUNCATES lineage
    // with unreplicated blocks — on a cluster, losing an executor mid-query
    // fails the recall instead of recomputing. Acceptable for an
    // interactive ≤limit-row result (the caller just retries); a
    // long-running cluster job that cannot tolerate a retry should use
    // reliable checkpointing (sc.setCheckpointDir + checkpoint()) here.
    if (req.scopeFallback || req.expandEntities || req.adaptiveFloor ||
        req.entityBridge)
      agg = agg.localCheckpoint()
    if (req.expandRelations) {
      val expanded = expand(agg, memories, edges, req)
      agg = agg.unionByName(expanded, allowMissingColumns = true)
    }
    if (req.expandEntities) {
      // seeds include relation-expanded rows (`recall.py:2270-2272`)
      val expandedE = expandEntities(agg, memories, req)
      agg = agg.unionByName(expandedE, allowMissingColumns = true)
    }
    if (req.entityBridge) agg = entityBridgeBoost(agg, req)
    if (req.stateMode == "current") {
      agg = Supersession.applyCurrentState(agg, memories, edges, req.now)
      // replacement rows re-check the REQUEST filters
      // (`recall.py:690-700`: the injected candidate must pass
      // result_passes_filters with the original time/tag/exclude scope) —
      // a head outside the request's tag or time scope is dropped, not
      // smuggled in under its superseded source's colors
      val replOk = excludePredicate(req.excludeTags) &&
        !col("type").isin(Schema.RecallExcludedTypes: _*) &&
        req.start.map(s => col("timestamp") >= lit(s)).getOrElse(lit(true)) &&
        req.end.map(e => col("timestamp") < lit(e)).getOrElse(lit(true)) &&
        (if (req.tags.nonEmpty) tagPredicate(req.tags, req.tagMode, req.tagMatch)
         else lit(true))
      agg = agg.filter(col("superseded_from").isNull || replOk)
    }
    agg = recencyRerank(agg, req)
    if (req.adaptiveFloor) agg = adaptiveFloor(agg)
    req.minScore.foreach(m => agg = agg.filter(col("final_score") >= m))
    // R6 scope fallback (`api/recall.py:800-870`): fills keep filter parity
    // with the scoped path (time/exclude-tags via the base filter,
    // min_score, current-state) — only the tag scope is lifted. An IN-SCOPE
    // candidate is never a valid fill: it was either already returned or
    // dropped by a score filter, and resurrecting it would both mislabel it
    // as outside the scope and overturn a final min_score decision.
    if (req.scopeFallback && req.tags.nonEmpty) {
      val have = agg.count()
      if (have < req.limit) {
        // the fill query is the primary query, falling back to the first
        // non-empty multi-query (`recall.py:2387`: `query_text or
        // next(q for q in queries_to_run if q)`) — a queries-only request
        // with scope_fallback must still produce fills
        val fallbackQuery = req.query.orElse(
          queriesToRun.flatten.find(_.nonEmpty))
        val unscoped = runSingleQuery(memories, req.copy(tags = Nil), fallbackQuery)
          .filter(!tagPredicate(req.tags, req.tagMode, req.tagMatch))
        var fillPool = unscoped.join(agg.select(col("id")), Seq("id"), "left_anti")
        req.minScore.foreach(m =>
          fillPool = fillPool.filter(col("final_score") >= m))
        if (req.stateMode == "current")
          fillPool = Supersession.applyCurrentState(fillPool, memories, edges, req.now)
        val fill = scoreSort(fillPool)
          .limit((req.limit - have).toInt)
          .withColumn("outside_tag_scope", lit(true))
        agg = agg.withColumn("outside_tag_scope", lit(false))
          .unionByName(fill, allowMissingColumns = true)
      } else agg = agg.withColumn("outside_tag_scope", lit(false))
    } else agg = agg.withColumn("outside_tag_scope", lit(false))
    val finalKey =
      asc("outside_tag_scope") +: priorityRank(req.priorityIds).asc +:
        sortKey(req)
    val ordered = agg.orderBy(finalKey: _*)
    if (req.expandRelations)
      // a join does NOT preserve its left side's sort (Spark may plan a
      // sort-merge join and re-sort by the key) — re-apply the ranking
      // after hydration so the returned frame honors the ranked-order
      // contract
      hydrateRelations(ordered, memories, edges, req.relationLimit)
        .orderBy(finalKey: _*)
    else ordered
  }
}
