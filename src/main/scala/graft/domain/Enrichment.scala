package graft.domain

import graft.functions.TextFunctions
import graft.functions.VectorFunctions.{cosineSim, signBucket}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Enrichment dataflows E1-E4 (SURVEY.md §2.12, `/root/reference/automem/
  * enrichment/runtime_helpers.py`) as batch DataFrame -> DataFrame stages
  * producing `edges` and `patterns` updates.
  */
object Enrichment {

  /** E1 temporal linking (`runtime_helpers.py:15-71`): for each memory, link
    * to the top-10 memories with earlier timestamps inside a trailing 7-day
    * window -> PRECEDED_BY edges. The one non-equi join in the system; the
    * join key is a day-bucket so the range join shuffles on bounded buckets
    * (each row joins only its own + previous bucket) instead of a cross
    * join — the scale-safe band-join pattern.
    */
  def temporalLinks(memories: DataFrame, topK: Int = 10,
      windowDays: Int = 7): DataFrame = {
    val winSec = windowDays * 86400L
    val bucket = (unix_timestamp(col("timestamp")) / winSec).cast("long")
    val left = memories.select(col("id").as("src"),
      col("timestamp").as("src_ts"), bucket.as("b"))
    // each row probes its own bucket and the previous one
    val probe = left.select(col("src"), col("src_ts"), col("b"))
      .withColumn("b", explode(array(col("b"), col("b") - 1)))
    val right = memories.select(col("id").as("dst"),
      col("timestamp").as("dst_ts"), bucket.as("b"))
    val w = Window.partitionBy(col("src")).orderBy(desc("dst_ts"), asc("dst"))
    probe.join(right, Seq("b"))
      .filter(col("dst_ts") < col("src_ts") &&
        col("dst_ts") >= col("src_ts") - expr(s"INTERVAL $windowDays DAYS"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topK)
      .select(col("src"), col("dst"), lit("PRECEDED_BY").as("rel_type"),
        lit(1L).as("count"), col("src_ts").as("updated_at"))
  }

  /** E3 semantic neighbor linking (`runtime_helpers.py:177-254`): top-k
    * neighbors above cosine `threshold` (default 0.8, `config.py:108-109`)
    * -> bidirectional SIMILAR_TO edges with the similarity as score.
    * `exact=true` compares all pairs (parity with the reference's KNN over
    * the full collection); `exact=false` blocks by SimHash sign bucket —
    * the 100 TB path where only same-bucket pairs shuffle together.
    */
  def similarToEdges(memories: DataFrame, topK: Int = 5,
      threshold: Double = 0.8, exact: Boolean = true): DataFrame = {
    val base = memories.select(col("id"), col("embedding"),
      col("updated_at"))
    val withKey = if (exact) base
      else base.withColumn("b", signBucket(col("embedding"), 12))
    val a = withKey.select(
      (if (exact) Seq.empty[org.apache.spark.sql.Column] else Seq(col("b"))) ++
        Seq(col("id").as("src"), col("embedding").as("a_emb"),
          col("updated_at")): _*)
    val bb = withKey.select(
      (if (exact) Seq.empty[org.apache.spark.sql.Column] else Seq(col("b"))) ++
        Seq(col("id").as("dst"), col("embedding").as("b_emb")): _*)
    val w = Window.partitionBy(col("src")).orderBy(desc("sim"), asc("dst"))
    // exact mode CROSS-joins: a constant join key would hash-partition the
    // whole relation into ONE task and serialize the O(n^2) pass (the
    // pitfall Consolidation.similarityEdges documents) — crossJoin keeps
    // the nested loop parallel over the left side's partitions
    val joined = if (exact) a.crossJoin(bb) else a.join(bb, Seq("b"))
    val pairs = joined
      .filter(col("src") =!= col("dst"))
      .withColumn("sim", cosineSim(col("a_emb"), col("b_emb")))
      .filter(col("sim") >= threshold)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topK)
      .select(col("src"), col("dst"), col("sim"), col("updated_at"))
    // the reference writes BOTH directions per link
    // (`runtime_helpers.py:177-254`); a per-src top-k can keep only one, so
    // symmetrize the survivor set (dedup where both directions survived)
    val sym = pairs
      .unionByName(pairs.select(col("dst").as("src"), col("src").as("dst"),
        col("sim"), col("updated_at")))
      .groupBy(col("src"), col("dst"))
      .agg(max(col("sim")).as("sim"), max(col("updated_at")).as("updated_at"))
    sym.select(col("src"), col("dst"), lit("SIMILAR_TO").as("rel_type"),
      col("sim").as("score"), col("updated_at"))
  }

  /** E2 pattern detection (`runtime_helpers.py:74-174`): per type, among
    * confident memories (confidence > 0.5), if >= 3 exist, extract the top-5
    * non-stopword tokens (>= 4 chars) across their contents -> one Pattern
    * row per type; confidence 0.35 + 0.05/observation capped 0.95.
    */
  def detectPatterns(memories: DataFrame): DataFrame = {
    val confident = memories.filter(col("confidence") > 0.5 &&
      !col("type").isin(Schema.RecallExcludedTypes: _*))
    val typeCounts = confident.groupBy(col("type"))
      .agg(count(lit(1)).as("n_obs"), max(col("timestamp")).as("updated_at"))
      .filter(col("n_obs") >= 3)
    // letter-run extraction, not whitespace tokens
    // (`runtime_helpers.py:106-110` re.findall("[a-zA-Z]{4,}", lowered)):
    // punctuation-attached words ("build,") must not split frequencies or
    // smuggle stopwords past the filter
    val tokens = confident
      .select(col("type"), explode(expr(
        "regexp_extract_all(lower(content), '[a-z]{4,}', 0)")).as("tok"))
      .filter(!col("tok").isin("the", "that", "with", "from", "this", "have", "were"))
      .groupBy(col("type"), col("tok")).agg(count(lit(1)).as("n"))
    // two-phase top-5 per type (the hot-key doctrine): the per-type
    // vocabulary grows with the corpus, so phase 1 prunes to top-5 per
    // (type, token-salt) on bounded groups before the <= 64x5-row final
    // rank — exact, same total order
    val w1 = Window.partitionBy(col("type"),
        pmod(xxhash64(col("tok")), lit(64L)))
      .orderBy(desc("n"), asc("tok"))
    val w = Window.partitionBy(col("type")).orderBy(desc("n"), asc("tok"))
    val keyTerms = tokens
      .withColumn("_p1", row_number().over(w1)).filter(col("_p1") <= 5)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 5)
      .groupBy(col("type"))
      .agg(collect_list(col("tok")).as("key_terms"))
    typeCounts.join(keyTerms, Seq("type"))
      .select(
        concat(lit("pattern-"), lower(col("type"))).as("id"),
        col("type"),
        concat(lit("Recurring "), col("type"),
          lit(" pattern: "), array_join(col("key_terms"), ", ")).as("content"),
        least(lit(0.95), lit(0.35) + col("n_obs") * 0.05).as("confidence"),
        col("n_obs").as("observations"),
        col("key_terms"),
        col("updated_at").as("created_at"),
        col("updated_at"))
  }

  /** E2's EXEMPLIFIES edges: each confident memory of a detected pattern's
    * type links to that Pattern row (`runtime_helpers.py:148-162`).
    */
  def exemplifiesEdges(memories: DataFrame, patterns: DataFrame): DataFrame =
    memories.filter(col("confidence") > 0.5)
      .select(col("id").as("src"), col("type"), col("timestamp"))
      .join(patterns.select(col("id").as("dst"), col("type"),
        col("confidence")), Seq("type"))
      .select(col("src"), col("dst"), lit("EXEMPLIFIES").as("rel_type"),
        col("confidence"), col("timestamp").as("updated_at"))

  /** U3 entity extraction, regex-only deterministic subset
    * (`automem/utils/entity_extraction.py:68-245`): backtick code spans ->
    * tools; "with <Name>" -> people; "project called <name>" / capitalized
    * multiword -> projects. Every candidate then passes the
    * [[EntityQuality]] validity gate (`automem/utils/entity_quality.py`) —
    * the memory content is the validation context, so brand-shaped "people"
    * in tool-context prose are rejected. Emits
    * (id, category, name, slug, confidence) rows with the CANONICAL slug.
    */
  def extractEntities(memories: DataFrame, ner: Boolean = false): DataFrame = {
    val pats = Seq(
      ("tools", "`([A-Za-z][A-Za-z0-9_.-]{1,40})`"),
      ("people", "(?:met with|pairing with|talked to|with)\\s+([A-Z][a-z]{2,20}(?:\\s+[A-Z][a-z]{2,20})?)\\b"),
      ("projects", "project(?:\\s+called)?\\s+([A-Z][A-Za-z0-9_-]{2,30})\\b"))
    // the validator is per-candidate scalar rule logic on the BOUNDED
    // regex-candidate set (not the per-row hot path) — one UDF emitting
    // (accepted, canonical_slug, confidence), mirroring the reference's
    // per-candidate validate_entity_value
    val validate = udf((category: String, name: String, context: String) => {
      val r = EntityQuality.validateValue(category, name, Option(context))
      (r.accepted, r.canonicalSlug, r.confidence)
    })
    val regexChannel = pats.map { case (cat, pat) =>
      memories.select(col("id"), col("content"),
          explode(regexp_extract_all(col("content"), lit(pat), lit(1))).as("name"))
        .withColumn("category", lit(cat))
    }.reduce(_ unionByName _)
    // the NER channel (opt-in, like the reference's optional spaCy model —
    // `entity_extraction.py:165-182`): rule-based span recognition per
    // document, merged with the regex channel before the shared gate
    val channels = if (!ner) regexChannel else {
      val nerCands = udf((text: String) => NerLite.candidates(text))
      regexChannel.unionByName(
        memories.select(col("id"), col("content"),
            explode(nerCands(col("content"))).as("cand"))
          .select(col("id"), col("content"), col("cand._2").as("name"),
            col("cand._1").as("category")))
    }
    val validated = channels
      .filter(length(col("name")) >= 3)
      .withColumn("_v", validate(col("category"), col("name"), col("content")))
      .filter(col("_v._1"))
      .select(col("id"), col("category"), col("name"),
        col("_v._2").as("slug"), col("_v._3").as("confidence"))
      .distinct()
    // tools.difference_update(people) per document
    // (`entity_extraction.py:240`) — a person found by the people rules
    // must not survive as a tool from a cue-pattern match
    val people = validated.filter(col("category") === "people")
      .select(col("id").as("_pid"), col("slug").as("_pslug"))
    validated.join(people,
        validated("id") === col("_pid") && validated("slug") === col("_pslug") &&
          validated("category") === "tools",
        "left_anti")
  }

  /** E4 orchestration: entity tags + prefixes + the three edge/pattern
    * stages, returning (enriched memories, new edges, patterns).
    */
  def enrich(memories: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val entities = extractEntities(memories)
    val entityTags = entities
      .select(col("id"),
        concat(lit("entity:"), col("category"), lit(":"), col("slug")).as("etag"))
      .groupBy(col("id")).agg(collect_set(col("etag")).as("entity_tags"))
    val enriched = memories.join(entityTags, Seq("id"), "left")
      .withColumn("tags",
        array_distinct(concat(col("tags"), coalesce(col("entity_tags"),
          array().cast("array<string>")))))
      .drop("entity_tags")
      .withColumn("tag_prefixes", TextFunctions.tagPrefixes(col("tags")))
      .withColumn("enriched", lit(true))
      .withColumn("processed", lit(true))
    val patterns = detectPatterns(memories)
    // the reference MERGEs an EXEMPLIFIES edge per confident memory of a
    // detected pattern's type during the same pass
    // (`runtime_helpers.py:148-162`) — without them the pattern nodes are
    // unreachable from the graph
    val edges = temporalLinks(memories)
      .unionByName(similarToEdges(memories), allowMissingColumns = true)
      .unionByName(exemplifiesEdges(memories, patterns),
        allowMissingColumns = true)
    (enriched, edges, patterns)
  }
}
