package graft.domain

import java.sql.Timestamp

/** Core relations of the engine (SURVEY.md §1, FIXTURES.md §1): one
  * `memories` Dataset replacing the reference's dual FalkorDB-node /
  * Qdrant-point split (`/root/reference/automem/api/memory.py:613-700`) —
  * the embedding is a column on the same row — plus an `edges` Dataset for
  * the 14 relationship types (`automem/config.py:273-397`) and `patterns` /
  * `entities` side tables.
  *
  * At cluster scale `memories` is date-partitioned parquet/Delta
  * (`timestamp` day) and `edges` is bucketed by `src` so 1-hop joins
  * co-locate.
  */
case class Memory(
    id: String,
    content: String,
    timestamp: Timestamp,
    t_valid: Timestamp,
    t_invalid: Option[Timestamp],
    updated_at: Timestamp,
    last_accessed: Timestamp,
    importance: Double,
    confidence: Double,
    `type`: String,
    tags: Seq[String],
    tag_prefixes: Seq[String],
    metadata: String,
    summary: Option[String],
    enriched: Boolean,
    processed: Boolean,
    relevance_score: Double,
    archived: Boolean,
    protected_flag: Boolean,
    embedding: Array[Float])

case class Edge(
    src: String,
    dst: String,
    rel_type: String,
    strength: Option[Double],
    score: Option[Double],
    confidence: Option[Double],
    similarity: Option[Double],
    count: Option[Long],
    kind: Option[String],
    origin: Option[String],
    updated_at: Timestamp)

case class Pattern(
    id: String,
    `type`: String,
    content: String,
    confidence: Double,
    observations: Long,
    key_terms: Seq[String],
    created_at: Timestamp,
    updated_at: Timestamp)

object Schema {
  /** Memory `type` enum, 7 canonical values (`automem/config.py:183`). */
  val CanonicalTypes: Seq[String] =
    Seq("Decision", "Pattern", "Preference", "Style", "Habit", "Insight", "Context")

  /** Internal artifact types excluded from all user-facing recall
    * (`automem/config.py:164-166`).
    */
  val RecallExcludedTypes: Seq[String] = Seq("MetaPattern")

  /** Alias map normalizing legacy/lowercase types
    * (`automem/config.py:187-241`).
    */
  val TypeAliases: Map[String, String] = Map(
    "decision" -> "Decision", "decisions" -> "Decision", "choice" -> "Decision",
    "pattern" -> "Pattern", "patterns" -> "Pattern",
    "preference" -> "Preference", "preferences" -> "Preference", "pref" -> "Preference",
    "style" -> "Style", "styles" -> "Style",
    "habit" -> "Habit", "habits" -> "Habit", "routine" -> "Habit",
    "insight" -> "Insight", "insights" -> "Insight", "learning" -> "Insight",
    "context" -> "Context", "contexts" -> "Context", "note" -> "Context",
    "memory" -> "Context", "misc" -> "Context")

  def normalizeType(raw: String): String = {
    val t = Option(raw).getOrElse("").trim
    if (CanonicalTypes.contains(t)) t
    else TypeAliases.getOrElse(t.toLowerCase, "Context")
  }

  /** Authorable relationship types (`automem/config.py:399-412`). */
  val AuthorableRelations: Seq[String] = Seq(
    "RELATES_TO", "LEADS_TO", "OCCURRED_BEFORE", "PREFERS_OVER", "EXEMPLIFIES",
    "CONTRADICTS", "REINFORCES", "INVALIDATED_BY", "EVOLVED_INTO",
    "DERIVED_FROM", "PART_OF")

  /** System-generated relationship types (CONTRASTS_WITH is the creative
    * consolidation engine's Decision-contrast edge, `consolidation.py:419`).
    */
  val SystemRelations: Seq[String] =
    Seq("SIMILAR_TO", "PRECEDED_BY", "DISCOVERED", "CONTRASTS_WITH")

  /** Supersession edge types walked by current-state resolution
    * (`automem/api/recall.py:82-87`).
    */
  val SupersessionRelations: Seq[String] = Seq("INVALIDATED_BY", "EVOLVED_INTO")

  /** Default relation whitelist for graph expansion. */
  val DefaultExpandRelations: Seq[String] =
    AuthorableRelations ++ Seq("SIMILAR_TO", "PRECEDED_BY", "DISCOVERED")
}
