package graft.domain

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Batch store pipeline (S1/S2, `/root/reference/automem/api/memory.py:
  * 475-754`, `1123-1386`): validate -> classify type (regex table, U2) ->
  * extractive summary for oversize content (U5) -> tag normalization +
  * prefix materialization -> deterministic embedding -> one append-ready
  * memories DataFrame. The reference's two-phase graph+vector write
  * collapses into a single table write; at scale this is
  * `df.write.partitionBy(day)` or a Delta MERGE keyed on id.
  */
object Ingest {

  /** Regex classification table (U2, `automem/classification/
    * memory_classifier.py:13-125`): first matching type wins; confidence
    * 0.6 + 0.1 per extra matching pattern of the same type, capped 0.95;
    * no match -> Context at 0.5.
    */
  val TypePatterns: Seq[(String, Seq[String])] = Seq(
    "Decision" -> Seq("(?i)\\bdecided\\b", "(?i)\\bdecision\\b", "(?i)\\bchose\\b",
      "(?i)\\bgoing with\\b", "(?i)\\bsettled on\\b"),
    "Preference" -> Seq("(?i)\\bprefer(s|red)?\\b", "(?i)\\bfavorite\\b",
      "(?i)\\brather than\\b", "(?i)\\blike[s]? better\\b"),
    "Pattern" -> Seq("(?i)\\bpattern\\b", "(?i)\\brecurring\\b", "(?i)\\btend(s)? to\\b",
      "(?i)\\bevery time\\b", "(?i)\\balways\\b"),
    "Style" -> Seq("(?i)\\bstyle\\b", "(?i)\\bconvention\\b", "(?i)\\bformatting\\b",
      "(?i)\\bnaming\\b"),
    "Habit" -> Seq("(?i)\\bhabit\\b", "(?i)\\broutine\\b", "(?i)\\bdaily\\b",
      "(?i)\\busually\\b"),
    "Insight" -> Seq("(?i)\\binsight\\b", "(?i)\\brealized\\b", "(?i)\\blearned\\b",
      "(?i)\\bdiscovered\\b", "(?i)\\bturns out\\b"))

  /** Canonical memory types (`automem/config.py:183`). */
  val MemoryTypes: Seq[String] =
    Seq("Decision", "Pattern", "Preference", "Style", "Habit", "Insight", "Context")

  /** Alias map normalizing lowercase/legacy types to canonical
    * (`automem/config.py:187-218`).
    */
  val TypeAliases: Map[String, String] = Map(
    "decision" -> "Decision",
    "pattern" -> "Pattern",
    "preference" -> "Preference",
    "style" -> "Style",
    "habit" -> "Habit",
    "insight" -> "Insight",
    "context" -> "Context",
    "memory" -> "Context",
    "milestone" -> "Context",
    "analysis" -> "Insight",
    "observation" -> "Insight",
    "document" -> "Context",
    "meeting_notes" -> "Context",
    "template" -> "Pattern",
    "project" -> "Context",
    "issue" -> "Insight",
    "timeline" -> "Context",
    "organization" -> "Context",
    "person" -> "Context",
    "interests" -> "Preference",
    "personality" -> "Preference",
    "emotional_patterns" -> "Preference",
    "relationship_dynamics" -> "Preference",
    "personal_situation" -> "Context",
    "health_habits" -> "Habit",
    "practical_info" -> "Context",
    "communication" -> "Preference",
    "legal_analysis" -> "Insight")

  /** `normalize_memory_type` (`automem/config.py:221-241`): canonical types
    * pass through, aliases map to canonical, anything else -> null (the
    * reference's rejection marker; [[prepare]] drops such rows the way the
    * reference 400s the request).
    */
  def normalizeMemoryType(t: Column): Column =
    when(t.isin(MemoryTypes: _*), t)
      .otherwise(element_at(typedlit(TypeAliases), t))

  /** Number of patterns of one type matching the content. */
  private def matchCount(content: Column, patterns: Seq[String]): Column =
    patterns.map(p => when(content.rlike(p), 1).otherwise(0)).reduce(_ + _)

  /** True when ANY classification pattern matches — the gate between the
    * codegen regex path and [[LlmClassifier]]'s LLM fallback (the
    * reference tries the LLM only after every pattern missed,
    * `memory_classifier.py:107-135`).
    */
  def anyPatternMatch(content: Column): Column =
    TypePatterns.flatMap(_._2).map(content.rlike).reduce(_ || _)

  /** (type, confidence) classification as two columns. */
  def classify(content: Column): (Column, Column) = {
    val counts = TypePatterns.map { case (t, ps) => t -> matchCount(content, ps) }
    val typeCol = counts.reverse.foldLeft(lit("Context")) { case (acc, (t, c)) =>
      when(c > 0, lit(t)).otherwise(acc)
    }
    val confCol = counts.reverse.foldLeft(lit(0.5)) { case (acc, (_, c)) =>
      when(c > 0, least(lit(0.95), lit(0.6) + (c - 1) * 0.1)).otherwise(acc)
    }
    (typeCol, confCol)
  }

  /** Soft/hard content-size gates (`automem/config.py:170-172`). */
  val SoftLimit = 500
  val HardLimit = 2000

  /** Extractive summary (U5, `entity_extraction.py:127-148`): first sentence,
    * <= 240 chars, word-boundary truncate.
    */
  def extractiveSummary(content: Column): Column = {
    val firstSentence = regexp_extract(content, "^(.*?[.!?])(\\s|$)", 1)
    val base = when(length(firstSentence) > 0, firstSentence).otherwise(content)
    when(length(base) <= 240, base)
      .otherwise(regexp_replace(substring(base, 1, 240), "\\s+\\S*\\z", ""))
  }

  /** Content-size governance trichotomy
    * (`automem/utils/text.py:191-209` should_summarize_content):
    * "ok" at or under the soft limit, "summarize" above it up to and
    * including the hard limit, "reject" beyond. Empty/null content is "ok"
    * there (the reference's 400 for empty content fires elsewhere); the
    * batch filter in [[prepare]] drops empties at the same boundary.
    */
  def contentFate(content: Column, softLimit: Int = SoftLimit,
      hardLimit: Int = HardLimit): Column = {
    val len = length(coalesce(content, lit("")))
    when(len <= softLimit, "ok")
      .when(len <= hardLimit, "summarize")
      .otherwise("reject")
  }

  /** [[prepare]] plus the reject side-channel: a batch pipeline needs the
    * rows the reference's API would 400 (empty or beyond the hard limit)
    * accounted for, not silently dropped. Returns (prepared, rejected);
    * `rejected` carries the input columns plus a `reject_reason`.
    */
  def prepareWithRejects(df: DataFrame,
      dim: Int = PlaceholderEmbedding.DefaultDim): (DataFrame, DataFrame) = {
    val rejected = df
      .filter(length(coalesce(col("content"), lit(""))) === 0 ||
        length(col("content")) > HardLimit)
      .withColumn("reject_reason",
        when(length(coalesce(col("content"), lit(""))) === 0, "empty_content")
          .otherwise("content_exceeds_hard_limit"))
    (prepare(df, dim), rejected)
  }

  /** Normalize raw tags: trim, lowercase, drop empties, dedupe
    * (`automem/utils/tags.py:7-20`).
    */
  def normalizeTags(tags: Column): Column =
    array_distinct(filter(transform(tags, t => lower(trim(t))), t => length(t) > 0))

  /** Full batch-store transform: input needs `content` plus optional `tags`
    * (array<string>), `type`, `importance`, `timestamp`, `metadata`.
    * Produces the memories schema of [[Schema]].
    */
  def prepare(df: DataFrame, dim: Int = PlaceholderEmbedding.DefaultDim,
      embed: Option[Column => Column] = None,
      summarize: Option[Column => Column] = None,
      classifier: Option[Column => Column] = None): DataFrame = {
    val withDefaults = Seq(
      ("tags", lit(Array.empty[String]).cast("array<string>")),
      ("type", lit(null).cast("string")),
      ("importance", lit(0.5)),
      ("timestamp", current_timestamp()),
      ("metadata", lit("{}")),
      ("id", expr("uuid()")))
      .foldLeft(df) { case (d, (name, default)) =>
        if (d.columns.contains(name)) d else d.withColumn(name, default)
      }
    // the classify stage is pluggable like the summarizer: default is the
    // codegen regex table (U2); an [[LlmClassifier.resolve]] adds the LLM
    // fallback for rows no pattern matched, as a (_1 type, _2 conf) struct.
    // The struct is MATERIALIZED as one column (getField on the expression
    // would duplicate it — CollapseProject does not inline a non-cheap
    // UDF, but two independent getField projections would each carry their
    // own copy and double the chat calls), and gated to untyped rows —
    // the reference only classifies when no explicit type was provided.
    val withCls = classifier match {
      case Some(f) =>
        withDefaults.withColumn("_cls",
          when(col("type").isNull, f(col("content"))))
      case None => withDefaults
    }
    val (typeCol, confCol) = classifier match {
      case Some(_) => (col("_cls").getField("_1"), col("_cls").getField("_2"))
      case None => classify(col("content"))
    }
    withCls
      .filter(length(col("content")) > 0 && length(col("content")) <= HardLimit)
      .withColumn("tags", normalizeTags(col("tags")))
      .withColumn("tag_prefixes", TextFunctions.tagPrefixes(col("tags")))
      // provided types normalize through the alias map (unknown explicit
      // types are rejected, i.e. dropped); absent types are classified
      .withColumn("_type_norm", normalizeMemoryType(col("type")))
      .filter(col("type").isNull || col("_type_norm").isNotNull)
      // confidence follows the reference's explicit-type rule
      // (`api/memory.py:550-561`): an explicitly typed row takes the
      // provided confidence (clamped like importance) or 0.9; only
      // untyped rows take the classifier's confidence
      .withColumn("confidence",
        when(col("_type_norm").isNotNull,
          if (df.columns.contains("confidence"))
            least(greatest(coalesce(col("confidence"), lit(0.9)), lit(0.0)),
              lit(1.0))
          else lit(0.9))
          .otherwise(confCol))
      .withColumn("type", coalesce(col("_type_norm"), typeCol))
      .drop("_type_norm", "_cls")
      .withColumn("importance", least(greatest(col("importance"), lit(0.0)), lit(1.0)))
      // the summary stage is pluggable like the embedder: the default is
      // the extractive expression (U5); an [[LlmSummarizer.column]] swaps
      // in the LLM path with extractive fallback (U4) — the gate (only
      // oversized content is summarized) stays HERE either way
      .withColumn("summary",
        when(length(col("content")) > SoftLimit,
          summarize.map(_(col("content")))
            .getOrElse(extractiveSummary(col("content"))))
          .otherwise(lit(null).cast("string")))
      .withColumn("embedding",
        embed.getOrElse(PlaceholderEmbedding.embedColumn(dim))(col("content")))
      .withColumn("t_valid", col("timestamp"))
      .withColumn("t_invalid", lit(null).cast("timestamp"))
      .withColumn("updated_at", col("timestamp"))
      .withColumn("last_accessed", col("timestamp"))
      .withColumn("enriched", lit(false))
      .withColumn("processed", lit(false))
      .withColumn("relevance_score", lit(1.0))
      .withColumn("archived", lit(false))
      .withColumn("protected_flag", lit(false))
  }

  /** Legacy discovered-relation names -> canonical DISCOVERED kind
    * (`automem/config.py:244-248`).
    */
  val LegacyDiscoveredRelations: Map[String, String] = Map(
    "EXPLAINS" -> "explains",
    "SHARES_THEME" -> "shares_theme",
    "PARALLEL_CONTEXT" -> "parallel_context")

  /** Canonicalize relation types on edge ingest
    * (`automem/config.py:420-469`): trim/uppercase; legacy discovered names
    * fold into `DISCOVERED` with `kind` = the lowercase legacy name;
    * explicit DISCOVERED kinds lowercase.
    */
  def normalizeEdges(edges: DataFrame): DataFrame = {
    val raw = upper(trim(col("rel_type")))
    val legacyKind = element_at(typedlit(LegacyDiscoveredRelations), raw)
    edges
      .withColumn("kind",
        when(legacyKind.isNotNull, legacyKind)
          .when(raw === "DISCOVERED", lower(trim(col("kind"))))
          .otherwise(col("kind")))
      .withColumn("rel_type",
        when(legacyKind.isNotNull, lit("DISCOVERED")).otherwise(raw))
  }

  /** The PATCH-able memory fields, in the reference handler's SET order
    * (`automem/api/memory.py:789-886`). A patches relation carries `id`
    * plus any subset of these; a NULL (or absent) field keeps the current
    * value — the reference's `payload.get(field, current.get(field))`
    * coalesce, field-wise.
    */
  val PatchableFields: Seq[String] = Seq("content", "tags", "importance",
    "type", "confidence", "timestamp", "t_valid", "t_invalid", "metadata",
    "updated_at", "last_accessed")

  /** Batch twin of PATCH /memory/&lt;id&gt; (r16, VERDICT r15 item 2;
    * `automem/api/memory.py:789-886`): merge-update existing rows with a
    * patches relation.
    *
    *  - field-wise coalesce: a provided (non-null) patch field wins, an
    *    absent one keeps the current value;
    *  - tags re-normalize (trim/lower/dedupe, `utils/tags.py:7-20`) and
    *    `tag_prefixes` recompute (`utils/tags.py:23-48`) on every patched
    *    row — the handler recomputes both unconditionally;
    *  - `updated_at` follows the handler exactly (memory.py:817): patch
    *    value, else the CURRENT row's, else `now` (the utc_now fallback —
    *    reachable only for rows stored without one);
    *  - re-embed ONLY rows whose content actually changed
    *    (memory.py:901-911: `if new_content != current.content`); all
    *    other rows keep their stored vector bit-for-bit, so the patch job
    *    never touches the embedding provider for metadata-only patches.
    *
    * Patch rows whose id is not in the store are dropped — the reference
    * 404s those requests (memory.py:801-803). One patch row per id
    * (the HTTP handler's unit) is ENFORCED in-plan (ADVICE r16): a
    * duplicate-id batch used to fan out the left join and silently
    * duplicate store rows; it now fails loudly at execution, naming an
    * offending id — callers merging several patches to one id coalesce
    * them first. A null MERGED metadata coerces to "{}" on patched rows
    * (the handler re-serializes `metadata or {}` — memory.py's
    * json.dumps({}) floor). Remaining documented divergence: an EXPLICIT
    * null patch value is indistinguishable from an absent key here
    * (coalesce), so a field cannot be cleared through this twin — the
    * HTTP handler can un-invalidate via a present t_invalid: null;
    * callers needing a clear route it as a full re-store. Scale shape:
    * one equi-join on id (patches are request-sized — AQE broadcasts
    * them; the guard's window count is bounded the same way), the embed
    * stage runs on the changed subset only.
    */
  def applyPatches(memories: DataFrame, patches: DataFrame,
      now: Column = current_timestamp(),
      dim: Int = PlaceholderEmbedding.DefaultDim,
      embed: Option[Column => Column] = None): DataFrame = {
    // absent patch columns behave as all-NULL (field not provided)
    val p0 = PatchableFields.foldLeft(patches) { case (d, f) =>
      if (d.columns.contains(f)) d
      else d.withColumn(f, lit(null).cast(memories.schema(f).dataType))
    }
    // duplicate-id guard: assert_true returns NULL when the predicate
    // holds, so the filter keeps every row of a well-formed batch and
    // RAISES on the first duplicate — living in a Filter keeps it safe
    // from column pruning, which would silently drop a projected guard.
    // NULL ids are EXEMPT (ADVICE r17): partitionBy(id) groups nulls
    // together, but null-id patch rows are inert by construction (null
    // never equi-joins — both rows fall out of the join below), so two of
    // them must not abort an otherwise well-formed batch.
    val dupW = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
    val pGuarded = p0
      .withColumn("_dup", count(lit(1)).over(dupW))
      .filter(assert_true(col("id").isNull || col("_dup") <= 1,
        concat(lit("applyPatches: more than one patch row for id "),
          col("id"))).isNull)
      .drop("_dup")
    val p = pGuarded.select(col("id") +: lit(true).as("_patched") +:
      PatchableFields.map(f => col(f).as(s"_p_$f")): _*)
    val joined = memories.join(p, Seq("id"), "left")
    def merged(f: String): Column = coalesce(col(s"_p_$f"), col(f))
    val newTags = normalizeTags(merged("tags"))
    val contentChanged =
      col("_p_content").isNotNull && col("_p_content") =!= col("content")
    val embedFn = embed.getOrElse(PlaceholderEmbedding.embedColumn(dim))
    val patchedCols: Map[String, Column] = Map(
      "content" -> merged("content"),
      // normalize + prefix recompute fire on every patched row, whether or
      // not tags were in the payload (handler behavior); unpatched rows
      // keep their stored arrays bit-for-bit
      "tags" -> newTags,
      "tag_prefixes" -> TextFunctions.tagPrefixes(newTags),
      "importance" -> merged("importance"),
      "type" -> merged("type"),
      "confidence" -> merged("confidence"),
      "timestamp" -> merged("timestamp"),
      "t_valid" -> merged("t_valid"),
      "t_invalid" -> merged("t_invalid"),
      // "{}" floor on patched rows: the handler re-serializes
      // `metadata or {}`, never writes SQL NULL back (memory.py PATCH)
      "metadata" -> coalesce(col("_p_metadata"), col("metadata"), lit("{}")),
      "updated_at" -> coalesce(col("_p_updated_at"), col("updated_at"),
        now.cast("timestamp")),
      "last_accessed" -> merged("last_accessed"),
      "embedding" -> when(contentChanged, embedFn(merged("content")))
        .otherwise(col("embedding")))
    // ONE projection, every expression reading the PRE-merge columns —
    // sequential withColumn would rewrite `content` before the
    // content-changed gate compares against it and silently disable the
    // re-embed stage
    joined.select(memories.columns.toSeq.map { f =>
      (patchedCols.get(f) match {
        case Some(c) => when(col("_patched"), c).otherwise(col(f))
        case None => col(f)
      }).as(f)
    }: _*)
  }

  /** Append-with-dedup-by-id (the Delta MERGE stand-in): union then keep the
    * newest row per id (`memory.py` MERGE semantics).
    */
  def upsert(existing: DataFrame, incoming: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(desc("updated_at"))
    existing.unionByName(incoming, allowMissingColumns = true)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}
