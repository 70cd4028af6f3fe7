package graft.domain

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Full-fidelity metadata sidecar scoring and metadata-term collection — a
  * faithful port of the reference's strong-evidence rules
  * (`/root/reference/automem/search/runtime_recall_helpers.py:25-340`) and
  * of the metadata term-set walk used by the scoring `exact` and tag
  * components (`/root/reference/automem/utils/scoring.py:40-63,150-158`).
  *
  * This is per-row scalar logic over PARSED JSON with branching the
  * reference defines procedurally; it runs behind the cheap contains
  * prefilter on the CAPPED candidate scan (200-1000 rows, reference
  * `METADATA_SCAN_LIMIT_*`), never on the full corpus — the right
  * UDF-vs-expression boundary. Jackson is Spark's own bundled JSON parser.
  */
object MetadataScoring {

  /** `runtime_recall_helpers.py:25-38`. */
  val SearchFields: Seq[String] = Seq(
    "source", "source_agent", "source_agents", "repo", "project", "tool",
    "surface", "applies_to", "trigger", "provider", "model", "entities")

  /** `runtime_recall_helpers.py:41-46` — never searchable. */
  val SkipFields: Set[String] = Set(
    "original_content", "enrichment", "semantic_neighbors", "patterns_detected")

  /** `runtime_recall_helpers.py:47-60` — alias ORDER matters for the
    * source / source_agent disambiguation, so this stays a Seq.
    */
  val FieldAliases: Seq[(String, Seq[String])] = Seq(
    "source" -> Seq("source"),
    "source_agent" -> Seq("source agent", "source agents"),
    "source_agents" -> Seq("source agents", "source agent"),
    "repo" -> Seq("repo", "repository"),
    "project" -> Seq("project"),
    "tool" -> Seq("tool"),
    "surface" -> Seq("surface"),
    "applies_to" -> Seq("applies to", "apply to"),
    "trigger" -> Seq("trigger"),
    "provider" -> Seq("provider"),
    "model" -> Seq("model"),
    "entities" -> Seq("entity", "entities"))

  /** `runtime_recall_helpers.py:61-81`. */
  val QueryStopwords: Set[String] = Set(
    "all", "any", "about", "by", "find", "for", "from", "in", "me", "memory",
    "memories", "of", "on", "please", "show", "that", "the", "to", "with")

  /** `runtime_recall_helpers.py:82-99`. */
  val FieldTokens: Set[String] = Set(
    "source", "agent", "agents", "repo", "repository", "project", "tool",
    "surface", "applies", "apply", "trigger", "provider", "model", "entity",
    "entities", "metadata")

  val PrefilterMaxTerms = 12
  val MaxStringLength = 96
  val MaxArrayLength = 12

  private val mapper = new ObjectMapper()

  /** `runtime_recall_helpers.py:123-127`: NFKD -> ascii -> alnum words,
    * collapsed, lowered.
    */
  def asciiSearchText(value: String): String = {
    val nfkd = java.text.Normalizer.normalize(Option(value).getOrElse(""),
      java.text.Normalizer.Form.NFKD)
    val ascii = nfkd.filter(_ < 128)
    ascii.replaceAll("[^A-Za-z0-9]+", " ").replaceAll("\\s+", " ").trim.toLowerCase
  }

  private val TokenRe = "[a-z0-9]+".r

  /** `runtime_recall_helpers.py:130-132`: >= 2-char tokens as a set. */
  def searchTokens(value: String): Set[String] =
    TokenRe.findAllIn(asciiSearchText(value)).filter(_.length >= 2).toSet

  /** `runtime_recall_helpers.py:135-144`: order-preserving distinct. */
  def orderedSearchTokens(value: String): Seq[String] =
    TokenRe.findAllIn(asciiSearchText(value)).toSeq.distinct.filter(_.length >= 2)

  /** `runtime_recall_helpers.py:192-199`: query terms the prefilter may use
    * (field tokens and query stopwords removed, capped at 12).
    */
  def prefilterTerms(query: String): Seq[String] =
    orderedSearchTokens(query)
      .filter(t => !FieldTokens.contains(t) && !QueryStopwords.contains(t))
      .take(PrefilterMaxTerms)

  /** `runtime_recall_helpers.py:110-118`: JSON string -> object, else empty. */
  def parseMetadata(json: String): Option[JsonNode] = {
    val trimmed = Option(json).getOrElse("").trim
    if (trimmed.isEmpty) None
    else
      try {
        val node = mapper.readTree(trimmed)
        if (node != null && node.isObject) Some(node) else None
      } catch { case _: Exception => None }
  }

  /** `runtime_recall_helpers.py:147-162`: strings (trimmed, <= 96 chars),
    * non-bool numbers, and arrays (<= 12 items, recursively); dicts yield
    * nothing at this level.
    */
  private def scalarValues(node: JsonNode): Seq[String] =
    if (node.isTextual) {
      val s = node.asText.trim
      if (s.nonEmpty && s.length <= MaxStringLength) Seq(s) else Nil
    } else if (node.isNumber && !node.isBoolean) Seq(node.asText)
    else if (node.isArray) {
      val items = node.elements().asScala.toSeq
      if (items.length > MaxArrayLength) Nil else items.flatMap(scalarValues)
    } else Nil

  /** `runtime_recall_helpers.py:165-189`: (field, value) pairs in whitelist
    * order; `entities` flattens per category except the always-excluded
    * `people`; dict-valued non-entities fields are skipped.
    */
  def searchValues(metadata: JsonNode): Seq[(String, String)] =
    SearchFields.flatMap { field =>
      if (SkipFields.contains(field) || !metadata.has(field)) Nil
      else {
        val raw = metadata.get(field)
        if (field == "entities") {
          if (!raw.isObject) Nil
          else raw.fields().asScala.toSeq.flatMap { e =>
            val category = e.getKey.trim.toLowerCase
            if (category.isEmpty || category == "people" || e.getValue.isObject) Nil
            else scalarValues(e.getValue).map(v => (s"entities.$category", v))
          }
        } else if (raw.isObject) Nil
        else scalarValues(raw).map(v => (field, v))
      }
    }

  /** `runtime_recall_helpers.py:202-231`: which whitelisted fields the query
    * explicitly names — multi-word aliases as phrases, single-word aliases
    * as tokens, with the source vs source_agent disambiguation.
    */
  def requestedFields(query: String): Set[String] = {
    val normalized = asciiSearchText(query)
    if (normalized.isEmpty) return Set.empty
    val padded = s" $normalized "
    val requested = mutable.LinkedHashSet.empty[String]
    val phraseFields = mutable.Set.empty[String]
    for ((field, aliases) <- FieldAliases; alias <- aliases) {
      val at = asciiSearchText(alias)
      if (at.contains(" ") && padded.contains(s" $at ")) {
        requested += field
        phraseFields += field
      }
    }
    val tokens = normalized.split(" ").toSet
    for ((field, aliases) <- FieldAliases if !phraseFields.contains(field);
        alias <- aliases) {
      val at = asciiSearchText(alias)
      if (!at.contains(" ") && tokens.contains(at)) {
        val skipSource = at == "source" &&
          (requested.contains("source_agent") || requested.contains("source_agents"))
        if (!skipSource) requested += field
      }
    }
    requested.toSet
  }

  /** `runtime_recall_helpers.py:234-242`. */
  def fieldRequested(field: String, requested: Set[String]): Boolean = {
    if (requested.isEmpty) return true
    val base = field.split("\\.", 2)(0)
    if (base == "source_agent" || base == "source_agents")
      requested.contains("source_agent") || requested.contains("source_agents")
    else if (base == "entities") requested.contains("entities")
    else requested.contains(base)
  }

  /** `runtime_recall_helpers.py:245-267`: one weak token hit is not
    * evidence; two hits, a requested-field exact, or a long distinctive
    * token is.
    */
  def strongEvidence(valueHits: Set[String], valueTokens: Set[String],
      queryValueTokens: Set[String], exactHit: Boolean,
      isFieldRequested: Boolean, requested: Set[String]): Boolean = {
    if (valueTokens.size > 1 && valueHits.size >= math.min(2, valueTokens.size))
      return true
    if (valueHits.size != 1) return false
    val hit = valueHits.head
    if (isFieldRequested && requested.nonEmpty && exactHit && hit.length >= 3)
      return true
    if (hit.length < 5) return false
    if (isFieldRequested && requested.nonEmpty) return true
    exactHit && queryValueTokens.size <= 3
  }

  /** `runtime_recall_helpers.py:270-340`: the sidecar match score — best
    * over whitelisted values passing the strong-evidence and
    * requested-field guards; 0.6 penalty for hits on non-requested fields
    * when the query names fields.
    */
  def matchScore(query: String, metadataJson: String): Double = {
    val queryTokens = searchTokens(query)
    if (queryTokens.isEmpty) return 0.0
    val queryValueTokens = queryTokens.filter(t =>
      !FieldTokens.contains(t) && !QueryStopwords.contains(t) && t.length >= 3)
    if (queryValueTokens.isEmpty) return 0.0
    val metadata = parseMetadata(metadataJson).getOrElse(return 0.0)
    val requested = requestedFields(query)
    val normalizedQuery = asciiSearchText(query)
    var best = 0.0
    for ((field, value) <- searchValues(metadata)) {
      val valueText = asciiSearchText(value)
      val valueTokens = searchTokens(value)
      if (valueText.nonEmpty && valueTokens.nonEmpty) {
        val valueHits = queryValueTokens.intersect(valueTokens)
        val exactHit = normalizedQuery.contains(valueText)
        if (valueHits.nonEmpty) {
          val isReq = fieldRequested(field, requested)
          val entitiesExcluded =
            field.startsWith("entities.") && !requested.contains("entities")
          val repoGuard = field == "repo" && requested.contains("repo") &&
            !exactHit && (queryValueTokens -- valueTokens).nonEmpty
          val weakOffField = requested.nonEmpty && !isReq && valueHits.size < 2
          if (!entitiesExcluded && !repoGuard && !weakOffField &&
            strongEvidence(valueHits, valueTokens, queryValueTokens, exactHit,
              isReq, requested)) {
            val valueRatio = valueHits.size.toDouble / math.max(valueTokens.size, 1)
            val queryRatio = valueHits.size.toDouble / math.max(queryValueTokens.size, 1)
            var score = math.min(1.0,
              0.15 + 0.45 * valueRatio + 0.20 * queryRatio +
                (if (exactHit) 0.15 else 0.0) +
                (if (requested.nonEmpty && isReq) 0.20 else 0.0))
            if (requested.nonEmpty && !isReq) score *= 0.6
            if (score > best) best = score
          }
        }
      }
    }
    best
  }

  private val TermTokenRe = "[a-z0-9_\\-]+".r

  /** `scoring.py:40-63`: the metadata TERM SET — recursive walk over dict
    * VALUES only (keys are never terms; the `entities` subtree is skipped),
    * collecting each trimmed string <= 256 chars lowered plus its
    * `[a-z0-9_\-]+` tokens. The scoring `exact` component is whole-query
    * membership in THIS set — not a substring probe on the raw JSON, which
    * can fire on key names or across token boundaries.
    */
  def collectTerms(metadataJson: String): Set[String] = {
    val terms = mutable.Set.empty[String]
    def visit(node: JsonNode): Unit =
      if (node.isTextual) {
        val trimmed = node.asText.trim
        if (trimmed.nonEmpty && trimmed.length <= 256) {
          val lower = trimmed.toLowerCase
          terms += lower
          TermTokenRe.findAllIn(lower).foreach(terms += _)
        }
      } else if (node.isArray) node.elements().asScala.foreach(visit)
      else if (node.isObject)
        node.fields().asScala.foreach { e =>
          if (e.getKey != "entities") visit(e.getValue)
        }
    parseMetadata(metadataJson).foreach(visit)
    terms.toSet
  }
}
