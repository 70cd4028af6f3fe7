package graft.domain

/** Entity quality gates (U3 precision layer): a faithful port of the
  * validity rules of `/root/reference/automem/utils/entity_quality.py:1-669`
  * — category normalization + canonicalization, structural-noise rejection
  * (unicode escapes, durations/counts, generated fragments, markdown/code
  * fragments, generated phrases), generic-vocabulary rejection, and the
  * people-specific name-shape / brand-vocabulary / tool-or-org-context
  * rules. Downstream precision of J3 entity expansion and U6 identity
  * synthesis depends on this gate keeping junk entities out of the tag
  * space.
  *
  * This is per-candidate scalar rule logic (regex + set membership + short
  * branching), evaluated on the bounded set of regex-extracted candidates in
  * the enrichment batch stage — a Scala function (wrapped in one UDF at the
  * extraction site) rather than a Catalyst expression tree, mirroring the
  * reference's per-candidate validator. Constant tables are transcribed
  * verbatim for parity (entity_quality.py:7-326).
  */
object EntityQuality {

  /** `entity_quality.py:7-23`. */
  private val CategoryAliases: Map[String, String] = Map(
    "person" -> "people", "people" -> "people",
    "org" -> "organizations", "organization" -> "organizations",
    "organizations" -> "organizations",
    "tool" -> "tools", "tools" -> "tools",
    "project" -> "projects", "projects" -> "projects",
    "concept" -> "concepts", "concepts" -> "concepts",
    "event" -> "events", "events" -> "events",
    "opportunity" -> "opportunities", "opportunities" -> "opportunities")

  private val AllowedCategories: Set[String] = CategoryAliases.values.toSet

  private val ArticlePrefixes = Set("a", "an", "the")

  /** `entity_quality.py:29-81`. */
  private val GenericEntitySlugs = Set(
    "avoid", "background", "before-after", "build", "clear", "complex",
    "connect", "content", "dry", "env", "for", "home", "memory", "metadata",
    "open", "plan", "post", "problem", "result", "results", "session",
    "source", "system", "tag", "tags", "task", "technical", "them", "these",
    "they", "test", "theme", "ticket", "time", "trigger", "trusted", "unit",
    "universal", "url", "urls", "video", "vision", "voice", "verify",
    "watch", "web", "week", "worker", "workflow", "workflows", "word")

  /** `entity_quality.py:83-97`. */
  private val GenericEntityTokens: Set[String] = GenericEntitySlugs ++ Set(
    "about", "after", "approach", "before", "deliverable", "finding",
    "findings", "key", "phase", "priority", "status", "track")

  /** `entity_quality.py:99-124`. */
  private val ActionPrefixes = Set(
    "add", "build", "clean", "cleaned", "complete", "create", "deploy",
    "deployed", "fix", "pull", "push", "reach", "recall", "reclaim",
    "remove", "reply", "retry", "run", "show", "start", "started", "sync",
    "update", "write")

  /** `entity_quality.py:126-143`. */
  private val ActionStatusRoots = Seq(
    "accept", "approve", "build", "clean", "complete", "create", "deploy",
    "finish", "identify", "pass", "recommend", "reject", "select", "start",
    "sync", "update")

  private val AbstractSingletonSuffixes = Seq("acy", "ment", "ness")

  /** `entity_quality.py:147-163`. */
  private val MarkdownOrCodeTokens = Set(
    "bin", "config", "env", "file", "json", "markdown", "md", "path",
    "python", "settings", "tmp", "users", "venv", "yaml", "yml")

  /** `entity_quality.py:167-182` — "code" is only a weak signal (real tool
    * names end in it), so it must not condemn a slug on its own.
    */
  private val MarkdownOrCodeSecondaryTokens = Set(
    "api", "bash", "cli", "code", "css", "dockerfile", "html", "js", "m",
    "py", "sh", "ts", "tsx", "xml")

  /** `entity_quality.py:187-202`. */
  private val NonPersonCommonTokens = Set(
    "bottom", "chrome", "deck", "desktop", "email", "emails", "highlight",
    "highlights", "line", "plugin", "plugins", "today", "tomorrow",
    "yesterday")

  /** `entity_quality.py:204-223`. */
  private val NonPersonTechTokens = Set(
    "api", "app", "bot", "cli", "cloud", "compose", "data", "db", "docker",
    "hub", "model", "pipeline", "platform", "sdk", "service", "system",
    "tool", "tools")

  /** `entity_quality.py:225-249`. */
  private val GeneratedPhraseTokens = Set(
    "blog", "chronicle", "com", "comprehensive", "conditions", "decision",
    "draft", "execution", "goes", "https", "identified", "issue", "kickoff",
    "live", "negotiation", "passed", "quote", "round", "selected",
    "significance", "sprint", "terms", "wrap")

  /** `entity_quality.py:251-276`. */
  private val MonthTokens = Set(
    "jan", "january", "feb", "february", "mar", "march", "apr", "april",
    "may", "jun", "june", "jul", "july", "aug", "august", "sep", "sept",
    "september", "oct", "october", "nov", "november", "dec", "december")

  /** `entity_quality.py:278-290`. */
  private val PersonNameParticles = Set(
    "da", "de", "del", "der", "di", "du", "la", "le", "st", "van", "von")

  /** `entity_quality.py:292-305`. */
  private val ToolOrOrgSuffixes = Seq(
    "ai", "api", "app", "bot", "cli", "cloud", "corp", "db", "hub", "labs",
    "math", "sdk")

  /** `entity_quality.py:307-326`. */
  private val ToolOrOrgContextHints = Seq(
    "automation", "b2b", "business", "company", "data", "database", "model",
    "pipeline", "platform", "project", "saas", "service", "services",
    "software", "system", "tool", "tooling", "vendor")

  case class ValidationResult(
      accepted: Boolean,
      category: String,
      slug: String,
      canonicalSlug: String,
      reason: String,
      confidence: Double,
      name: String) {
    def canonicalTag: String = s"entity:$category:$canonicalSlug"
  }

  /** `entity_quality.py:345-347`. */
  def slugify(value: String): String =
    Option(value).getOrElse("").toLowerCase
      .replaceAll("[^a-z0-9]+", "-")
      .replaceAll("^-+|-+$", "")

  /** `entity_quality.py:350-351`: `slug.replace('-', ' ').title()` —
    * Python title() capitalizes the first letter of every LETTER RUN
    * (re-capitalizing after digits: 'b2b' -> 'B2B'), not just each
    * space-token's first char.
    */
  def nameFromSlug(slug: String): String = {
    val sb = new StringBuilder
    var prevLetter = false
    slug.replace('-', ' ').foreach { c =>
      if (c.isLetter) {
        sb += (if (prevLetter) c.toLower else c.toUpper); prevLetter = true
      } else { sb += c; prevLetter = false }
    }
    sb.toString
  }

  /** `entity_quality.py:354-355`. */
  def normalizeCategory(category: String): String = {
    val trimmed = Option(category).getOrElse("").trim
    CategoryAliases.getOrElse(trimmed.toLowerCase, trimmed)
  }

  /** `entity_quality.py:358-364`: collapse dash runs; people possessive /
    * suffix variants (x-y-s, x-y-a with >= 3 parts) canonicalize to the base.
    */
  private def canonicalizeSlug(category: String, slug: String): String = {
    val canonical = Option(slug).getOrElse("").trim.toLowerCase
      .replaceAll("-+", "-").replaceAll("^-+|-+$", "")
    if (category == "people") {
      val parts = canonical.split("-")
      if (parts.length >= 3 && Set("s", "a").contains(parts.last))
        parts.init.mkString("-")
      else canonical
    } else canonical
  }

  private def tokensOf(slug: String): Seq[String] =
    slug.split("-").toSeq.filter(_.nonEmpty)

  private val UniEscAll = "u?[0-9a-f]{4,6}".r
  private val UniEscTok = "u[0-9a-f]{4,6}".r

  private def looksLikeUnicodeEscapeSlug(slug: String): Boolean = {
    val parts = tokensOf(slug)
    parts.nonEmpty && parts.forall(p => UniEscAll.matches(p))
  }

  private def containsUnicodeEscapeToken(slug: String): Boolean =
    tokensOf(slug).exists(p => UniEscTok.matches(p))

  private val DurUnits = "\\d+(ms|s|sec|secs|m|min|mins|h|hr|hrs)".r
  private val DigitsMaybeLetter = "\\d+[a-z]?".r
  private val ZipLike = "\\d{1,2}-\\d{2}(-[a-z][a-z0-9]+)*".r
  private val CountPrefixed = "\\d+(-[a-z][a-z0-9]*)+".r

  /** `entity_quality.py:382-391`. */
  private def looksLikeDurationOrCountSlug(slug: String): Boolean =
    DurUnits.matches(slug) || DigitsMaybeLetter.matches(slug) ||
      ZipLike.matches(slug) || CountPrefixed.matches(slug)

  /** `entity_quality.py:394-409`: single-token verb conjugations of the
    * action/status roots.
    */
  private def looksLikeActionStatusSlug(slug: String): Boolean = {
    val parts = tokensOf(slug)
    if (parts.length != 1) false
    else {
      val token = parts.head
      ActionStatusRoots.exists { root =>
        var variants = Set(root, s"${root}s", s"${root}ed", s"${root}ing")
        if (root.endsWith("e"))
          variants ++= Set(s"${root}d", s"${root.init}ing")
        if (root.endsWith("y"))
          variants += s"${root.init}ied"
        variants.contains(token)
      }
    }
  }

  /** `entity_quality.py:412-417`. */
  private def looksLikeAbstractSingletonSlug(slug: String): Boolean = {
    val parts = tokensOf(slug)
    parts.length == 1 && parts.head.length >= 6 &&
      AbstractSingletonSuffixes.exists(parts.head.endsWith)
  }

  private val HexFragment = "[0-9a-f]{6,}".r
  private val IdFragment = "[a-z]\\d[a-z0-9]{5,}".r

  /** `entity_quality.py:420-426`. */
  private def looksLikeGeneratedFragmentSlug(slug: String): Boolean = {
    val parts = tokensOf(slug)
    parts.exists(t => HexFragment.matches(t)) ||
      parts.exists(t => IdFragment.matches(t))
  }

  private val LetterDigitRun = "[a-z]+\\d+".r

  /** `entity_quality.py:429-439`. */
  private def looksLikeMarkdownOrCodeFragment(tokens: Seq[String]): Boolean =
    if (tokens.length < 2) false
    else if (tokens.exists(MarkdownOrCodeTokens.contains)) true
    else tokens.count(t =>
      MarkdownOrCodeSecondaryTokens.contains(t) || LetterDigitRun.matches(t)) >= 2

  /** `entity_quality.py:442-452`. */
  private def looksLikeGeneratedPhraseSlug(category: String,
      tokens: Seq[String]): Boolean = {
    if (!Set("organizations", "tools", "projects", "concepts").contains(category)) false
    else if (tokens.length >= 6) true
    else if (tokens.exists(MonthTokens.contains) && tokens.exists(_.forall(_.isDigit))) true
    else if (tokens.length >= 2 &&
      Set("phase", "round", "sprint", "tier", "track").contains(tokens.head)) true
    else tokens.count(GeneratedPhraseTokens.contains) >= 1 && tokens.length >= 3
  }

  private val InternalCamel = "[a-z][A-Z]".r

  /** `entity_quality.py:455-459`. */
  private def hasInternalCamelcase(value: String): Boolean = {
    val v = Option(value).getOrElse("")
    val compact = v.replaceAll("[^A-Za-z0-9]", "")
    if (compact.isEmpty || v.trim.contains(" ")) false
    else InternalCamel.findFirstIn(compact).isDefined
  }

  /** `entity_quality.py:462-482`: camelcase or brand suffix condemns;
    * multi-token person-shaped names are exempt from context hints (a
    * technical corpus mentions data/projects/tools in nearly every memory).
    */
  private def looksToolOrOrgLike(value: String, slug: String,
      context: Option[String]): Boolean = {
    val parts = tokensOf(slug)
    if (hasInternalCamelcase(value)) true
    else if (parts.nonEmpty && ToolOrOrgSuffixes.exists(parts.last.endsWith)) true
    else if (parts.length >= 2 && hasPersonNameShape(parts)) false
    else {
      val lowered = context.getOrElse("").toLowerCase
      if (lowered.nonEmpty && lowered.replace(" ", "-").contains(slug))
        ToolOrOrgContextHints.exists(lowered.contains)
      else false
    }
  }

  /** `entity_quality.py:485-492`. */
  private def hasPersonNameShape(tokens: Seq[String]): Boolean =
    tokens.length match {
      case 1 => true
      case 2 => tokens(0) != tokens(1)
      case 3 if tokens(1).length == 1 || PersonNameParticles.contains(tokens(1)) =>
        tokens(0) != tokens(2)
      case _ => false
    }

  private val LettersOnly = "[a-z]+".r

  /** `entity_quality.py:542-642`: the gate. Branch order is part of the
    * contract (the reason string depends on it).
    */
  def validateSlug(category: String, slug: String,
      originalValue: Option[String] = None,
      context: Option[String] = None): ValidationResult = {
    val cat = normalizeCategory(category)
    val originalSlug = slugify(slug)
    val canonical = canonicalizeSlug(cat, originalSlug)
    val displayName = originalValue match {
      case Some(v) if slugify(v) == canonical => v.trim
      case _ => nameFromSlug(canonical)
    }
    def reject(reason: String) = ValidationResult(accepted = false, cat,
      originalSlug, canonical, reason, 0.0, displayName)
    def rejectCat(reason: String) = reject(
      if (cat == "people") "low_signal_people_slug" else reason)

    val tokens = tokensOf(canonical)
    if (!AllowedCategories.contains(cat)) reject("unknown_category")
    else if (canonical.isEmpty || canonical.length < 3) reject("too_short")
    else if (looksLikeUnicodeEscapeSlug(canonical) ||
      containsUnicodeEscapeToken(canonical)) reject("unicode_escape_slug")
    else if (looksLikeDurationOrCountSlug(canonical)) reject("duration_or_count_slug")
    else if (looksLikeActionStatusSlug(canonical)) rejectCat("generic_entity_slug")
    else if (looksLikeAbstractSingletonSlug(canonical)) rejectCat("generic_entity_slug")
    else if (looksLikeGeneratedFragmentSlug(canonical)) reject("generated_fragment_slug")
    else if (looksLikeMarkdownOrCodeFragment(tokens)) reject("markdown_or_code_fragment")
    else if (looksLikeGeneratedPhraseSlug(cat, tokens)) reject("generated_phrase_slug")
    else if (GenericEntitySlugs.contains(canonical) ||
      tokens.headOption.exists(ArticlePrefixes.contains) ||
      (tokens.nonEmpty && tokens.forall(GenericEntityTokens.contains)) ||
      (Set("organizations", "tools", "projects", "concepts").contains(cat) &&
        tokens.headOption.exists(ActionPrefixes.contains)))
      rejectCat("generic_entity_slug")
    else if (cat == "people" && tokens.exists(t => !LettersOnly.matches(t)))
      reject("non_name_people_slug")
    else if (cat == "people" && tokens.exists(t =>
      ActionPrefixes.contains(t) || GenericEntityTokens.contains(t) ||
        GeneratedPhraseTokens.contains(t) || MarkdownOrCodeTokens.contains(t) ||
        MarkdownOrCodeSecondaryTokens.contains(t) ||
        NonPersonTechTokens.contains(t) || NonPersonCommonTokens.contains(t)))
      reject("low_signal_people_slug")
    else if (cat == "people" && !hasPersonNameShape(tokens))
      reject("non_name_people_slug")
    else if (cat == "people" && looksToolOrOrgLike(
      originalValue.getOrElse(canonical), canonical, context))
      reject("tool_or_organization_looking_people")
    else {
      // entity_quality.py:516-539 confidence ladder
      var confidence = 0.95
      if (cat == "people" && tokens.length == 1) confidence = 0.6
      if (canonical != originalSlug) confidence = math.max(confidence, 0.85)
      ValidationResult(accepted = true, cat, originalSlug, canonical,
        "accepted", confidence, displayName)
    }
  }

  /** `entity_quality.py:645-656`. */
  def validateValue(category: String, value: String,
      context: Option[String] = None): ValidationResult =
    validateSlug(category, slugify(value),
      originalValue = Some(Option(value).getOrElse("").trim), context = context)

  /** `entity_quality.py:659-669`. */
  def validateTag(tag: String, context: Option[String] = None): ValidationResult = {
    val parts = Option(tag).getOrElse("").split(":", 3)
    if (parts.length != 3 || parts(0) != "entity") {
      val normalized = slugify(tag)
      ValidationResult(accepted = false, "", normalized, normalized,
        "invalid_entity_tag", 0.0, "")
    } else validateSlug(parts(1), parts(2), context = context)
  }
}
