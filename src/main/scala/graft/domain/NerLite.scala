package graft.domain

/** Deterministic rule-based named-entity recognition — the network-free
  * stand-in for the reference's optional spaCy NER channel
  * (`/root/reference/automem/utils/entity_extraction.py:151-182`: spaCy
  * labels map PERSON -> people, ORG -> organizations, PRODUCT/WORK_OF_ART ->
  * tools, EVENT/GPE/LOC -> concepts, every span then gated by the entity
  * validity rules). The reference treats spaCy as optional (absent import ->
  * regex fallback only); this recognizer restores the recall the NER channel
  * adds — multi-token names and location mentions that the cue-word regexes
  * cannot see — with classic rule-based NER heuristics (capitalized-span
  * chunking + suffix/honorific/preposition lexicons) instead of a model, so
  * extraction stays bit-deterministic and dependency-free.
  *
  * Pure per-document logic (no Spark types): the Spark side runs it inside
  * the same bounded-candidate UDF stage as the regex channel, so the hot
  * path stays codegen'd and this runs once per document, like the
  * reference's per-memory spaCy call.
  */
object NerLite {

  /** Honorifics marking the following span as a person (classic rule-based
    * NER feature; the period-less forms also match "Dr Elena").
    */
  private val Honorifics = Set("mr", "mrs", "ms", "dr", "prof", "professor",
    "captain", "sir", "dame")

  /** Organization suffix lexicon (the standard gazetteer feature). */
  private val OrgSuffixes = Set("inc", "corp", "ltd", "llc", "gmbh", "labs",
    "university", "institute", "foundation", "company", "group", "systems",
    "technologies", "bank", "agency", "committee", "association")

  /** Organization HEAD words for "University of Oslo"-shaped names. */
  private val OrgHeads = Set("university", "institute", "bank", "ministry",
    "department", "museum", "college")

  /** Prepositions marking the following span as a location/GPE mention. */
  private val LocPrepositions = Set("in", "at", "near", "from", "to",
    "toward", "towards", "around")

  /** Lowercase connectors allowed INSIDE a capitalized span ("University of
    * Oslo", "Museum of Modern Art").
    */
  private val SpanConnectors = Set("of", "the", "de", "van", "von", "&",
    "and")

  /** Capitals that are never entities on their own: question words, months,
    * weekdays, demonyms — the query-entity stopword set
    * (`api/recall.py:90-148`) plus sentence-leading temporal capitals.
    */
  private val CapStopwords: Set[String] =
    Recall.EntityStopwords.map(_.toLowerCase) ++
      Set("yesterday", "today", "tomorrow", "tonight", "meanwhile", "however",
        "finally", "eventually", "suddenly", "afterwards", "later")

  private def isCap(w: String): Boolean =
    w.length >= 2 && w.head.isUpper && w.tail.forall(c => c.isLower || c.isDigit)

  private case class Span(tokens: Vector[String], startIdx: Int,
      sentenceStart: Boolean, prev: Option[String])

  /** Chunk maximal capitalized spans out of the token stream. A span may
    * bridge one lowercase connector between two capitalized words. Sentence
    * position and the preceding word ride along as labeling features.
    */
  private def spans(text: String): Seq[Span] = {
    val words = text.split("\\s+").filter(_.nonEmpty).toVector
    val out = Vector.newBuilder[Span]
    var i = 0
    while (i < words.length) {
      val clean = words(i).replaceAll("^[^A-Za-z0-9&]+|[^A-Za-z0-9&]+$", "")
      if (isCap(clean)) {
        val start = i
        val toks = Vector.newBuilder[String]
        toks += clean
        var j = i + 1
        var lastCapAt = 0 // offset of last CAPITALIZED token in the span
        var n = 1
        var continue = true
        while (continue && j < words.length && n < 6) {
          val w = words(j)
          val c = w.replaceAll("^[^A-Za-z0-9&]+|[^A-Za-z0-9&]+$", "")
          val prevHadTerminalPunct = "[.!?,;:]$".r.findFirstIn(words(j - 1)).isDefined
          if (prevHadTerminalPunct) continue = false
          else if (isCap(c)) { toks += c; lastCapAt = n; n += 1; j += 1 }
          else if (SpanConnectors.contains(c.toLowerCase) && n - lastCapAt == 1 &&
            j + 1 < words.length &&
            isCap(words(j + 1).replaceAll("^[^A-Za-z0-9&]+|[^A-Za-z0-9&]+$", ""))) {
            toks += c.toLowerCase; n += 1; j += 1
          } else continue = false
        }
        val sentenceStart = start == 0 ||
          "[.!?]$".r.findFirstIn(words(start - 1)).isDefined
        val prev = if (start == 0) None
          else Some(words(start - 1).replaceAll("[^A-Za-z]", "").toLowerCase)
        out += Span(toks.result(), start, sentenceStart, prev)
        i = j
      } else i += 1
    }
    out.result()
  }

  /** Label a span with the reference's category mapping, or None to drop.
    * Rules, in precedence order (mirroring how gazetteer features outrank
    * shape features in rule-based NER):
    *  1. org suffix/head lexicon -> organizations
    *  2. honorific before the span -> people (honorific stripped)
    *  3. location preposition before a short span, mid-sentence -> concepts
    *     (spaCy GPE/LOC map there, `entity_extraction.py:179-180`); checked
    *     BEFORE the people shape so "met in New York" labels as a location,
    *     not a Firstname-Lastname person
    *  4. 2-3 simple capitalized tokens, mid-sentence or honorific-less
    *     sentence start -> people candidate (Firstname Lastname shape; the
    *     EntityQuality people gates do the fine filtering)
    *  5. single capitalized mid-sentence token with no cue -> dropped: too
    *     noisy without a model, and the regex cue patterns already cover
    *     tools/people introduced by cue words.
    */
  private def label(s: Span): Option[(String, String)] = {
    // trim the span: leading honorifics become a people cue (the chunker
    // absorbs "Dr" — it is a capitalized token); leading/trailing
    // capitalized stopwords ("Yesterday Elena Vasquez", "Elena Vasquez
    // May") are ordinary sentence words that happen to be capitalized
    var toks = s.tokens
    var honorific = false
    while (toks.nonEmpty && Honorifics.contains(toks.head.toLowerCase)) {
      toks = toks.tail; honorific = true
    }
    while (toks.nonEmpty && CapStopwords.contains(toks.head.toLowerCase))
      toks = toks.tail
    while (toks.nonEmpty && (CapStopwords.contains(toks.last.toLowerCase) ||
      SpanConnectors.contains(toks.last.toLowerCase)))
      toks = toks.init
    if (toks.isEmpty) return None
    val joined = toks.mkString(" ")
    val lastLower = toks.last.toLowerCase
    val headLower = toks.head.toLowerCase
    if (toks.length >= 2 &&
      (OrgSuffixes.contains(lastLower) || OrgHeads.contains(headLower)))
      Some(("organizations", joined))
    else if (honorific || s.prev.exists(Honorifics.contains))
      Some(("people", joined))
    else if (toks.length <= 2 && s.prev.exists(LocPrepositions.contains) &&
      !s.sentenceStart)
      Some(("concepts", joined))
    else if (toks.length >= 2 && toks.length <= 3 &&
      toks.forall(t => t.head.isUpper && t.tail.forall(_.isLower)))
      Some(("people", joined))
    else None
  }

  /** Extract (category, name) candidates from one document. Candidates are
    * RAW — the caller must gate them through
    * [[EntityQuality.validateValue]] with the document as context, exactly
    * like the spaCy channel (`entity_extraction.py:231-238`).
    */
  def candidates(text: String): Seq[(String, String)] = {
    if (text == null || text.isEmpty) return Nil
    spans(text).flatMap(label).distinct
  }
}
