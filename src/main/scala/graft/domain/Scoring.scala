package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The 9-component weighted recall score (`/root/reference/automem/utils/
  * scoring.py:137-280`), as one wide Catalyst projection — pure arithmetic,
  * whole-stage codegen, no shuffle. Component columns are emitted alongside
  * the final score so callers can expose the per-component breakdown the
  * reference returns (`scoring.py:264-278`).
  */
object Scoring {

  /** Default component weights (`automem/config.py:473-482`). */
  case class Weights(
      vector: Double = 0.35,
      keyword: Double = 0.35,
      metadata: Double = 0.35,
      relation: Double = 0.25,
      tag: Double = 0.2,
      importance: Double = 0.1,
      confidence: Double = 0.05,
      recency: Double = 0.1,
      exact: Double = 0.2,
      relevance: Double = 0.0)

  /** Recency curve (`scoring.py:66-81`, `config.py:499-503`): linear decay
    * to zero over `windowDays` (default 180), or exponential half-life when
    * `halfLifeDays` is set.
    */
  def recency(ageDays: Column, windowDays: Double = 180.0,
      halfLifeDays: Option[Double] = None): Column = {
    // future timestamps clamp to age 0 -> score 1.0 (`scoring.py:74-76`
    // max(age, 0)), not a score above 1
    val age = greatest(lit(0.0), ageDays)
    halfLifeDays match {
      case Some(hl) => exp(age * (-math.log(2.0) / hl))
      case None => greatest(lit(0.0), lit(1.0) - age / windowDays)
    }
  }

  /** Tag-match component (`scoring.py:137-180` tag logic): fraction of query
    * tokens appearing in the tags-or-metadata-terms set; denominator
    * optionally capped (`config.py:527-529`).
    */
  def tagScore(queryTokens: Seq[String], termSet: Column,
      denominatorCap: Option[Int] = None): Column = {
    if (queryTokens.isEmpty) lit(0.0)
    else {
      val hits = queryTokens.map(t => when(array_contains(termSet, t), 1).otherwise(0))
        .reduce(_ + _)
      val denom = denominatorCap
        .map(c => lit(math.min(queryTokens.length, c)))
        .getOrElse(lit(queryTokens.length))
      hits.cast("double") / denom
    }
  }

  /** Keyword fallback: content-token hit ratio when no keyword-channel score
    * exists (`scoring.py:184-196`).
    */
  def keywordFallback(queryTokens: Seq[String], contentLower: Column): Column =
    if (queryTokens.isEmpty) lit(0.0)
    else queryTokens.map(t => when(contentLower.contains(t), 1).otherwise(0))
      .reduce(_ + _).cast("double") / queryTokens.length

  case class ComponentColumns(
      vector: Column, keyword: Column, metadata: Column, relation: Column,
      tag: Column, importance: Column, confidence: Column, recency: Column,
      exact: Column, relevance: Column, context: Column)

  /** Final score = sum of weighted components + context bonus, with the
    * opt-in relevance gate (`scoring.py:229-262`): when the best topical
    * evidence max(vector, keyword, metadata, exact) falls below `gate`,
    * query-independent components (importance, confidence, recency, tag,
    * relevance) are scaled by evidence/gate. Tag overlap is gated too —
    * inside a tag-scoped pool the scope tag matching a query token is
    * scope-confounded, not topical, evidence (`scoring.py:229-236`).
    */
  def finalScore(c: ComponentColumns, w: Weights = Weights(),
      relevanceGate: Option[Double] = None): Column = {
    val evidence = greatest(c.vector, c.keyword, c.metadata, c.exact)
    val scale = relevanceGate match {
      case Some(g) => when(evidence < g, evidence / g).otherwise(lit(1.0))
      case None => lit(1.0)
    }
    c.vector * w.vector + c.keyword * w.keyword + c.metadata * w.metadata +
      c.relation * w.relation +
      (c.tag * w.tag + c.importance * w.importance +
        c.confidence * w.confidence + c.recency * w.recency +
        c.relevance * w.relevance) * scale +
      c.exact * w.exact + c.context
  }

  /** Context bonus (`scoring.py:100-134`; weights `recall.py:1053-1058`):
    * priority-tag hit 0.45, priority-type 0.25, context-keyword 0.2,
    * anchor-id 0.9. Tag hits canonicalize `/` and `:` runs to one `:` on
    * BOTH sides and match exact OR prefix OR substring
    * (`scoring.py:84-97` `_context_tag_hit` — a context tag `project:foo`
    * must hit a `project/foo`-tagged memory). The keyword hit probes the
    * METADATA TERM SET, not the content (`scoring.py:125-127`).
    */
  /** Python str.title(): capitalize each letter run, lowercase the rest —
    * how the reference normalizes priority types at profile construction
    * (`recall.py:1007` `.strip().title()`).
    */
  private def pyTitle(s: String): String = {
    val sb = new StringBuilder
    var prevLetter = false
    s.foreach { c =>
      if (c.isLetter) { sb += (if (prevLetter) c.toLower else c.toUpper); prevLetter = true }
      else { sb += c; prevLetter = false }
    }
    sb.toString
  }

  def contextBonus(tags: Column, typ: Column, metadataTerms: Column, id: Column,
      priorityTags: Seq[String], priorityTypes: Seq[String],
      contextKeywords: Seq[String], priorityIds: Seq[String]): Column = {
    val tagHit = if (priorityTags.isEmpty) lit(0.0)
      else {
        // reference profile construction lowercases tags (`recall.py:1007`
        // `.strip().lower()`) before the [:/] canonicalization; exact and
        // prefix matches are both subsumed by the substring probe
        // (`scoring.py:95` norm_tag == p or startswith or p in norm_tag)
        val normPriorities = priorityTags
          .map(_.trim.toLowerCase.replaceAll("[:/]+", ":"))
          .filter(_.nonEmpty)
        if (normPriorities.isEmpty) lit(0.0)
        else {
          // memory tags lowercase too (`scoring.py` tag_terms = lowercased
          // set) — symmetric with the profile side, so mixed-case tags from
          // non-normalized sources still match
          val hit = exists(tags, t => {
            val nt = regexp_replace(lower(t), "[:/]+", ":")
            normPriorities.map(p => nt.contains(lit(p))).reduce(_ || _)
          })
          when(hit, 0.45).otherwise(0.0)
        }
      }
    // both sides through the SAME title-case semantics (`scoring.py:121-123`
    // titles the memory type too): Spark's initcap only capitalizes after
    // whitespace, which diverges from Python .title() for hyphenated or
    // digit-embedded types, so the column side uses the same scalar fn
    val normTypes = priorityTypes.map(t => pyTitle(t.trim)).filter(_.nonEmpty)
    val pyTitleUdf = udf((s: String) => if (s == null) null else pyTitle(s.trim))
    val typeHit = if (normTypes.isEmpty) lit(0.0)
      else when(pyTitleUdf(typ).isin(normTypes: _*), 0.25).otherwise(0.0)
    // the metadata term set is lowercased (MetadataScoring.collectTerms),
    // and the reference's priority_keywords are lowercase by construction
    // (language hints, `recall.py:1016-1027`) — normalize free-form
    // keywords the same way or a mixed-case keyword can never hit
    val normKws = contextKeywords.map(_.trim.toLowerCase).filter(_.nonEmpty)
    val kwHit = if (normKws.isEmpty) lit(0.0)
      else when(normKws.map(k => array_contains(metadataTerms, k))
        .reduce(_ || _), 0.2).otherwise(0.0)
    val idHit = if (priorityIds.isEmpty) lit(0.0)
      else when(id.isin(priorityIds: _*), 0.9).otherwise(0.0)
    tagHit + typeHit + kwHit + idHit
  }
}
