package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Q5 metadata sidecar search, full-fidelity version (`/root/reference/
  * automem/search/runtime_recall_helpers.py:25-60` whitelist+aliases,
  * `:191-340` scoring): only a fixed whitelist of metadata fields is
  * searchable; aliases normalize query-side field hints; the score is
  * 0.15 + 0.45*value_ratio + 0.20*query_ratio + 0.15*exact
  * + 0.20*field_requested, capped at 1.0.
  *
  * Two-phase plan: a cheap `contains` prefilter on the raw JSON string
  * prunes the scan (pushed to the data), then the typed re-score runs only
  * on survivors — project-after-limit, mirroring the reference's scan cap.
  */
object MetadataSearch {

  /** Searchable metadata fields (reference whitelist of 12). */
  val FieldWhitelist: Seq[String] = Seq(
    "source", "project", "repo", "branch", "tool", "client", "session",
    "speaker", "channel", "category", "status", "topic")

  /** Query-side aliases -> canonical field names. */
  val FieldAliases: Map[String, String] = Map(
    "repository" -> "repo", "proj" -> "project", "app" -> "tool",
    "author" -> "speaker", "user" -> "speaker", "state" -> "status")

  def canonicalField(name: String): Option[String] = {
    val n = name.trim.toLowerCase
    if (FieldWhitelist.contains(n)) Some(n) else FieldAliases.get(n)
  }

  /** Detect whether the query explicitly names a whitelisted field
    * ("repo:automem", "in project alpha").
    */
  def requestedFields(query: String): Seq[String] =
    "([a-z]+)\\s*[:=]".r.findAllMatchIn(query.toLowerCase)
      .flatMap(m => canonicalField(m.group(1))).toSeq.distinct

  /** Score a metadata JSON-string column against query tokens.
    * value_ratio: fraction of whitelisted field values containing a query
    * token; query_ratio: fraction of query tokens found in any whitelisted
    * value; exact: the whole query appears in a value; field_requested: a
    * field the query names has a matching value.
    */
  def score(metadata: Column, query: String): Column = {
    val tokens = Recall.keywords(query)
    if (tokens.isEmpty) return lit(0.0)
    val fields = FieldWhitelist.map(f =>
      f -> lower(get_json_object(metadata, s"$$.$f")))
    val present = fields.map { case (_, v) => when(v.isNotNull, 1).otherwise(0) }
      .reduce(_ + _)
    val valueHit = fields.map { case (_, v) =>
      when(v.isNotNull &&
        tokens.map(t => v.contains(t)).reduce(_ || _), 1).otherwise(0)
    }.reduce(_ + _)
    val valueRatio = when(present === 0, 0.0)
      .otherwise(valueHit.cast("double") / present)
    val queryHit = tokens.map(t =>
      when(fields.map { case (_, v) => v.isNotNull && v.contains(t) }
        .reduce(_ || _), 1).otherwise(0)).reduce(_ + _)
    val queryRatio = queryHit.cast("double") / tokens.length
    val exact = when(fields.map { case (_, v) =>
      v.isNotNull && v.contains(query.toLowerCase)
    }.reduce(_ || _), 1.0).otherwise(0.0)
    val reqFields = requestedFields(query)
    val fieldRequested = if (reqFields.isEmpty) lit(0.0)
      else when(fields.collect { case (f, v) if reqFields.contains(f) =>
        v.isNotNull && tokens.map(t => v.contains(t)).reduce(_ || _)
      }.reduce(_ || _), 1.0).otherwise(0.0)
    least(lit(1.0),
      lit(0.15) + lit(0.45) * valueRatio + lit(0.20) * queryRatio +
        lit(0.15) * exact + lit(0.20) * fieldRequested)
  }

  /** Cheap prefilter: any query token appears in the raw JSON string. */
  def prefilter(metadata: Column, query: String): Column = {
    val tokens = Recall.keywords(query)
    if (tokens.isEmpty) lit(false)
    else tokens.map(t => lower(metadata).contains(t)).reduce(_ || _)
  }
}
