package graft.domain

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Graph-level operators: snapshot export (S7), stats (A2/A3/A7), sync
  * accounting (S8), backup (S6), access bookkeeping (R8). References:
  * `/root/reference/automem/api/graph.py:51-208,386-421`,
  * `automem/sync/accounting.py:28-111`, `automem/backup.py`,
  * `automem/api/recall.py:2601-2609`.
  */
object GraphOps {

  /** S7 graph snapshot: nodes filtered by importance/type/since, top-N by
    * importance, all edges among visible nodes (double broadcast semi-join,
    * J5), plus computed visual columns (`graph.py:51-208`).
    */
  def snapshot(memories: DataFrame, edges: DataFrame, minImportance: Double = 0.0,
      types: Seq[String] = Nil, since: Option[Timestamp] = None,
      topN: Int = 100): (DataFrame, DataFrame) = {
    var nodes = memories.filter(col("importance") >= minImportance)
      .filter(!col("type").isin(Schema.RecallExcludedTypes: _*))
    if (types.nonEmpty) nodes = nodes.filter(col("type").isin(types: _*))
    since.foreach(s => nodes = nodes.filter(col("timestamp") >= lit(s)))
    val visible = nodes
      .orderBy(desc("importance"), desc("timestamp"), asc("id"))
      .limit(topN)
      .withColumn("node_size", lit(4.0) + col("importance") * 12.0)
      .withColumn("node_label", substring(col("content"), 1, 60))
      .select(col("id"), col("type"), col("importance"), col("timestamp"),
        col("node_size"), col("node_label"))
    val ids = visible.select(col("id"))
    val visEdges = edges
      .join(broadcast(ids.withColumnRenamed("id", "src")), Seq("src"), "left_semi")
      .join(broadcast(ids.withColumnRenamed("id", "dst")), Seq("dst"), "left_semi")
    (visible, visEdges)
  }

  /** J6 variable-depth neighbors (`/graph/neighbors`, `automem/api/
    * recall.py:2940-2965`, depth <= 3): bounded undirected BFS via iterated
    * joins with an anti-join visited set, distinct nodes ordered by
    * importance/timestamp. Each hop shuffles only the frontier.
    */
  def neighbors(memories: DataFrame, edges: DataFrame, startId: String,
      depth: Int = 2, relTypes: Seq[String] = Nil): DataFrame = {
    require(depth >= 1 && depth <= 3, "depth must be 1..3")
    var filtered = edges
    if (relTypes.nonEmpty) filtered = filtered.filter(col("rel_type").isin(relTypes: _*))
    val undirected = filtered.select(col("src"), col("dst"))
      .unionByName(filtered.select(col("dst").as("src"), col("src").as("dst")))
    val spark = memories.sparkSession
    import spark.implicits._
    var visited = Seq(startId).toDF("id")
    var frontier = visited
    for (d <- 1 to depth) {
      val next = undirected.join(frontier.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
      frontier = next
      visited = visited.unionByName(next).distinct()
    }
    memories.join(visited.filter(col("id") =!= startId), Seq("id"))
      .orderBy(desc("importance"), desc("timestamp"), asc("id"))
  }

  /** A2: relationship counts by type (`graph.py:386-392`). */
  def edgeTypeCounts(edges: DataFrame): DataFrame =
    edges.groupBy(col("rel_type")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("rel_type"))

  /** A3 over memories: importance distribution buckets (`graph.py:395-406`). */
  def importanceBuckets(memories: DataFrame): DataFrame =
    memories.agg(
      sum(when(col("importance") >= 0.8, 1).otherwise(0)).as("high"),
      sum(when(col("importance") >= 0.5 && col("importance") < 0.8, 1).otherwise(0))
        .as("medium"),
      sum(when(col("importance") < 0.5, 1).otherwise(0)).as("low"))

  /** A7: top-k PREFERS_OVER edges by effective strength; top-k patterns by
    * confidence (`recall.py:2770-2807`). The reference coalesces
    * strength/score/confidence per edge, so an edge carrying only
    * `confidence` must not sort as null.
    */
  def topPreferences(edges: DataFrame, k: Int = 10): DataFrame = {
    val strength = coalesce(col("strength"), col("score"), col("confidence"),
      col("similarity"), col("count").cast("double"), lit(0.0))
    edges.filter(col("rel_type") === "PREFERS_OVER")
      .withColumn("strength", strength)
      .orderBy(desc("strength"), asc("src"), asc("dst"))
      .limit(k)
  }

  def topPatterns(patterns: DataFrame, k: Int = 10): DataFrame =
    patterns.filter(col("confidence") > 0.6)
      .orderBy(desc("confidence"), asc("id"))
      .limit(k)

  /** S8 sync accounting: counts excluding artifact types + id diffs both
    * directions between the canonical store and a replica
    * (`automem/sync/accounting.py:28-111`). In the single-table engine this
    * validates replicas/exports instead of FalkorDB-vs-Qdrant.
    */
  def syncDiff(canonical: DataFrame, replica: DataFrame): DataFrame = {
    // the artifact-type exclusion applies to BOTH sides (the reference's
    // accounting filters excluded types on Falkor AND Qdrant) — filtering
    // only the canonical side would report every legitimately replicated
    // artifact row as missing_in=canonical on an identical pair
    def noArtifacts(df: DataFrame): DataFrame =
      if (df.columns.contains("type"))
        df.filter(!col("type").isin(Schema.RecallExcludedTypes: _*))
      else df
    val a = noArtifacts(canonical).select(col("id"))
    val b = noArtifacts(replica).select(col("id"))
    a.exceptAll(b).withColumn("missing_in", lit("replica"))
      .unionByName(b.exceptAll(a).withColumn("missing_in", lit("canonical")))
  }

  /** S6 backup sink: partitioned parquet snapshot of all relations. */
  def backup(memories: DataFrame, edges: DataFrame, path: String): Unit = {
    memories.write.mode("overwrite").parquet(s"$path/memories")
    edges.write.mode("overwrite").parquet(s"$path/edges")
  }

  /** S4 delete-by-tag as a batch rewrite (`automem/api/memory.py:326-364`):
    * the reference loops pages of 200 `DETACH DELETE`; in batch that is one
    * anti-join on the doomed id set per relation — memories drop, and edges
    * touching a deleted endpoint drop with them (the DETACH semantics).
    * Returns the rewritten (memories, edges).
    */
  def deleteByTag(memories: DataFrame, edges: DataFrame, tags: Seq[String],
      tagMode: String = "any", tagMatch: String = "exact"): (DataFrame, DataFrame) = {
    val doomed = memories
      .filter(Recall.tagPredicate(tags, tagMode, tagMatch))
      .select(col("id"))
    val keptMems = memories.join(doomed, Seq("id"), "left_anti")
    val keptEdges = edges
      .join(doomed.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(doomed.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
    (keptMems, keptEdges)
  }

  /** R8 access bookkeeping as a batch MERGE: matched ids get
    * last_accessed = now (`recall.py:2601-2609` made deterministic).
    */
  def touchLastAccessed(memories: DataFrame, matchedIds: DataFrame,
      now: Timestamp): DataFrame =
    memories.join(matchedIds.select(col("id")).distinct()
        .withColumn("_hit", lit(true)), Seq("id"), "left")
      .withColumn("last_accessed",
        when(col("_hit"), lit(now)).otherwise(col("last_accessed")))
      .drop("_hit")
}
