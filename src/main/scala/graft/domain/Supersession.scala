package graft.domain

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Current-state supersession resolution (J4, `/root/reference/automem/api/
  * recall.py:452-723`): follow INVALIDATED_BY / EVOLVED_INTO chains from each
  * candidate to the chain head — newest edge per source, bounded depth (5),
  * cycle-safe — and replace suppressed rows with the head while keeping the
  * FIRST hop's relation as provenance (`recall.py:580-586`).
  *
  * Implementation is the bounded-iterative-join pattern: at most `MaxDepth`
  * joins against a deduplicated next-hop edge map. Each iteration is a plain
  * equi-join, so at scale this is `MaxDepth` shuffles over only the
  * still-walking frontier (monotonically shrinking).
  */
object Supersession {
  val MaxDepth = 5

  /** One next-hop per source: the newest supersession edge
    * (`recall.py:477-499`).
    */
  def nextHops(edges: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("src")).orderBy(desc("updated_at"), desc("dst"))
    edges.filter(col("rel_type").isin(Schema.SupersessionRelations: _*))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("src"), col("dst"), col("rel_type"))
  }

  /** Resolve each id to (head_id, first_rel, depth). Ids with no outgoing
    * supersession edge resolve to themselves at depth 0. Cycles stop the walk
    * at the last unvisited node.
    *
    * Finished rows LEAVE the loop: each iteration splits the frontier into
    * rows that stepped (join input for the next round) and rows that are done
    * (unioned into the result) — supersession chains are sparse, so after
    * round 1 the walking set is only the chained ids, not the whole
    * candidate set.
    */
  def resolveHeads(ids: DataFrame, edges: DataFrame): DataFrame = {
    val hops = nextHops(edges).cache()
    val cols = Seq("id", "cur", "first_rel", "path", "depth")
    var active = ids.select(
      col("id"),
      col("id").as("cur"),
      lit(null).cast("string").as("first_rel"),
      array(col("id")).as("path"),
      lit(0).as("depth"))
    var finished: Option[DataFrame] = None
    for (_ <- 1 to MaxDepth) {
      val stepped = active
        .join(hops.withColumnRenamed("src", "cur")
          .withColumnRenamed("dst", "next")
          .withColumnRenamed("rel_type", "next_rel"), Seq("cur"), "left")
        .withColumn("step",
          col("next").isNotNull && !array_contains(col("path"), col("next")))
      val nowDone = stepped.filter(!col("step")).select(cols.map(col): _*)
      finished = Some(finished.map(_.unionByName(nowDone)).getOrElse(nowDone))
      active = stepped.filter(col("step")).select(
        col("id"),
        col("next").as("cur"),
        coalesce(col("first_rel"), col("next_rel")).as("first_rel"),
        array_append(col("path"), col("next")).as("path"),
        (col("depth") + 1).as("depth"))
    }
    // rows still walking at MaxDepth stop where they are. The resolution is
    // bounded (<= candidate-set rows) — materialize it so the next-hop
    // cache can be RELEASED here; a long-lived session running one
    // current-state recall per request would otherwise accumulate one
    // cached hop frame per call
    val resolved = finished.get.unionByName(active)
      .select(col("id"), col("cur").as("head_id"), col("first_rel"), col("depth"))
      .localCheckpoint()
    hops.unpersist()
    resolved
  }

  /** Apply current-state mode to a recall candidate set (`id` + any score
    * columns): each candidate resolves to its chain head; suppressed rows are
    * replaced by the head's memory row (if present and currently VALID),
    * candidate-only columns (scores) carried over, duplicates collapsed
    * (self-resolutions win over replacements), with `superseded_from` /
    * `supersession_rel` provenance from the FIRST hop.
    *
    * Validity mirrors `_state_reason_for_memory` (`recall.py:437-449`):
    * archived rows, rows with `t_valid > now` (not yet valid), and rows with
    * `t_invalid <= now` (expired) are state-suppressed — including
    * self-resolved candidates with no supersession edge, which simply drop
    * out when their own row fails the validity join.
    */
  def applyCurrentState(candidates: DataFrame, memories: DataFrame,
      edges: DataFrame,
      now: java.sql.Timestamp = new java.sql.Timestamp(0L)): DataFrame = {
    val nowCol =
      if (now.getTime == 0L) current_timestamp() else lit(now)
    val resolved = resolveHeads(candidates.select(col("id")).distinct(), edges)
    val memCols = memories.columns.toSet
    val extras = candidates.columns.filter(c => c != "id" && !memCols.contains(c))
    val mapped = candidates.join(resolved, Seq("id"))
      .withColumn("superseded_from",
        when(col("head_id") =!= col("id"), col("id")))
      .withColumn("supersession_rel",
        when(col("head_id") =!= col("id"), col("first_rel")))
      .select(extras.toSeq.map(col) ++
        Seq(col("head_id").as("id"), col("superseded_from"), col("supersession_rel")): _*)
    val live = memories
      .filter(!coalesce(col("archived"), lit(false)))
      .filter(col("t_valid").isNull || col("t_valid") <= nowCol)
      .filter(col("t_invalid").isNull || col("t_invalid") > nowCol)
    val hydrated = mapped.join(live, Seq("id"))
    // collapse candidates resolving to the same head: self-resolutions win
    // (the reference seeds seen_ids with every result id upfront,
    // `recall.py:623` — a replacement targeting an id present anywhere in
    // the results is dropped), then the HIGHEST-RANKED replacement
    // (`recall.py:635` iterates in rank order, first wins — rank order is
    // score order), with superseded_from as the determinism tie-break
    val rankScore =
      if (hydrated.columns.contains("final_score"))
        coalesce(col("final_score"), lit(0.0))
      else lit(0.0)
    val w = Window.partitionBy(col("id"))
      .orderBy(when(col("superseded_from").isNull, 0).otherwise(1).asc,
        rankScore.desc, asc_nulls_first("superseded_from"))
    hydrated.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}
