package graft.domain

import java.sql.Timestamp

import graft.functions.TextFunctions
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Batched recall: run MANY recall requests against the corpus in ONE Spark
  * plan — the engine's answer to the reference's one-request-at-a-time
  * online serving (BASELINE.json: "Batch embedding + graph build, not online
  * serving"). A queries relation (qid, query) joins the memories relation
  * once per channel; every downstream stage (scoring, dedup, ranking) is a
  * window partitioned by qid. Amortized cost per query is a small constant
  * over the corpus scan instead of a full plan execution per request.
  *
  * Scale shape: the queries side is broadcast (requests are small); the
  * memories side is scanned once per channel; per-query top-k are windows on
  * (qid) — total shuffle volume is O(queries x overfetch), not O(corpus).
  * At index scale the vector channel drops in an IVF/LSH pre-filter (see
  * ARCHITECTURE.md) without changing this plan's structure.
  */
object BatchRecall {

  /** Queries df must have (qid: any, query: string). Returns per-qid ranked
    * results (qid, rank, id, final_score, match_type + component columns).
    */
  def batchRecall(memories: DataFrame, edges: DataFrame, queries: DataFrame,
      limit: Int = 10, weights: Scoring.Weights = Scoring.Weights(),
      now: Timestamp = Timestamp.valueOf("2026-01-01 00:00:00")): DataFrame = {
    val overfetch = math.min(limit * Recall.OverfetchFactor, Recall.OverfetchCap)
    val stop = array(Recall.Stopwords.toSeq.map(lit): _*)
    val q = queries
      .withColumn("qvec", PlaceholderEmbedding.embedColumn()(col("query")))
      .withColumn("qlower", lower(col("query")))
      .withColumn("qtokens",
        filter(array_distinct(TextFunctions.tokens(col("query"))),
          t => length(t) >= 3 && !array_contains(stop, t)))
    val base = Recall.baseFilter(memories, RecallRequest(now = now))

    // ---- vector channel: one corpus x queries similarity pass
    val wq = Window.partitionBy(col("qid")).orderBy(desc("channel_score"), asc("id"))
    val vec = base.crossJoin(broadcast(q))
      .withColumn("channel_score", cosineSim(col("embedding"), col("qvec")))
      .withColumn("match_type", lit("vector"))
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= overfetch)
      .select(col("qid"), col("id"), col("match_type"), col("channel_score"))

    // ---- keyword channel: +2 per contained token, +1 tag hit, phrase bonus,
    // normalized by the per-qid max raw score
    val lc = lower(col("content"))
    val raw = aggregate(col("qtokens"), lit(0), (acc, t) =>
      acc + when(lc.contains(t), 2).otherwise(0) +
        when(exists(col("tags"), tag => tag.contains(t)), 1).otherwise(0)) +
      when(lc.contains(col("qlower")), 2).otherwise(0)
    val kwAll = base.crossJoin(broadcast(q))
      .withColumn("raw", raw)
      .filter(col("raw") > 0)
    val kw = kwAll
      .withColumn("channel_score",
        col("raw").cast("double") / max(col("raw")).over(Window.partitionBy(col("qid"))))
      .withColumn("match_type", lit("keyword"))
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= overfetch)
      .select(col("qid"), col("id"), col("match_type"), col("channel_score"))

    // ---- union, best score per channel per (qid, id)
    val perId = vec.unionByName(kw)
      .groupBy(col("qid"), col("id"))
      .agg(
        max(when(col("match_type") === "vector", col("channel_score"))).as("vector_score"),
        max(when(col("match_type") === "keyword", col("channel_score"))).as("keyword_score"))
      .withColumn("match_type",
        when(col("vector_score").isNotNull, "vector").otherwise("keyword"))

    // ---- hydrate + component scoring (same formulas as Recall.scoreCandidates)
    val hydrated = perId.join(base, Seq("id")).join(broadcast(q), Seq("qid"))
    val ageDays = (unix_timestamp(lit(now)) - unix_timestamp(col("timestamp"))) / 86400.0
    val kwFallback = when(size(col("qtokens")) === 0, 0.0).otherwise(
      aggregate(col("qtokens"), lit(0), (acc, t) =>
        acc + when(lc.contains(t), 1).otherwise(0)).cast("double") / size(col("qtokens")))
    val tagScore = when(size(col("qtokens")) === 0, 0.0).otherwise(
      size(array_intersect(col("qtokens"), col("tags"))).cast("double") /
        size(col("qtokens")))
    val comps = Scoring.ComponentColumns(
      vector = coalesce(col("vector_score"), lit(0.0)),
      keyword = coalesce(col("keyword_score"), kwFallback),
      metadata = lit(0.0),
      relation = lit(0.0),
      tag = tagScore,
      importance = coalesce(col("importance"), lit(0.0)),
      confidence = coalesce(col("confidence"), lit(0.0)),
      recency = Scoring.recency(ageDays),
      exact = when(lower(col("metadata")).contains(col("qlower")), 1.0).otherwise(0.0),
      relevance = coalesce(col("relevance_score"), lit(0.0)),
      context = lit(0.0))
    val scored = hydrated
      .withColumn("s_vector", comps.vector)
      .withColumn("s_keyword", comps.keyword)
      .withColumn("s_tag", comps.tag)
      .withColumn("final_score", Scoring.finalScore(comps, weights))

    // ---- R1 fingerprint dedup per qid, R2 sort, per-qid top-k
    val fp = TextFunctions.fingerprint(col("content"), 320)
    val wDedup = Window.partitionBy(col("qid"), col("_fp"))
      .orderBy(desc("final_score"), desc("timestamp"), asc("id"))
    val wRank = Window.partitionBy(col("qid")).orderBy(
      desc("final_score"),
      when(col("match_type") === "vector", 0).otherwise(1).asc,
      desc("importance"), desc("timestamp"), asc("id"))
    scored
      .withColumn("_fp", when(length(fp) > 0, fp).otherwise(col("id")))
      .withColumn("_dd", row_number().over(wDedup))
      .filter(col("_dd") === 1)
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= limit)
      .select(col("qid"), col("rank"), col("id"), col("final_score"),
        col("match_type"), col("s_vector"), col("s_keyword"), col("s_tag"))
  }
}
