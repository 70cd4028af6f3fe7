package graft.domain

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.graftshim.GraftShim

/** Plan-reuse serving handle for ad-hoc single recall.
  *
  * A one-off `Recall.recall` call pays a per-query driver constant (~0.45 s
  * measured at any corpus size: eager analysis of every chained
  * transformation while the DataFrame is BUILT, then optimize + physical
  * planning + codegen) that dwarfs execution on a small corpus — the
  * reference's online server answers in 189-204 ms on 10k memories
  * (`benchmarks/EXPERIMENT_LOG.md:126`) because its query plan is a fixed
  * code path, not a re-derived one.
  *
  * This class is the Spark-shaped answer: the [[BatchRecall]] plan — whose
  * results are spec-pinned identical to the single path — is built and
  * ANALYZED once against a marker request relation; each `recall(query)`
  * call then rebuilds only the 1-row request LocalRelation (driver-side
  * string work, no Spark job) and splices it into the cached template.
  * Re-used across calls: the entire analyzed plan (the dominant driver
  * cost), and every generated codegen class (the spliced plan produces
  * byte-identical source, so Spark's codegen cache hits). Re-run per call:
  * optimizer + physical planning (~0.1 s) and execution — fresh every
  * time, so results are always computed against the current request, and
  * broadcast caching cannot serve stale parameters.
  *
  * Thread-safety: template construction is eager; `recall` is stateless
  * over the immutable template and safe to call concurrently.
  */
class PreparedRecall(
    memories: DataFrame,
    edges: DataFrame,
    limit: Int = 10,
    weights: Scoring.Weights = Scoring.Weights(),
    now: Timestamp = Timestamp.valueOf("2026-01-01 00:00:00"),
    roundScores: Boolean = false,
    vocabParallelism: Int = 0) {

  private val spark = memories.sparkSession

  private def isRequestRelation(lr: LocalRelation): Boolean =
    lr.output.map(_.name) == BatchRecall.RequestCols

  /** Cached query-independent corpus index (postings + vocabularies),
    * materialized up front so no serving call pays the build.
    */
  val index: BatchRecall.RecallIndex =
    BatchRecall.buildIndex(memories, vocabParallelism)
      .cache().materialize()

  /** The batch plan over a marker request, analyzed once. */
  private val template: LogicalPlan = {
    import spark.implicits._
    val marker = Seq((0, "__template__")).toDF("qid", "query")
    val plan = GraftShim.analyzed(BatchRecall.batchRecall(
      memories, edges, marker, limit, weights, now, roundScores,
      index = Some(index), singleRequest = true))
    // the request relation appears once per join branch (analysis
    // deduplicates each occurrence with fresh expr ids); the swap below
    // rewrites every occurrence, so only existence is asserted here. The
    // (qid, tok) relations are gone from the single-request shape — its
    // keyword channel is the expression-form scan, which reads the token
    // array off the request relation itself.
    require(plan.collectFirst {
      case lr: LocalRelation if isRequestRelation(lr) => lr }.nonEmpty,
      "no request relation found in the template plan")
    plan
  }

  private def relationData(query: String, qvec: Option[Array[Float]]) = {
    val fresh = BatchRecall.requestRelationFromSeq(spark,
      org.apache.spark.sql.types.IntegerType,
      Seq((0, query, qvec.map(_.toSeq))))
    GraftShim.analyzed(fresh)
      .collect { case lr: LocalRelation => lr.data }.head
  }

  /** Serve one request: ranked rows (rank, id, final_score, match_type,
    * component scores) — the same output as a 1-row [[BatchRecall]] run,
    * which the parity spec pins to `Recall.recall`'s results.
    *
    * This path re-runs optimizer + physical planning per call (~60-70 ms of
    * a served call; results are provably fresh). An executed-PHYSICAL-plan
    * template that skipped those phases was built and measured in r8/r9 and
    * DELETED: to stay splice-safe it had to exclude the folding rules
    * (ConvertToLocalRelation / OptimizeOneRowPlan / EliminateLimits) and
    * disable exchange reuse while the template was planned, and the
    * resulting less-folded physical plan consistently cost MORE in
    * execution (~+50-90 ms at the 10k anchor) than per-call optimization
    * costs in planning.
    */
  def recall(query: String, qvec: Option[Array[Float]] = None): DataFrame = {
    val qData = relationData(query, qvec)
    val swapped = template.transform {
      // keep the template's output attributes (expr ids are wired through
      // the whole plan); only the rows change
      case lr: LocalRelation if isRequestRelation(lr) => lr.copy(data = qData)
    }
    GraftShim.ofRows(spark, swapped).drop("qid")
  }

  /** Release the cached index relations. */
  def close(): Unit = index.unpersist()
}
