package graft.domain

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.StructType

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
  private def isQtokRelation(lr: LocalRelation): Boolean =
    lr.output.map(_.name) == BatchRecall.QtokCols
  private def isQtokDistinctRelation(lr: LocalRelation): Boolean =
    lr.output.map(_.name) == BatchRecall.QtokDistinctCols

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
    // each request-side relation appears once per join branch (analysis
    // deduplicates each occurrence with fresh expr ids); the swap below
    // rewrites every occurrence, so only existence is asserted here
    require(plan.collectFirst {
      case lr: LocalRelation if isRequestRelation(lr) => lr }.nonEmpty,
      "no request relation found in the template plan")
    require(plan.collectFirst {
      case lr: LocalRelation if isQtokRelation(lr) => lr }.nonEmpty,
      "no (qid, tok) relation found in the template plan")
    require(plan.collectFirst {
      case lr: LocalRelation if isQtokDistinctRelation(lr) => lr }.nonEmpty,
      "no (tok) relation found in the template plan")
    plan
  }

  /** The EXECUTED physical template (VERDICT r7 item 4): the same plan,
    * optimized + planned + codegen-collapsed ONCE at construction, with the
    * request relations surviving as swappable [[LocalTableScanExec]] leaves.
    * Per-call work drops from "optimizer + physical planning + every
    * broadcast re-executed" to "swap three leaf row-sets and execute": the
    * corpus-side subtrees are the SAME node instances across calls, so
    * their broadcast futures and codegen classes are computed once.
    *
    * Template-build soundness: three optimizer rules are excluded while the
    * template is optimized, because they would bake the MARKER request's
    * data shape into a plan that must stay valid for every future splice —
    * ConvertToLocalRelation (folds projections into the relation rows,
    * freezing the marker query), OptimizeOneRowPlan and EliminateLimits
    * (both exploit `maxRows` of the 1-row/1-token marker relations; a real
    * request has 1 row but any number of tokens). Exchange reuse and AQE
    * are disabled for the template: ReusedExchangeExec holds an instance
    * pointer that a leaf swap cannot see (it would serve the previous
    * request's broadcast), and AdaptiveSparkPlanExec re-plans internally so
    * its leaves are not swappable. All four settings apply only while the
    * template is built; the session is restored afterwards.
    */
  private val (executedTemplate, serveSchemaV) = {
    val conf = spark.conf
    val prevRules = conf.getOption("spark.sql.optimizer.excludedRules")
    val prevAqe = conf.getOption("spark.sql.adaptive.enabled")
    val prevReuse = conf.getOption("spark.sql.exchange.reuse")
    conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation," +
        "org.apache.spark.sql.catalyst.optimizer.OptimizeOneRowPlan," +
        "org.apache.spark.sql.catalyst.optimizer.EliminateLimits")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.exchange.reuse", "false")
    try {
      val df = GraftShim.ofRows(spark, template).drop("qid")
      (GraftShim.executedPlan(df), df.schema)
    } finally {
      def restore(key: String, prev: Option[String]): Unit =
        prev.fold(conf.unset(key))(conf.set(key, _))
      restore("spark.sql.optimizer.excludedRules", prevRules)
      restore("spark.sql.adaptive.enabled", prevAqe)
      restore("spark.sql.exchange.reuse", prevReuse)
    }
  }

  /** Schema of [[serveRows]] results (rank, id, final_score, match_type,
    * component scores — the template's post-`drop("qid")` columns).
    */
  def serveSchema: StructType = serveSchemaV

  private def relationData(query: String, qvec: Option[Array[Float]]) = {
    val fresh = BatchRecall.requestRelationFromSeq(spark,
      org.apache.spark.sql.types.IntegerType,
      Seq((0, query, qvec.map(_.toSeq))))
    val (freshTok, freshTokDistinct) = BatchRecall.requestTokenRelationsFromSeq(
      spark, org.apache.spark.sql.types.IntegerType,
      Seq((0, Recall.keywords(query))))
    def dataOf(df: DataFrame) = GraftShim.analyzed(df)
      .collect { case lr: LocalRelation => lr.data }.head
    (dataOf(fresh), dataOf(freshTok), dataOf(freshTokDistinct))
  }

  /** Serve one request: ranked rows (rank, id, final_score, match_type,
    * component scores) — the same output as a 1-row [[BatchRecall]] run,
    * which the parity spec pins to `Recall.recall`'s results.
    *
    * This path re-runs optimizer + physical planning per call (results are
    * provably fresh); [[serveRows]] is the low-latency serving entry that
    * reuses the executed template instead.
    */
  def recall(query: String, qvec: Option[Array[Float]] = None): DataFrame = {
    val (qData, tokData, tokDistinctData) = relationData(query, qvec)
    val swapped = template.transform {
      // keep the template's output attributes (expr ids are wired through
      // the whole plan); only the rows change
      case lr: LocalRelation if isRequestRelation(lr) => lr.copy(data = qData)
      case lr: LocalRelation if isQtokRelation(lr) => lr.copy(data = tokData)
      case lr: LocalRelation if isQtokDistinctRelation(lr) =>
        lr.copy(data = tokDistinctData)
    }
    GraftShim.ofRows(spark, swapped).drop("qid")
  }

  /** Low-latency serving: swap the three request leaves of the EXECUTED
    * template and collect. Returns the ranked rows directly ([[serveSchema]]
    * describes the columns; rows arrive rank-ordered). Parity with
    * [[recall]] and the single path is spec-pinned; safe to call
    * concurrently (the transform copies the swapped leaves' ancestors,
    * shared subtrees only ever execute their one cached broadcast/codegen).
    */
  def serveRows(query: String, qvec: Option[Array[Float]] = None): Seq[Row] = {
    val (qData, tokData, tokDistinctData) = relationData(query, qvec)
    val swapped = executedTemplate.transform {
      case l: LocalTableScanExec
          if l.output.map(_.name) == BatchRecall.RequestCols =>
        l.copy(rows = qData)
      case l: LocalTableScanExec
          if l.output.map(_.name) == BatchRecall.QtokCols =>
        l.copy(rows = tokData)
      case l: LocalTableScanExec
          if l.output.map(_.name) == BatchRecall.QtokDistinctCols =>
        l.copy(rows = tokDistinctData)
    }
    GraftShim.collectPublic(swapped).toSeq
  }

  /** Release the cached index relations. */
  def close(): Unit = index.unpersist()
}
