package graft.tools

import graft.domain.{BatchRecall, Scoring}
import org.apache.spark.sql.SparkSession

/** A/B experiment harness over the [[LabCorpus]]: run two scoring configs
  * through the SAME BatchRecall plan shape, score per-question NDCG@10,
  * and apply the reference lab's experiment discipline — the paired t-test
  * (`/root/reference/scripts/lab/lab_metrics.py:59-104`) and the scorecard
  * winner rule (`lab_metrics.py:149-176`) — instead of eyeballing two
  * means. This is §5's last harness piece: a config change ships only when
  * the comparison says it wins (or ties and is simpler).
  *
  * Deterministic end-to-end: the corpus, questions, and embeddings are
  * bit-stable, ranking ties break on id, and scores are rounded before
  * ranking — so the pinned t-statistic in QualityScaleSpec is exact, which
  * is STRICTER than the t-test itself (the test exists for the noisy
  * real-LLM lab; on deterministic fixtures it degenerates to arithmetic).
  */
object LabExperiment {

  case class Arm(name: String, weights: Scoring.Weights)

  case class ArmResult(name: String, perQuestionNdcg: Seq[Double],
      card: RetrievalMetrics.Scorecard)

  case class Comparison(a: ArmResult, b: ArmResult,
      ttest: RetrievalMetrics.TTest,
      winner: RetrievalMetrics.Scorecard, reason: String)

  /** Per-question top-10 rankings for one config over the lab corpus. */
  def rankings(spark: SparkSession, weights: Scoring.Weights,
      memories: org.apache.spark.sql.DataFrame): Map[Int, Seq[String]] = {
    import spark.implicits._
    val queries = LabCorpus.questions.map(q => (q.qid, q.query))
      .toDF("qid", "query")
    BatchRecall.batchRecall(memories, spark.emptyDataFrame, queries,
      limit = 10, weights = weights, now = LabCorpus.Now)
      .select("qid", "rank", "id").collect()
      .groupBy(_.getInt(0)).view.mapValues(
        _.sortBy(_.getLong(1)).map(_.getString(2)).toSeq).toMap
  }

  def runArm(spark: SparkSession, arm: Arm,
      memories: org.apache.spark.sql.DataFrame,
      distractors: Set[String]): ArmResult = {
    val t0 = System.nanoTime()
    val ranked = rankings(spark, arm.weights, memories)
    val latencyMs = (System.nanoTime() - t0) / 1e6
    val qs = LabCorpus.questions
    val ndcgs = qs.map(q =>
      RetrievalMetrics.ndcgAtK(ranked(q.qid), q.expectedIds, 10))
    val distRate = qs.map(q =>
      RetrievalMetrics.distractorRateAtK(ranked(q.qid), distractors, 10))
      .sum / qs.size
    ArmResult(arm.name, ndcgs, RetrievalMetrics.Scorecard(
      arm.name, ndcgs.sum / ndcgs.size, distRate,
      RetrievalMetrics.configComplexity(arm.weights), latencyMs))
  }

  /** Full A-vs-B comparison; `a` is the baseline for the winner rule. */
  def compare(spark: SparkSession, a: Arm, b: Arm): Comparison = {
    val memories = LabCorpus.corpus(spark).repartition(8).cache()
    memories.count()
    try {
      val distractors = LabCorpus.distractorIds(2000)
      val ra = runArm(spark, a, memories, distractors)
      val rb = runArm(spark, b, memories, distractors)
      val tt = RetrievalMetrics.pairedTTest(ra.perQuestionNdcg,
        rb.perQuestionNdcg)
      val (winner, reason) = RetrievalMetrics.pickWinner(
        Seq(ra.card, rb.card), baselineName = a.name)
      Comparison(ra, rb, tt, winner, reason)
    } finally memories.unpersist()
  }

  /** The printable comparison table ([[LocomoReport]] appends this). */
  def report(c: Comparison): String = {
    def row(r: ArmResult): String =
      f"${r.card.name}%-16s ndcg@10=${r.card.ndcg10}%.6f " +
        f"distractor@10=${r.card.distractorRate10}%.6f " +
        f"knobs=${r.card.complexity}%2d latency=${r.card.latencyMs}%.0f ms"
    Seq(
      "— A/B experiment (paired t-test + winner rule) —",
      row(c.a), row(c.b),
      f"t=${c.ttest.tStat}%.4f p=${c.ttest.pValue}%.6f " +
        f"d=${c.ttest.cohensD}%.4f (${c.ttest.effectSize}) " +
        f"significant=${c.ttest.significant} mean_diff=${c.ttest.meanDiff}%.4f",
      s"winner: ${c.winner.name} — ${c.reason}").mkString("\n")
  }
}
