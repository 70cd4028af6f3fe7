package graft.tools

/** Retrieval-quality metrics, a faithful port of the reference's Recall
  * Quality Lab scoring functions (`/root/reference/scripts/lab/
  * lab_metrics.py:11-56`), plus its experiment-discipline tail — the paired
  * t-test and the scorecard winner rule (`lab_metrics.py:59-176`) — pure,
  * deterministic, no I/O.
  */
object RetrievalMetrics {

  /** Paired t-test output (`lab_metrics.py:59-104`): t statistic, normal-
    * approximation two-sided p, Cohen's d with the reference's label bands,
    * significance at p < 0.05, and the mean per-pair difference (b - a).
    */
  case class TTest(tStat: Double, pValue: Double, cohensD: Double,
      effectSize: String, significant: Boolean, meanDiff: Double)

  /** Paired t-test + Cohen's d between two per-question score vectors of
    * equal length (same questions, two configs). Mirrors the reference
    * exactly: sample variance of the diffs (n-1), normal-approximation
    * p-value (erf, not a t-distribution — the lab's own simplification),
    * pooled-std Cohen's d, and the same rounding (t/d to 4 decimals, p to
    * 6). Degenerate inputs (n < 2 or length mismatch) return the null
    * result rather than throwing, as the lab does.
    */
  def pairedTTest(a: Seq[Double], b: Seq[Double]): TTest = {
    val n = a.size
    if (n < 2 || n != b.size)
      return TTest(0.0, 1.0, 0.0, "negligible", significant = false, 0.0)
    val diffs = a.indices.map(i => b(i) - a(i))
    val meanD = diffs.sum / n
    val varD = diffs.map(d => (d - meanD) * (d - meanD)).sum / (n - 1)
    val stdD = if (varD > 0) math.sqrt(varD) else 1e-10
    val tStat = meanD / (stdD / math.sqrt(n.toDouble))
    val z = math.abs(tStat)
    val pValue = 2 * (1 - 0.5 * (1 + erf(z / math.sqrt(2.0))))
    val (meanA, meanB) = (a.sum / n, b.sum / n)
    val pooledStd = math.sqrt(
      (a.map(x => (x - meanA) * (x - meanA)).sum +
        b.map(x => (x - meanB) * (x - meanB)).sum) / (2 * n - 2))
    val cohensD = if (pooledStd > 0) (meanB - meanA) / pooledStd else 0.0
    val label =
      if (math.abs(cohensD) >= 0.8) "large"
      else if (math.abs(cohensD) >= 0.5) "medium"
      else if (math.abs(cohensD) >= 0.2) "small"
      else "negligible"
    TTest(round4(tStat), round6(pValue), round4(cohensD), label,
      significant = pValue < 0.05, round4(meanD))
  }

  /** One experiment-config scorecard row (`lab_metrics.py:149-176` input
    * shape): quality (NDCG@10), the precision guardrail (distractor rate),
    * the simplicity tiebreaker (active-knob count), and latency.
    */
  case class Scorecard(name: String, ndcg10: Double, distractorRate10: Double,
      complexity: Int, latencyMs: Double)

  /** The lab's winner decision (`lab_metrics.py:149-176`): highest NDCG@10
    * that does not regress distractor precision vs the named baseline
    * (ceiling = baseline rate + `distractorTol`); ties within `ndcgTol`
    * break toward fewer active knobs, then lower latency. Returns the
    * winning card and the reference's reason string.
    */
  def pickWinner(cards: Seq[Scorecard], baselineName: String,
      ndcgTol: Double = 0.005, distractorTol: Double = 0.01)
      : (Scorecard, String) = {
    val baseline = cards.find(_.name == baselineName).getOrElse(
      throw new IllegalArgumentException(
        s"baseline_name '$baselineName' not found among cards"))
    // the baseline is always eligible against itself, so `eligible` is
    // never empty and the max below is safe
    val ceiling = baseline.distractorRate10 + distractorTol
    val eligible = cards.filter(_.distractorRate10 <= ceiling)
    val bestNdcg = eligible.map(_.ndcg10).max
    val contenders = eligible.filter(_.ndcg10 >= bestNdcg - ndcgTol)
    val winner = contenders.minBy(c => (c.complexity, c.latencyMs))
    val reason =
      if (winner.name == baselineName)
        "no candidate beat baseline NDCG@10 without precision regression"
      else
        f"best NDCG@10 within tolerance, lowest complexity (${winner.complexity}) " +
          f"and latency (${winner.latencyMs}%.0f ms)"
    (winner, reason)
  }

  /** Active-knob count of a scoring config — the simplicity tiebreaker
    * (`lab_metrics.py:107-146` adapted to this engine's knobs: the nine
    * score weights are the SEARCH_WEIGHT_* analogs; a zero weight is an
    * inactive knob).
    */
  def configComplexity(w: graft.domain.Scoring.Weights): Int =
    Seq(w.vector, w.keyword, w.metadata, w.relation, w.tag, w.importance,
      w.confidence, w.recency, w.exact, w.relevance).count(_ != 0.0)

  private def round4(x: Double): Double = math.rint(x * 1e4) / 1e4
  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  /** erf via the Cody/NR rational erfc approximation (|error| < 1.2e-7 —
    * the JDK has no erf; the p-value is a normal approximation anyway and
    * the spec pins t/d, which are exact arithmetic).
    */
  private def erf(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 +
      t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
        t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
          t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0) 1.0 - ans else ans - 1.0
  }

  /** Fraction of expected IDs found in the top-k results (`lab_metrics.py:11-17`). */
  def recallAtK(retrieved: Seq[String], expected: Seq[String], k: Int): Double =
    if (expected.isEmpty) 0.0
    else {
      val topK = retrieved.take(k).toSet
      expected.count(topK.contains).toDouble / expected.size
    }

  /** Reciprocal rank of the first relevant result (`lab_metrics.py:20-26`). */
  def mrr(retrieved: Seq[String], expected: Seq[String]): Double = {
    val expectedSet = expected.toSet
    retrieved.zipWithIndex.collectFirst {
      case (rid, i) if expectedSet.contains(rid) => 1.0 / (i + 1)
    }.getOrElse(0.0)
  }

  /** Normalized DCG at k with binary relevance (`lab_metrics.py:29-37`). */
  def ndcgAtK(retrieved: Seq[String], expected: Seq[String], k: Int): Double = {
    val expectedSet = expected.toSet
    val dcg = retrieved.take(k).zipWithIndex.collect {
      case (rid, i) if expectedSet.contains(rid) => 1.0 / log2(i + 2)
    }.sum
    val idealDcg = (0 until math.min(expected.size, k)).map(i => 1.0 / log2(i + 2)).sum
    if (idealDcg > 0) dcg / idealDcg else 0.0
  }

  /** Fraction of the top-k that are labelled distractors — the precision
    * guardrail; lower is better (`lab_metrics.py:40-56`).
    */
  def distractorRateAtK(retrieved: Seq[String], distractors: Set[String],
      k: Int): Double = {
    if (k <= 0) return 0.0
    val topK = retrieved.take(k)
    if (topK.isEmpty) 0.0
    else topK.count(distractors.contains).toDouble / topK.size
  }

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
}
