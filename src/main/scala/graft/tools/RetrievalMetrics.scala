package graft.tools

/** Retrieval-quality metrics, a faithful port of the reference's Recall
  * Quality Lab scoring functions (`/root/reference/scripts/lab/
  * lab_metrics.py:11-56`) — pure, deterministic, no I/O.
  */
object RetrievalMetrics {

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
