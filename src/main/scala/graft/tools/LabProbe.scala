package graft.tools

import graft.domain.BatchRecall
import org.apache.spark.sql.SparkSession

/** Prints the QualityScaleSpec lab metrics at full precision — run after
  * any INTENTIONAL scoring change to re-pin the goldens:
  * `sbt "runMain graft.tools.LabProbe"`.
  */
object LabProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val memories = LabCorpus.corpus(spark).repartition(8).cache()
    val queries = LabCorpus.questions.map(q => (q.qid, q.query)).toDF("qid", "query")
    val ranked = BatchRecall.batchRecall(memories, spark.emptyDataFrame,
      queries, limit = 10, now = LabCorpus.Now)
      .select("qid", "rank", "id").collect()
    val perQ = ranked.groupBy(_.getInt(0)).view.mapValues(
      _.sortBy(_.getInt(1)).map(_.getString(2)).toSeq).toMap
    def bandMean(band: Int, f: (Seq[String], Seq[String]) => Double): Double = {
      val qs = LabCorpus.questions.filter(_.qid / LabCorpus.QuestionsPerBand == band)
      qs.map(q => f(perQ(q.qid), q.expectedIds)).sum / qs.size
    }
    def overall(f: (Seq[String], Seq[String]) => Double): Double =
      LabCorpus.questions.map(q => f(perQ(q.qid), q.expectedIds)).sum /
        LabCorpus.NumQuestions
    import RetrievalMetrics._
    for (b <- 0 to 2)
      println(s"[probe] band $b: recall5=${bandMean(b, recallAtK(_, _, 5))} " +
        s"ndcg10=${bandMean(b, ndcgAtK(_, _, 10))} mrr=${bandMean(b, mrr)}")
    val dist = LabCorpus.questions.map(q => distractorRateAtK(
      perQ(q.qid), LabCorpus.distractorIds(2000), 10)).sum / LabCorpus.NumQuestions
    println(s"[probe] overall: recall5=${overall(recallAtK(_, _, 5))} " +
      s"ndcg10=${overall(ndcgAtK(_, _, 10))} mrr=${overall(mrr)} dist10=$dist")
    spark.stop()
  }
}
