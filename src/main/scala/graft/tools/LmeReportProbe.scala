package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot printer of [[LongMemEvalMini.report]] — used to derive the
  * spec goldens; kept so a golden drift can be re-derived in one command.
  * Run: `sbt "runMain graft.tools.LmeReportProbe"` — pass `full` to print
  * the 120-question [[LongMemEvalFull]] tier instead (r17), or `full500`
  * for the 500-question tier (r18).
  */
object LmeReportProbe {
  def main(args: Array[String]): Unit = {
    val full = args.headOption.contains("full")
    val full500 = args.headOption.contains("full500")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rep = if (full500) LongMemEvalFull.report500(spark)
      else if (full) LongMemEvalFull.report(spark)
      else LongMemEvalMini.report(spark)
    println(s"[lme] recall5 = ${rep.recall5.toSeq.sortBy(_._1)}")
    println(s"[lme] mrr     = ${rep.mrr.toSeq.sortBy(_._1)}")
    println(f"[lme] ceiling=${rep.abstentionCeiling} floor=${rep.answerableFloor} separated=${rep.separated}")
    println(f"[lme] answered@5=${rep.answeredAt5} abstainedOk=${rep.abstainedOk} accuracy=${rep.accuracyPct}%.2f%%")
    val qset = if (full500) LongMemEvalFull.questions500
      else if (full) LongMemEvalFull.questions
      else LongMemEvalMini.questions
    val ranked = if (full || full500) {
      val mem = (if (full500) LongMemEvalFull.memories500(spark)
        else LongMemEvalFull.memories(spark)).cache()
      mem.count()
      try LongMemEvalMini.scoredRankingsOver(spark, mem, qset)
      finally mem.unpersist()
    } else LongMemEvalMini.scoredRankings(spark)
    qset.zipWithIndex.foreach { case (q, i) =>
      val top = ranked(i).take(5)
      val hit = q.evidence.forall(top.map(_._1).contains)
      val t1 = top.headOption.map(x => f"${x._2}%.3f").getOrElse("-")
      println(s"[lme] ${q.qid} (${q.qtype}) hit@5=$hit top1score=$t1 evidence=${q.evidence.mkString(",")} top5=${top.map(_._1).mkString(",")}")
    }
    spark.stop()
  }
}
