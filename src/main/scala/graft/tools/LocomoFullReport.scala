package graft.tools

import org.apache.spark.sql.SparkSession

/** Golden-pinning helper for [[LocomoFull]] (the [[LocomoReport]] /
  * LmeReportProbe pattern): prints every number LocomoFullSpec pins.
  * `sbt "runMain graft.tools.LocomoFullReport subset"` runs conversations
  * 201-202 (the always-on spec tier); `... full` runs all 10
  * conversations / 1,986 questions (the env-gated tier; ~15-25 min —
  * per-question driver planning dominates, same as the mini).
  */
object LocomoFullReport {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("subset")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val convs = mode match {
      case "full" => (201 to 210).toSeq
      case "one" => Seq(201)
      case _ => Seq(201, 202)
    }
    val qs = LocomoFull.questions.filter(q => convs.contains(q.conv))
    println(s"mode=$mode convs=$convs questions=${qs.size}")
    println(s"category counts: ${qs.groupBy(_.category).view.mapValues(_.size).toMap}")

    val t0 = System.nanoTime()
    import spark.implicits._
    val mem = LocomoFull.memories(spark).cache()
    mem.count()
    val noEdges = Seq.empty[graft.domain.Edge].toDF()
    val ranked = LocomoMini.scoredRankingsOver(spark, mem, noEdges, qs)
    mem.unpersist()
    val rep = LocomoFull.reportOver(ranked, qs)
    val secs = (System.nanoTime() - t0) / 1e9
    // per-question diagnostics: evidence ranks for answerable misses,
    // top-1 scores at the abstention boundary
    qs.zipWithIndex.foreach { case (q, i) =>
      val ids = ranked(i).map(_._1)
      if (q.category != "adversarial" &&
          !q.evidence.forall(e => ids.take(10).contains(e))) {
        val ranks = q.evidence.map(e =>
          s"$e@${ids.indexOf(e) match { case -1 => "miss"; case r => r + 1 }}")
        println(f"[MISS ${q.category}%9s] '${q.question}' -> ${ranks.mkString(", ")}")
      }
    }
    val floor = rep.answerableFloor
    qs.zipWithIndex.filter(_._1.category == "single").foreach { case (q, i) =>
      val s = ranked(i).headOption.map(_._2).getOrElse(0.0)
      if (s < floor + 0.05)
        println(f"[FLOOR] top1=$s%.4f '${q.question}'")
    }
    qs.zipWithIndex.filter(_._1.category == "adversarial").foreach { case (q, i) =>
      val s = ranked(i).headOption.map(_._2).getOrElse(0.0)
      if (s >= floor)
        println(f"[ADV>=floor] top1=$s%.4f '${q.question}'")
    }
    println(f"\nreport wall clock: $secs%.1f s (${secs / qs.size * 1000}%.0f ms/question)")
    println(s"nQuestions=${rep.nQuestions}")
    LocomoFull.AnswerableCats.foreach { c =>
      println(f"$c%9s: recall@5=${rep.recall5(c)}%.6f recall@10=${rep.recall10(c)}%.6f mrr=${rep.mrr(c)}%.6f")
    }
    println(f"accuracyPct=${rep.accuracyPct}%.6f (answerableOk=${rep.answerableOk} adversarialOk=${rep.adversarialOk})")
    println(f"abstention: ceiling=${rep.abstentionCeiling}%.6f floor=${rep.answerableFloor}%.6f separated=${rep.separated}")
    spark.stop()
  }
}
