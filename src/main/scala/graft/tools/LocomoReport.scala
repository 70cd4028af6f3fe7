package graft.tools

import org.apache.spark.sql.SparkSession

/** Golden-pinning helper for [[LocomoMini]]: prints every number
  * LocomoMiniSpec pins (per-category recall@5/@10/MRR, evidence-presence
  * accuracy, the abstention boundary scores) so a deliberate fixture or
  * ranking change can re-pin in one run instead of iterating on spec
  * failures. `sbt "runMain graft.tools.LocomoReport"`.
  */
object LocomoReport {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ranked = LocomoMini.rankings(spark)
    def catMean(cat: String, f: (Seq[String], Seq[String]) => Double): Double = {
      val qs = LocomoMini.questions.zipWithIndex.filter(_._1.category == cat)
      qs.map { case (q, i) => f(ranked(i), q.evidence) }.sum / qs.size
    }
    LocomoMini.questions.zipWithIndex.foreach { case (q, i) =>
      val ranks = q.evidence.map(e =>
        s"$e@${ranked(i).indexOf(e) match { case -1 => "miss"; case r => r + 1 }}")
      println(f"[${q.category}%8s] '${q.question}' -> ${ranks.mkString(", ")}")
    }
    val nq = LocomoMini.questions.size
    val counts = LocomoMini.questions.groupBy(_.category).view.mapValues(_.size).toMap
    println(s"\nquestions: $nq  $counts")
    Seq("single", "temporal", "multihop", "update", "open").foreach { cat =>
      val acc = catMean(cat,
        (got, want) => if (want.forall(got.contains)) 1.0 else 0.0)
      println(s"$cat: accuracy=$acc")
      println(s"$cat: recall@5=${catMean(cat, RetrievalMetrics.recallAtK(_, _, 5))}")
      println(s"$cat: recall@10=${catMean(cat, RetrievalMetrics.recallAtK(_, _, 10))}")
      println(s"$cat: mrr=${catMean(cat, RetrievalMetrics.mrr)}")
    }
    // update-category invariant inputs
    LocomoMini.questions.zipWithIndex.filter(_._1.category == "update")
      .foreach { case (q, i) =>
        val newId = q.evidence.head
        val oldId = LocomoMini.Supersessions.find(_._2 == newId).get._1
        println(s"update '${q.question}': new=$newId in=${ranked(i).contains(newId)} " +
          s"old=$oldId leaked=${ranked(i).contains(oldId)}")
      }
    // abstention boundary (same construction as the spec)
    val mem = LocomoMini.memories(spark).cache()
    val edges = Seq.empty[graft.domain.Edge].toDF()
    def top1(conv: Int, question: String): Double =
      graft.domain.Recall.recall(mem, edges, graft.domain.RecallRequest(
        query = Some(question), limit = 5,
        tags = Seq(s"conversation:conv-$conv"),
        relevanceGate = Some(0.6),
        queryEmbedder = Some(graft.domain.LexicalEmbedding.embed(_)),
        now = LocomoMini.Now))
        .select("final_score").collect().headOption
        .map(_.getDouble(0)).getOrElse(0.0)
    val unanswerable = LocomoMini.questions.filter(_.category == "adversarial")
      .map { q =>
        val s = top1(q.conv, q.question)
        println(f"top1-adversarial $s%.4f '${q.question}'")
        s
      }
    val answerable = LocomoMini.questions.filter(_.category == "single")
      .map { q =>
        val s = top1(q.conv, q.question)
        println(f"top1 $s%.4f '${q.question}'")
        s
      }
    println(s"abstention ceiling=${unanswerable.max} floor=${answerable.min}")
    mem.unpersist()
    // A/B experiment discipline (VERDICT r9 item 6): recency weight 0.1
    // (default) vs 0.0 over the 10k lab corpus, paired t-test + winner rule
    val cmp = LabExperiment.compare(spark,
      LabExperiment.Arm("recency-0.1", graft.domain.Scoring.Weights()),
      LabExperiment.Arm("recency-0.0",
        graft.domain.Scoring.Weights(recency = 0.0)))
    println("\n" + LabExperiment.report(cmp))
    spark.stop()
  }
}
