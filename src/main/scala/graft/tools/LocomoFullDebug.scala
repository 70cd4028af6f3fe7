package graft.tools

import graft.domain.{Recall, RecallRequest}
import org.apache.spark.sql.SparkSession

/** Scratch diagnostics for [[LocomoFull]] multihop ranking: prints the
  * top-20 (id, score, content) for one question under (a) the full
  * multihop parameterization ([[LocomoMini.answerScored]]) and (b) a
  * plain keyword+vector recall, so "the corpus buries the evidence" and
  * "the multihop machinery buries the evidence" are distinguishable.
  */
object LocomoFullDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val mem = LocomoFull.memories(spark).cache()
    mem.count()
    val contentOf = LocomoFull.turns.map(t =>
      t.dialogId -> s"${t.speaker}: ${t.text}").toMap
    val noEdges = Seq.empty[graft.domain.Edge].toDF()

    val q = LocomoFull.questions.filter(x => x.category == "multihop" &&
      x.conv == 201)
    q.take(args.headOption.map(_.toInt).getOrElse(2)).foreach { question =>
      println(s"\n==== ${question.question}  ev=${question.evidence}")
      val viaHarness = LocomoMini.answerScored(mem, noEdges, question)
      println("-- multihop parameterization (top 20):")
      viaHarness.take(20).zipWithIndex.foreach { case ((id, s), r) =>
        val mark = if (question.evidence.contains(id)) " <== EVIDENCE" else ""
        println(f"  ${r + 1}%2d $s%.4f $id%-12s ${contentOf.getOrElse(id, "?").take(80)}$mark")
      }
      println("-- plain recall (top 20):")
      val plain = Recall.recall(mem, noEdges, RecallRequest(
        query = Some(question.question), limit = 20,
        tags = Seq(s"conversation:conv-${question.conv}"), tagMatch = "exact",
        queryEmbedder = Some(graft.domain.LexicalEmbedding.embed(_)),
        now = LocomoFull.Now))
        .select("id", "final_score").collect()
      plain.zipWithIndex.foreach { case (r0, r) =>
        val id = r0.getString(0)
        val mark = if (question.evidence.contains(id)) " <== EVIDENCE" else ""
        println(f"  ${r + 1}%2d ${r0.getDouble(1)}%.4f $id%-12s ${contentOf.getOrElse(id, "?").take(80)}$mark")
      }
    }
    spark.stop()
  }
}
