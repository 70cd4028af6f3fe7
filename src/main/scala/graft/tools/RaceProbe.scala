package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: is LocomoMini.rankings deterministic under concurrency? Runs
  * the parallel rankings three times plus a sequential reference and diffs.
  */
object RaceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mem = LocomoMini.memories(spark).cache()
    mem.count()
    val es = LocomoMini.edges(spark)
    val sequential = LocomoMini.questions.zipWithIndex.map { case (q, i) =>
      i -> LocomoMini.answer(mem, es, q)
    }.toMap
    for (round <- 1 to 3) {
      val par = LocomoMini.rankings(spark)
      val diffs = sequential.keys.toSeq.sorted.filter(i => par(i) != sequential(i))
      println(s"[race] round $round: ${diffs.size} divergent questions: " +
        diffs.take(5).map { i =>
          val q = LocomoMini.questions(i)
          s"\n  #$i ${q.category} '${q.question}'\n   seq=${sequential(i).take(6)}\n   par=${par(i).take(6)}"
        }.mkString)
    }
    spark.stop()
  }
}
