package graft.tools

import org.apache.spark.sql.SparkSession

/** Measured evidence for the prepare-time serve-class pre-build (VERDICT
  * r12 item 6): before r13, the first query of each non-keyword serve
  * class paid a 1-2 s lazy template build under the class-map bin lock;
  * with every reachable class pre-built at prepare time, the FIRST call of
  * each class should sit at its steady state. Prints, per class: the first
  * served-call latency, the median of 5 steady-state calls, and the class
  * diagnosis — plus the total prepare cost, pinned honestly (it now
  * absorbs all class builds).
  *
  * Run: `sbt "runMain graft.tools.ClassWarmProbe"`
  */
object ClassWarmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val memories = LabCorpus.corpus(spark).repartition(4).cache()
    memories.count()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    val tPrep = System.nanoTime()
    val prepared = new graft.domain.PreparedRecall(memories,
      spark.emptyDataFrame, limit = 10, now = LabCorpus.Now,
      vocabParallelism = 4)
    println(f"[classwarm] prepare_ms=${(System.nanoTime() - tPrep) / 1e6}%.0f" +
      " (now includes ALL class builds)")

    // one real query per serve class, DIFFERENT from the prepare markers
    // so nothing is satisfied by marker-time state
    val classQueries = Seq(
      "kw+md" -> LabCorpus.questions.head.query, // keyword + metadata terms
      "kw-only" -> "memory memories", // keyword, metadata-stopword only
      "phrase" -> "for the", // phrase-only, no metadata terms
      "phrase+md" -> "ml the", // phrase-only with a 2-char metadata term
      "trend" -> " ", // empty -> trending
      "trend+md" -> "ml") // 2-char token: trending with metadata
    for ((label, q) <- classQueries) {
      def once(): Double = {
        val t0 = System.nanoTime()
        prepared.recall(q).collect()
        (System.nanoTime() - t0) / 1e6
      }
      val first = once()
      (1 to 5).foreach(_ => once()) // settle codegen for the class shape
      val steady = (1 to 5).map(_ => once()).sorted.apply(2)
      println(f"[classwarm] $label%-10s first=$first%7.1f ms " +
        f"steady=$steady%7.1f ms ratio=${first / steady}%5.2f " +
        f"gate=${prepared.fastPathDiagnosis(q)}")
    }
    prepared.close()
    spark.stop()
  }
}
