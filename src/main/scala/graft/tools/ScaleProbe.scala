package graft.tools

import graft.domain.BatchRecall
import org.apache.spark.sql.SparkSession

/** Scale evidence for the flagship batch-recall plan: run the same 60 lab
  * questions against corpora of increasing size and report wall clock +
  * amortized per-query latency. The plan's shuffle volume is
  * O(queries x overfetch) — corpus size should move the scan-bound stages
  * roughly linearly while the per-query windows stay constant.
  *
  * `sbt "runMain graft.tools.ScaleProbe [sizes...]"` (default 10k 50k 100k).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(10000, 50000, 100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val queries = LabCorpus.questions.map(q => (q.qid, q.query)).toDF("qid", "query")
    val nQ = LabCorpus.questions.size
    sizes.foreach { n =>
      // distractor share held at 20% as in the 10k lab corpus
      val memories = LabCorpus.corpus(spark, total = n, nDistractors = n / 5)
        .repartition(32).cache()
      memories.count() // materialize outside the timer (table scan stand-in)
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        val rows = BatchRecall.batchRecall(memories, spark.emptyDataFrame,
          queries, limit = 10, now = LabCorpus.Now).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scale] corpus=$n%7d run$run wall=$secs%6.2f s " +
          f"(${secs * 1000 / nQ}%5.1f ms/query amortized, $rows rows)")
      }
      memories.unpersist()
    }
    spark.stop()
  }
}
