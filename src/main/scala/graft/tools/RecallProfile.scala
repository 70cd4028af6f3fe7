package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the single-recall latency anchor: runs one
  * `Recall.recall` over the 10k lab corpus and reports how many Spark jobs
  * and stages the plan fires and where wall clock goes — the 830 ms warm
  * figure in BENCH is a job-count question, not a data-volume question, at
  * this corpus size.
  */
object RecallProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val stageMs = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val info = s.stageInfo
        val ms = (for {
          st <- info.submissionTime; ct <- info.completionTime
        } yield ct - st).getOrElse(-1L)
        stageMs.add((info.name.split("\n").head.take(60), ms, info.numTasks))
      }
    })
    val memories = LabCorpus.corpus(spark)
      .repartition(spark.sparkContext.defaultParallelism).cache()
    memories.count()
    val q = LabCorpus.questions.head.query
    def once(tag: String): Unit = {
      jobs.set(0); stages.set(0); stageMs.clear()
      val t0 = System.nanoTime()
      graft.domain.Recall.recall(memories, spark.emptyDataFrame,
        graft.domain.RecallRequest(query = Some(q), limit = 10,
          now = LabCorpus.Now)).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[$tag] wall=${secs * 1000}%7.1f ms jobs=${jobs.get()} stages=${stages.get()}")
      stageMs.forEach { case (name, ms, tasks) =>
        println(f"    stage $name%-60s ${ms}%5d ms $tasks%3d tasks")
      }
    }
    once("cold")
    once("warm1"); once("warm2")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    once("noaqe-cold"); once("noaqe-1"); once("noaqe-2")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    once("aqe-p4-cold"); once("aqe-p4-1"); once("aqe-p4-2")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    once("noaqe-p4-cold"); once("noaqe-p4-1"); once("noaqe-p4-2")
    // how much of the wall is pure planning (analyze+optimize+physical)?
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.domain.Recall.recall(memories, spark.emptyDataFrame,
        graft.domain.RecallRequest(query = Some(q), limit = 10,
          now = LabCorpus.Now))
      df.queryExecution.executedPlan // force analysis->physical planning
      println(f"[plan-only $i] ${(System.nanoTime() - t0) / 1e6}%7.1f ms " +
        df.queryExecution.tracker.phases.map { case (k, v) =>
          s"$k=${v.durationMs}ms"
        }.mkString(" "))
    }
    spark.stop()
  }
}
