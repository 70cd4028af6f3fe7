package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for the prepared-recall serving path: measures per-query
  * latency of [[graft.domain.PreparedRecall]] on the 10k lab corpus against
  * the ad-hoc `Recall.recall` baseline, each serving DIFFERENT queries so
  * nothing can be satisfied from a result cache.
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // a 10k-row corpus does not want 32 partitions: every scan stage pays
    // 32 task launches for ~300 rows each. 4 partitions ~ one task per
    // core group at this size.
    val memories = LabCorpus.corpus(spark)
      .repartition(sys.env.getOrElse("SERVE_PARTS", "4").toInt).cache()
    memories.count()
    val qs = LabCorpus.questions.map(_.query).take(12)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SERVE_SHUFFLE", "4"))

    // ad-hoc baseline: fresh plan per query
    def adhoc(q: String): Double = {
      val t0 = System.nanoTime()
      graft.domain.Recall.recall(memories, spark.emptyDataFrame,
        graft.domain.RecallRequest(query = Some(q), limit = 10,
          now = LabCorpus.Now)).count()
      (System.nanoTime() - t0) / 1e9
    }
    adhoc(qs.head) // warmup
    qs.slice(1, 5).foreach(q => println(f"[adhoc ] ${adhoc(q) * 1000}%7.1f ms  $q"))

    val tPrep = System.nanoTime()
    val prepared = new graft.domain.PreparedRecall(memories,
      spark.emptyDataFrame, limit = 10, now = LabCorpus.Now,
      vocabParallelism = sys.env.getOrElse("SERVE_VOCAB_PARTS", "4").toInt)
    println(f"[prepare] ${(System.nanoTime() - tPrep) / 1e6}%7.1f ms (template build)")
    def served(q: String): Double = {
      val t0 = System.nanoTime()
      prepared.recall(q).count()
      (System.nanoTime() - t0) / 1e9
    }
    served(qs.head) // warmup (codegen compile for the template shape)
    qs.slice(1, 12).foreach { q =>
      println(f"[served] ${served(q) * 1000}%7.1f ms  $q")
    }
    // r11 fast path: cached physical plan, request rows swapped per call
    println(s"[fast-enabled] ${prepared.fastPathEnabled} (${prepared.fastPathDiagnosis})")
    def fast(q: String): Double = {
      val t0 = System.nanoTime()
      prepared.fastRecall(q).foreach(_.count())
      (System.nanoTime() - t0) / 1e9
    }
    if (prepared.fastPathEnabled) {
      fast(qs.head)
      qs.slice(1, 12).foreach { q =>
        println(f"[fast  ] ${fast(q) * 1000}%7.1f ms  $q")
      }
      qs.take(3).foreach { q =>
        println(s"[fast-decomp] ${prepared.fastDecomp(q)}  $q")
      }
      // controlled comparison: alternate fast-collect / replan-count /
      // replan-collect on the same queries, report medians — exposes the
      // count()-prunes-output-columns flattery in the replanned metric
      def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      // INTERLEAVED per query (fast, replan-count, replan-collect back to
      // back) so box-speed drift during the run cannot bias one arm
      val trials = qs.take(10)
      val (fc, rc, rr) = (Seq.newBuilder[Double], Seq.newBuilder[Double],
        Seq.newBuilder[Double])
      trials.foreach { q =>
        fc += t(prepared.fastRecall(q).foreach(_.collect()))
        rc += t(prepared.recallReplanned(q).count())
        rr += t(prepared.recallReplanned(q).collect())
      }
      println(f"[compare] fast-collect med=${med(fc.result())}%6.1f  " +
        f"replan-count med=${med(rc.result())}%6.1f  " +
        f"replan-collect med=${med(rr.result())}%6.1f ms (interleaved)")
    }
    // decompose a served call: swap/analyze vs optimize vs physical vs run
    for (q <- qs.take(4)) {
      val t0 = System.nanoTime()
      val df = prepared.recall(q)
      val t1 = System.nanoTime()
      df.queryExecution.optimizedPlan
      val t2 = System.nanoTime()
      df.queryExecution.executedPlan
      val t3 = System.nanoTime()
      df.count()
      val t4 = System.nanoTime()
      println(f"[decomp] build=${(t1 - t0) / 1e6}%6.1f opt=${(t2 - t1) / 1e6}%6.1f " +
        f"phys=${(t3 - t2) / 1e6}%6.1f exec=${(t4 - t3) / 1e6}%6.1f ms  $q")
      val topRules = df.queryExecution.tracker.rules.toSeq
        .sortBy(-_._2.totalTimeNs).take(8)
      topRules.foreach { case (r, m) =>
        println(f"    rule ${r.split('.').last}%-50s ${m.totalTimeNs / 1e6}%6.1f ms " +
          f"invocations=${m.numInvocations}")
      }
    }
    // where does one served call spend its time?
    val stageMs = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val ms = (for { st <- info.submissionTime; ct <- info.completionTime }
          yield ct - st).getOrElse(-1L)
        stageMs.add((info.name.split("\n").head.take(70), ms, info.numTasks))
      }
    })
    val df = prepared.recall(qs.last)
    val t0 = System.nanoTime()
    df.count()
    Thread.sleep(300)
    println(f"[served-traced] ${(System.nanoTime() - t0) / 1e6}%7.1f ms " +
      df.queryExecution.tracker.phases.map { case (k, v) =>
        s"$k=${v.durationMs}ms" }.mkString(" "))
    stageMs.forEach { case (name, ms, tasks) =>
      println(f"    stage $name%-70s ${ms}%5d ms $tasks%3d tasks")
    }
    spark.stop()
  }
}
