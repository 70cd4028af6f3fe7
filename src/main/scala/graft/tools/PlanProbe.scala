package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch: census the fast template's nodes vs the freshly-folded
  * (replanned) plan's, and time pure execution of each serving form.
  */
object PlanProbe {
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
    val prepared = new graft.domain.PreparedRecall(memories,
      spark.emptyDataFrame, limit = 10, now = LabCorpus.Now,
      vocabParallelism = 4)
    println(s"[gate] ${prepared.fastPathDiagnosis}")
    def census(tag: String, planStr: String): Unit = {
      val counts = planStr.linesIterator
        .map(_.dropWhile(c => !c.isLetter).takeWhile(_.isLetterOrDigit))
        .toSeq.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2)
      println(s"=== $tag:")
      counts.filter(_._2 > 0).take(14).foreach { case (n, c) => println(f"  $c%4d $n") }
    }
    census("fast template", prepared.fastPlanString())
    val tpl = prepared.fastPlanString()
    println(s"[reused-wrappers] ${"ReusedExchange".r.findAllIn(tpl).size}")
    println("=== scans in template:")
    tpl.linesIterator.filter(_.contains("LocalTableScan")).foreach(l => println("  " + l.trim.take(150)))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/fastplan.txt"), tpl)
    // count jobs/stages of ONE fast call
    val jobCnt = new java.util.concurrent.atomic.AtomicInteger
    val stageCnt = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobCnt.incrementAndGet()
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stageCnt.incrementAndGet()
        val i = sc.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages.add(f"${ms}%5d ms ${i.numTasks}%3d tasks  ${i.name.split('\n').head.take(60)}")
      }
    })
    val warmq = LabCorpus.questions.map(_.query)
    (0 to 4).foreach(i => prepared.fastRecall(warmq(i)).foreach(_.count()))
    Thread.sleep(500); jobCnt.set(0); stageCnt.set(0); stages.clear()
    val tf0 = System.nanoTime()
    prepared.fastRecall(warmq(6)).foreach(_.count())
    val tfel = (System.nanoTime()-tf0)/1e6
    Thread.sleep(600)
    println(f"[one fast call] $tfel%7.1f ms  jobs=${jobCnt.get} stages=${stageCnt.get}")
    stages.forEach(x => println("  " + x))
    val q = LabCorpus.questions.map(_.query).apply(3)
    val rdf = prepared.recallReplanned(q)
    rdf.count()
    census("replanned executedPlan", rdf.queryExecution.executedPlan.toString)
    // pure exec of the replanned plan: plan once, execute repeatedly
    val phys = rdf.queryExecution.executedPlan
    (1 to 3).foreach(_ => phys.executeCollect())
    val re = (1 to 7).map { _ =>
      val t0 = System.nanoTime(); phys.executeCollect(); (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"[replanned pure-exec, SAME plan instance] med=${re(re.size / 2)}%6.1f ms (reuses lazy broadcast futures)")
    // replanned pure exec with a FRESH executedPlan per call (what a real
    // replanned call pays in exec: re-broadcasts its own exchanges)
    val rf = (1 to 7).map { _ =>
      val d = prepared.recallReplanned(q)
      d.queryExecution.executedPlan // plan outside the timer
      val t0 = System.nanoTime(); d.queryExecution.executedPlan.executeCollect()
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"[replanned pure-exec, FRESH plan per call ] med=${rf(rf.size / 2)}%6.1f ms")
    // fast-path decomposition (clone mode unless GRAFT_FAST_SHARE set)
    val mode = if (sys.env.contains("GRAFT_FAST_SHARE")) "SHARE" else "CLONE"
    (0 to 2).foreach(i => prepared.fastRecall(LabCorpus.questions(i).query))
    (3 to 7).foreach { i =>
      println(s"[fast-decomp $mode] ${prepared.fastDecomp(LabCorpus.questions(i).query)}")
    }

    // per-JOB anatomy of one fast call: job descriptions/callsites name
    // the region (broadcast exchange build vs shuffle vs final collect),
    // and per-stage task counts + times show where the wall-clock sits
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    val stageMs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(j.jobId, desc.take(90))
        jobStages.put(j.jobId, j.stageInfos.map(_.stageId))
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        val recs = i.taskMetrics.shuffleReadMetrics.recordsRead
        stageMs.put(i.stageId, (ms, i.numTasks, recs))
      }
    })
    val qq = LabCorpus.questions.map(_.query)
    (8 to 10).foreach(i => prepared.fastRecall(qq(i)).foreach(_.count()))
    Thread.sleep(400); jobs.clear(); jobStages.clear(); stageMs.clear()
    val ta0 = System.nanoTime()
    prepared.fastRecall(qq(11)).foreach(_.collect())
    val taEl = (System.nanoTime() - ta0) / 1e6
    Thread.sleep(600)
    println(f"[anatomy] one fast call $taEl%7.1f ms, ${jobs.size} jobs:")
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (jid, desc) =>
      val st = jobStages.getOrDefault(jid, Seq.empty)
      val detail = st.sorted.map { sid =>
        stageMs.asScala.get(sid).map { case (ms, nt, rr) =>
          f"s$sid:${ms}ms/${nt}t/${rr}r" }.getOrElse(s"s$sid:skipped")
      }.mkString(" ")
      println(f"  job $jid%3d  $detail  [$desc]")
    }
    spark.stop()
  }
}
