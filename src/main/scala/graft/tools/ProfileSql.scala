package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch: run one SparkEntry query (cold + warm) and dump the warm run's
  * per-operator SQL metrics (the headless equivalent of the SQL tab) so
  * optimization targets the actual expensive operators. Args: queryName
  * [sfDir].
  */
object ProfileSql {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/documents.parquet").count()
    catch { case _: Throwable => () }
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = once()
    spark.catalog.clearCache(); System.gc()
    val store = spark.sharedState.statusStore
    val before = store.executionsList().map(_.executionId).toSet
    val warm = once()
    println(f"[profilesql] $name cold $cold%6.2f s warm $warm%6.2f s")
    // give the status listener a moment to drain its event queue
    Thread.sleep(2000)
    val execs = store.executionsList().filterNot(e => before.contains(e.executionId))
    execs.foreach { e =>
      val metrics = store.executionMetrics(e.executionId)
      val graph = store.planGraph(e.executionId)
      println(s"[exec ${e.executionId}] ${e.description.take(60)}")
      def timeOf(s: String): Long = {
        // metric strings look like "total (min, med, max...)\n1.2 s (...)" or "123 ms"
        val head = s.linesIterator.toSeq.lastOption.getOrElse(s)
        val tok = head.trim.takeWhile(c => c != '(').trim
        val p = tok.split("\\s+")
        try {
          if (p.length >= 2) p(1) match {
            case "ms" => p(0).replace(",", "").toDouble.toLong
            case "s"  => (p(0).replace(",", "").toDouble * 1000).toLong
            case "m"  => (p(0).replace(",", "").toDouble * 60000).toLong
            case _ => 0L
          } else 0L
        } catch { case _: Throwable => 0L }
      }
      val rows = graph.allNodes.toSeq.flatMap { n =>
        val ms = n.metrics.flatMap { mm =>
          metrics.get(mm.accumulatorId).map(v => (mm.name, v))
        }.collect {
          case (mn, v) if mn.contains("time") || mn.contains("duration") =>
            (mn, timeOf(v))
        }
        val total = ms.map(_._2).sum
        if (total > 0) Some((total, s"${n.id} ${n.name}", ms)) else None
      }
      rows.sortBy(-_._1).take(14).foreach { case (total, nm, ms) =>
        println(f"[node] $total%7d ms  $nm  ${ms.map{case(k,v)=>s"$k=$v"}.mkString("; ").take(100)}")
      }
    }
    spark.stop()
  }
}
