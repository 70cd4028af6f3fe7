package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer
/** Scratch: time one SparkEntry query at a given SF. Args: queryName [sfDir].
  * GRAFT_EXPLAIN=1 prints the formatted plan first; GRAFT_STAGES=1 prints
  * the slowest stages of the warm run (per-stage wall attribution).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    if (sys.env.contains("GRAFT_EXPLAIN"))
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    case class St(id: Int, name: String, ms: Long, tasks: Int)
    val stages = ArrayBuffer.empty[St]
    if (sys.env.contains("GRAFT_STAGES"))
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val info = sc.stageInfo
          val ms = (for { s <- info.submissionTime; c <- info.completionTime }
            yield c - s).getOrElse(-1L)
          // the first graft/operator frame in the callsite identifies the
          // stage far better than the name (broadcast builds all share one
          // opaque future name)
          val site = info.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("TimeOne"))
            .getOrElse(info.name).trim.take(90)
          stages.synchronized {
            stages += St(info.stageId, s"${info.name.take(40)} | $site", ms,
              info.numTasks)
          }
        }
      })
    val runs = sys.env.get("GRAFT_RUNS").map(_.toInt).getOrElse(2)
    for (i <- 1 to runs) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[timeone] $name run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      if (i == runs && sys.env.contains("GRAFT_STAGES")) {
        val snap = stages.synchronized(stages.toVector)
        println(f"[timeone] ${snap.size} stages, sum ${snap.map(_.ms).sum / 1e3}%6.2f s")
        snap.sortBy(-_.ms).take(20).foreach(s =>
          println(f"[stage] ${s.ms}%6d ms ${s.tasks}%4d tasks  ${s.name}"))
      }
    }
    spark.stop()
  }
}
