package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Scratch timing harness for batchRecall100 with per-stage attribution. */
object TimeBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/documents.parquet").count() catch { case _: Throwable => () }

    case class St(id: Int, name: String, ms: Long, tasks: Int)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val ms = (for {
          s <- info.submissionTime; c <- info.completionTime
        } yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += St(info.stageId, info.name.take(60), ms, info.numTasks)
        }
      }
    })

    for (i <- 1 to 3) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      graft.operators.RecallPipeline.batchRecall100(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[timeit] run$i $wall%6.2f s, stages:")
      val snap = stages.synchronized(stages.toVector)
      snap.sortBy(-_.ms).take(12).foreach(s =>
        println(f"[timeit]   ${s.ms}%6d ms  ${s.tasks}%4d tasks  ${s.name}"))
      println(f"[timeit]   total stage ms: ${snap.map(_.ms).sum}, n=${snap.size}")
    }
    spark.stop()
  }
}
