package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch: time batchRecall100's pipeline with each keyword form (and the
  * index pre-materialized vs ad-hoc) to attribute the oracle query's cost.
  * Args: [sfDir]
  */
object BatchFormProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import graft.domain.BatchRecall
    import graft.operators.RecallPipeline
    def run(form: String, label: String): Unit = {
      for (i <- 1 to 3) {
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val (mems, queries) = RecallPipeline.batchRecall100Inputs(spark, sfDir)
        val n = BatchRecall.batchRecall(mems, spark.emptyDataFrame, queries,
          limit = 5, now = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
          roundScores = true, keywordForm = form)
          .orderBy("qid", "rank").count()
        println(f"[form] $label run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      }
    }
    run("index", "index")
    run("scan", "scan ")
    run("index", "index2")
    spark.stop()
  }
}
