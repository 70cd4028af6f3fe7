package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch: time one SparkEntry query at a given SF. Args: queryName [sfDir]. */
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
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[timeone] $name run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
    }
    spark.stop()
  }
}
