package graft.tools
import org.apache.spark.sql.SparkSession
/** Scratch: time a comma-separated set of SparkEntry queries at a given SF
  * with the Bench methodology (cache sweep + GC between queries, cold then
  * warm run each, warm reported) after a JIT warmup pass over the same set.
  * Args: q1,q2,... [sfDir]
  */
object TimeSet {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
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
    // JIT warmup pass: run the whole set once, untimed
    names.foreach { n =>
      spark.catalog.clearCache(); System.gc()
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[timeset] $n warmup FAILED: $e") }
    }
    // measured pass: Bench shape (sweep, cold, warm)
    names.foreach { n =>
      spark.catalog.clearCache(); System.gc()
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      println(f"[timeset] $n%-26s cold $cold%6.2f s  warm $warm%6.2f s")
    }
    spark.stop()
  }
}
