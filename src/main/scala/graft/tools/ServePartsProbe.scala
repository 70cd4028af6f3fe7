package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-process INTERLEAVED A/B of the serving corpus-cache partition
  * count (r13): two PreparedRecall handles over the same 10k corpus cached
  * at 1 vs 4 partitions, served back-to-back per query so box-speed drift
  * cannot bias either arm (the cross-process A/B was confounded by ~25%
  * canary drift between runs).
  *
  * Run: `sbt "runMain graft.tools.ServePartsProbe"`
  */
object ServePartsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = LabCorpus.corpus(spark)
    val mem1 = base.repartition(1).cache(); mem1.count()
    val mem4 = base.repartition(4).cache(); mem4.count()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val p1 = new graft.domain.PreparedRecall(mem1, spark.emptyDataFrame,
      limit = 10, now = LabCorpus.Now, vocabParallelism = 4,
      prebuildClasses = false)
    val p4 = new graft.domain.PreparedRecall(mem4, spark.emptyDataFrame,
      limit = 10, now = LabCorpus.Now, vocabParallelism = 4,
      prebuildClasses = false)
    val qs = LabCorpus.questions.map(_.query)
    def once(p: graft.domain.PreparedRecall, q: String): Double = {
      val t0 = System.nanoTime()
      p.recall(q).collect()
      (System.nanoTime() - t0) / 1e6
    }
    (0 to 9).foreach { i => once(p1, qs(i)); once(p4, qs(i)) }
    val pairs = (10 to 19).map(i => (once(p1, qs(i)), once(p4, qs(i))))
    val m1 = pairs.map(_._1).sorted.apply(pairs.size / 2)
    val m4 = pairs.map(_._2).sorted.apply(pairs.size / 2)
    println(f"[serveparts] interleaved median-of-10: parts1=$m1%.1f ms " +
      f"parts4=$m4%.1f ms delta=${m4 - m1}%+.1f ms")
    pairs.foreach { case (a, b) =>
      println(f"[serveparts]   parts1=$a%7.1f  parts4=$b%7.1f")
    }
    p1.close(); p4.close()
    spark.stop()
  }
}
