package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-process INTERLEAVED A/B of the r13 driver-local request
  * broadcasts (LocalTableBroadcastExec): two PreparedRecall handles over
  * the SAME cached corpus — one built with the stock request-side
  * BroadcastExchangeExec (graft.fast.nolocalbc set during its build), one
  * with the driver-local node — served back-to-back per query so box
  * drift cannot bias either arm.
  *
  * Run: `sbt "runMain graft.tools.LocalBcProbe"`
  */
object LocalBcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mem = LabCorpus.corpus(spark).repartition(1).cache(); mem.count()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    sys.props("graft.fast.nolocalbc") = "1"
    val stock = new graft.domain.PreparedRecall(mem, spark.emptyDataFrame,
      limit = 10, now = LabCorpus.Now, vocabParallelism = 4,
      prebuildClasses = false)
    sys.props.remove("graft.fast.nolocalbc")
    val local = new graft.domain.PreparedRecall(mem, spark.emptyDataFrame,
      limit = 10, now = LabCorpus.Now, vocabParallelism = 4,
      prebuildClasses = false)
    println(s"[localbc] stock gate: ${stock.fastPathDiagnosis}")
    println(s"[localbc] local gate: ${local.fastPathDiagnosis}")
    val qs = LabCorpus.questions.map(_.query)
    def once(p: graft.domain.PreparedRecall, q: String): Double = {
      val t0 = System.nanoTime()
      p.recall(q).collect()
      (System.nanoTime() - t0) / 1e6
    }
    (0 to 9).foreach { i => once(stock, qs(i)); once(local, qs(i)) }
    val pairs = (10 to 19).map(i => (once(stock, qs(i)), once(local, qs(i))))
    val ms = pairs.map(_._1).sorted.apply(pairs.size / 2)
    val ml = pairs.map(_._2).sorted.apply(pairs.size / 2)
    println(f"[localbc] interleaved median-of-10: stock=$ms%.1f ms " +
      f"localbc=$ml%.1f ms delta=${ms - ml}%+.1f ms " +
      f"(${(ms - ml) * 100 / ms}%.0f%%)")
    pairs.foreach { case (a, b) =>
      println(f"[localbc]   stock=$a%7.1f  localbc=$b%7.1f")
    }
    stock.close(); local.close()
    spark.stop()
  }
}
