package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the documented-but-unmeasured at-scale PageRank layout claim
  * (ARCHITECTURE: "bucket edges+ranks on the node key for exchange-free
  * iterations"; VERDICT r11 item 7): per-iteration wall time and SHUFFLE
  * BYTES for the current cached-invariants form vs the same algorithm over
  * a bucketed-by-src edges table (the 100 TB shape, where edges live in
  * storage rather than cache).
  *
  * Broadcast joins are disabled: at probe sizes the rank frame fits under
  * the broadcast threshold and AQE would broadcast it, measuring a shape
  * that cannot exist at real scale (ranks = one row per node).
  *
  * Run: `sbt "runMain graft.tools.PageRankLayoutProbe [edgeCounts...]"`
  * (defaults 100k, 1M edges; nodes = edges/10, avg degree 10).
  */
object PageRankLayoutProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(100000L, 1000000L)
    val wh = java.nio.file.Files.createTempDirectory("pr-wh").toString
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // shuffle accounting via stage metrics
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleWrite.addAndGet(
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def measure(label: String)(f: => Long): Unit = {
      f // warm (codegen + caches)
      Thread.sleep(300)
      shuffleWrite.set(0)
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let stage-completed events drain
      println(f"[prlayout] $label%-28s $secs%7.2f s  " +
        f"shuffle=${shuffleWrite.get / 1e6}%9.1f MB  ($rows rows)")
    }

    def mix(c: org.apache.spark.sql.Column) = abs(xxhash64(c))
    for (n <- sizes) {
      val nodes = n / 10
      val edges = spark.range(n).select(
        concat(lit("n"), (mix(col("id") * 13) % nodes).cast("string")).as("src"),
        concat(lit("n"), (mix(col("id") * 29 + 7) % nodes).cast("string")).as("dst"))

      // arm A: the shipped form — cached loop invariants, unbucketed input
      val cached = edges.cache(); cached.count()
      measure(s"cached-invariants n=$n") {
        graft.operators.GraphAnalytics
          .pageRank(cached, iters = 3, damping = 0.85, topK = 30).count()
      }
      cached.unpersist()

      // arm B: bucketed-by-src edges TABLE (pre-deduplicated at write so
      // the read side starts from the same state the cached arm's distinct
      // produces; the bucketed layout's point is that the per-round
      // src-side join needs no exchange because the scan itself reports
      // hashpartitioning(src))
      val tbl = s"pr_edges_$n"
      val tWrite0 = System.nanoTime()
      graft.operators.GraphAnalytics.writeBucketedEdges(edges, tbl)
      println(f"[prlayout] bucketed-write n=$n        " +
        f"${(System.nanoTime() - tWrite0) / 1e9}%7.2f s (one-time layout cost)")
      measure(s"bucketed-table    n=$n") {
        graft.operators.GraphAnalytics
          .pageRank(spark.table(tbl), iters = 3, damping = 0.85, topK = 30,
            dedup = false).count()
      }
      spark.sql(s"DROP TABLE $tbl")
    }
    spark.stop()
  }
}
