package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Measured evidence for the fingerprint-store compaction (VERDICT r12
  * item 3): drive N micro-batches through the cross-batch dedup store with
  * compaction ON (default pressure gate) and OFF, and print the per-batch
  * prior-store read time plus the store's file count at checkpoints. The
  * uncompacted store accrues one partition (and its files) per batch
  * forever — the read cost grows with batch COUNT even at constant data;
  * the compacted store's read cost tracks data volume only.
  *
  * Run: `sbt "runMain graft.tools.FpStoreProbe [nBatches]"`
  */
object FpStoreProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.nonEmpty) args(0).toInt else 60
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def countFiles(dir: java.io.File): Int =
      if (!dir.exists()) 0
      else dir.listFiles().map(f =>
        if (f.isDirectory) countFiles(f) else 1).sum

    for ((label, maxParts) <- Seq(("compacted", 16),
        ("uncompacted", Int.MaxValue))) {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"fpprobe-$label").toString
      val readMs = collection.mutable.ArrayBuffer.empty[Double]
      for (b <- 0 until nBatches) {
        // 50 unique docs per batch — constant per-batch data volume
        val batch = (0 until 50).map { i =>
          (b * 1000L + i, s"document $b $i about the morning walk in the " +
            s"park with friends and family member ${b * 97 + i} today",
            "web")
        }.toDF("doc_id", "text", "source")
        graft.streaming.StreamingIngest.pipelineBatch(
          batch, b.toLong, s"$tmp/out", maxStorePartitions = maxParts)
        val t0 = System.nanoTime()
        spark.read.parquet(s"$tmp/out/fpstore")
          .filter(col("batch_id") < b + 1).select("fp").count()
        readMs += (System.nanoTime() - t0) / 1e6
      }
      def avg(r: Range): Double =
        r.map(readMs(_)).sum / r.size
      val files = countFiles(new java.io.File(s"$tmp/out/fpstore"))
      println(f"[fpstore] $label%-12s batches=$nBatches storeFiles=$files " +
        f"readMs(b1-10)=${avg(1 until 10)}%.1f " +
        f"readMs(mid)=${avg(nBatches / 2 - 5 until nBatches / 2 + 5)}%.1f " +
        f"readMs(last10)=${avg(nBatches - 10 until nBatches)}%.1f")
    }
    spark.stop()
  }
}
