package graft.tools

import org.apache.spark.sql.SparkSession

/** Dimension-scaling evidence for the covariance/PCA path (VERDICT r10
  * item 7): the bench's d=64 hides the d² driver merge, so this probe runs
  * `covarianceFast` and `Pca.fit` at transformer-realistic dimensions
  * (256 / 512 / 1024) over 100k vectors and records per-phase wall time
  * plus the driver-side statistic sizes, so the d ceiling is a measured
  * fact, not a guess.
  *
  * Driver costs at dimension d, P partials:
  *  - partial merge: P × d(d+3)/2 doubles collected (P=32, d=1024 →
  *    ~134 MB transferred, 4.2 MB merged statistic);
  *  - Jacobi eigen: O(d³) per sweep on ONE driver core — the real wall.
  *
  * Run: `sbt "runMain graft.tools.PcaDimProbe [n] [dims...]"`
  */
object PcaDimProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val dims = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(256, 512, 1024)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mb(b: Long): String = f"${b / 1024.0 / 1024.0}%.1f MB"
    for (d <- dims) {
      val vecs = PipelineScaleProbe.syntheticVectors(spark, n, d)
        .localCheckpoint()
      val parts = vecs.rdd.getNumPartitions
      val partialBytes = parts.toLong * (d.toLong * (d + 3) / 2) * 8
      val rt = Runtime.getRuntime
      System.gc()
      val heap0 = rt.totalMemory() - rt.freeMemory()
      val t0 = System.nanoTime()
      val rows = graft.operators.Pca.covarianceFast(vecs).count()
      val covS = (System.nanoTime() - t0) / 1e9
      System.gc()
      val heap1 = rt.totalMemory() - rt.freeMemory()
      println(f"[pcadim] d=$d%4d n=$n covfast=$covS%7.2f s ($rows rows, " +
        s"$parts partials x ${mb(partialBytes / parts)} = ${mb(partialBytes)} collected, " +
        s"driver-heap delta ${mb(math.max(0, heap1 - heap0))})")
      // Jacobi eigen is O(d^3)/sweep single-threaded — measured, not
      // extrapolated, at every probed d (the scaladoc ceiling note quotes
      // these numbers)
      val t1 = System.nanoTime()
      val (eigs, _) = graft.operators.Pca.fit(vecs)
      val fitS = (System.nanoTime() - t1) / 1e9
      println(f"[pcadim] d=$d%4d n=$n pca_fit=$fitS%7.2f s " +
        f"(top eig ${eigs.head}%.4f; fit = covfast + jacobi)")
      graft.functions.releaseCheckpoint(vecs)
    }
    spark.stop()
  }
}
