package graft.tools

import graft.functions.VectorFunctions._
import graft.functions.round4
import graft.operators.IvfIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Measures the k-means IVF cell-ranking metric question (ADVICE r10):
  * assignment is squared-L2 but the SEARCH metric is cosine — should
  * `probeCells` rank cells by L2 (match the quantizer) or by cosine (match
  * the query)? Prints recall@10 vs the brute-force cosine top-10 for both
  * rankings at nprobe ∈ {4, 8, 16} on the clustered document vectors.
  *
  * Usage: sbt "runMain graft.tools.IvfProbeMetricProbe [sfDir]"
  */
object IvfProbeMetricProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vecs = ClusteredVectors.fromDocuments(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("probe-ivf-km").toString
    IvfIndex.buildKMeans(vecs, tmp)
    val qvecs = ClusteredVectors.queryVectors(spark, sfDir)

    def topKIn(q: Array[Float], cells: Seq[Long]): Set[Long] =
      spark.read.parquet(s"$tmp/assignments")
        .filter(col("cell").isin(cells: _*))
        .withColumn("sim", round4(cosineSim(col("embedding"), typedlit(q))))
        .orderBy(desc("sim"), asc("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet

    // brute force = full probe (exact for any quantizer)
    val allCells = spark.read.parquet(s"$tmp/centroids")
      .select("cell").collect().map(_.getLong(0)).toSeq
    val exact = qvecs.map(q => topKIn(q, allCells))

    for (np <- Seq(4, 8, 16); metric <- Seq("l2", "cosine")) {
      val rec = qvecs.zip(exact).map { case (q, ex) =>
        val cells = IvfIndex.probeCellsWith(spark, tmp, q, np, metric)
        (topKIn(q, cells) & ex).size.toDouble / ex.size
      }
      println(f"nprobe=$np%2d metric=$metric%-6s recall@10=${rec.sum / rec.size}%.3f")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    spark.stop()
  }
}
