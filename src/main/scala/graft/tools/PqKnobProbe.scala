package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: PQ recall@10 at nprobe 8 across (ksub, refine) on the bench's
  * clustered vectors — picks the honest setting for the ivf_reduced row.
  * Run: sbt "runMain graft.tools.PqKnobProbe [sfDir]"
  */
object PqKnobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = ClusteredVectors.fromDocuments(spark, sfDir)
    val qvecs = ClusteredVectors.queryVectors(spark, sfDir)
    val tmpF = java.nio.file.Files.createTempDirectory("pqknob-f").toString
    graft.operators.IvfIndex.build(vecs, tmpF)
    val exact = qvecs.map(q => graft.operators.IvfIndex
      .topK(spark, tmpF, q, k = 10, nprobe = 64)
      .select("vec_id").collect().map(_.getLong(0)).toSet)
    for (ksub <- Seq(16, 32)) {
      val tmp = java.nio.file.Files.createTempDirectory(s"pqknob-$ksub").toString
      graft.operators.PqIndex.build(vecs, tmp, ksub = ksub)
      for (refine <- Seq(4, 8, 16)) {
        val rec = qvecs.zip(exact).map { case (q, ex) =>
          val ids = graft.operators.PqIndex
            .topK(spark, tmp, vecs, q, k = 10, nprobe = 8, refine = refine)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          (ids & ex).size.toDouble / ex.size
        }
        println(f"[pqknob] ksub=$ksub%2d refine=$refine%2d nprobe=8 " +
          f"recall@10=${rec.sum / rec.size}%.3f")
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmpF))
    spark.stop()
  }
}
