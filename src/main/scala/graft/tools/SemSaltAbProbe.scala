package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B of the r14 SemDeDup bucket salting on the real
  * embeddings table: salts=64 (shipped) vs salts=1 (the pre-r14 plan) —
  * pins the small-scale overhead the mega-bucket bound costs when no
  * mega-bucket exists (the gate corpus), alongside the skew win
  * PipelineScaleProbe measures when one does.
  *
  * Run: `sbt "runMain graft.tools.SemSaltAbProbe [sfDir]"`
  */
object SemSaltAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).cache()
    println(s"[semsalt] n=${e.count()} dir=$dir")
    def run(salts: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.Similarity.boundedBandedPairs(e, 8, 0.35, salts).count()
      (System.nanoTime() - t0) / 1e9
    }
    run(64); run(1) // codegen warm-up
    for (_ <- 1 to 3)
      println(f"[semsalt] salt64=${run(64)}%.2f s  salt1=${run(1)}%.2f s")
    spark.stop()
  }
}
