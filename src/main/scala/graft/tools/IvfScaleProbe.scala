package graft.tools

import graft.operators.IvfIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Measures where int8 IVF quantization PAYS: fp32 vs int8 reduced-nprobe
  * query latency as the index grows. At bench scale (5k vectors) the whole
  * index sits in page cache and the dequantize arithmetic only adds cost;
  * the int8 claim is that ~4x-smaller assignments win once the probed
  * cells' I/O dominates. This probe builds BOTH index variants over
  * synthetic corpora (PipelineScaleProbe's planted-cluster vectors) and
  * times warm reduced-nprobe queries — recording the crossover (or its
  * absence) as a measured fact per size.
  *
  * Run: `sbt "runMain graft.tools.IvfScaleProbe [sizes...]"`
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(100000L, 500000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    for (n <- sizes) {
      // pin float elements (the synthetic arithmetic promotes to double)
      val vecs = PipelineScaleProbe.syntheticVectors(spark, n)
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .withColumn("label", lit(0)).cache()
      vecs.count()
      val qvec = vecs.filter(col("vec_id") === 7L)
        .head().getAs[scala.collection.Seq[Number]]("embedding")
        .map(_.floatValue).toArray
      val tmp = java.nio.file.Files.createTempDirectory(s"ivfscale-$n").toString
      def bestOf3(f: => Long): Double = {
        f // warm-up
        (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
        }.min
      }
      val tB0 = System.nanoTime()
      IvfIndex.build(vecs, s"$tmp/fp32")
      val buildFp32 = (System.nanoTime() - tB0) / 1e9
      val tB1 = System.nanoTime()
      IvfIndex.buildQuantized(vecs, s"$tmp/int8")
      val buildInt8 = (System.nanoTime() - tB1) / 1e9
      def dirMb(p: String): Double = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) Option(f.listFiles()).fold(0L)(_.map(walk).sum)
          else f.length()
        walk(new java.io.File(p)) / 1e6
      }
      // the refine side reads the corpus from PARQUET, not the probe's
      // cached frame: timing the refine against an in-memory cache would
      // charge int8 a full cached-corpus scan per query that neither the
      // fp32 path nor a production deployment pays
      vecs.write.mode("overwrite").parquet(s"$tmp/vectors")
      val vecsOnDisk = spark.read.parquet(s"$tmp/vectors")
      val fp32Ms = bestOf3(
        IvfIndex.topK(spark, s"$tmp/fp32", qvec, 10, nprobe = 8).count())
      val int8Ms = bestOf3(IvfIndex.topKQuantized(spark, s"$tmp/int8",
        vecsOnDisk, qvec, 10, nprobe = 8).count())
      println(f"[ivfscale] n=$n%7d fp32=${fp32Ms}%7.1f ms int8=${int8Ms}%7.1f ms " +
        f"assignMB fp32=${dirMb(s"$tmp/fp32/assignments")}%7.1f " +
        f"int8=${dirMb(s"$tmp/int8/assignments")}%7.1f " +
        f"build fp32=${buildFp32}%5.1f s int8=${buildInt8}%5.1f s")
      vecs.unpersist()
      // indexes at n=1M run to hundreds of MB — clean up per size
      def rmRec(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRec))
        f.delete(); ()
      }
      rmRec(new java.io.File(tmp))
    }
    spark.stop()
  }
}
