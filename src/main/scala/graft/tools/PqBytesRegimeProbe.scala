package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the PQ serving channel's BYTES-BOUND regime claim (r19,
  * VERDICT r18 item 5 / "What's missing" #2): every prior probe corpus was
  * page-cached, so the 16-32x code-table shrink never showed up in ms —
  * the channel was justified by the on-disk gauge alone (5.6x at dim 32,
  * where parquet compresses fp32 well). This probe runs TWO dims (32 and
  * >= 256 — where fp32 noise stops compressing and the raw ratio shows)
  * and, when the box allows it (`/proc/sys/vm/drop_caches` writable),
  * times each single-query index scan COLD — caches dropped immediately
  * before every timed call — so the fp32-vs-code byte ratio is measured
  * as disk-read latency, not argued from file sizes. The fp32 refine base
  * stays JVM-cached in BOTH arms (the serving design: the live base is a
  * cached relation; drop_caches does not touch the JVM), so the cold
  * delta isolates INDEX I/O: ~nprobe/64 of dim x 4 bytes/row (ivf-fp32)
  * vs ~nprobe/64 of m bytes/row + a bounded refine (pq).
  *
  * Run: `sbt "runMain graft.tools.PqBytesRegimeProbe [nDocs] [dims...]"`
  * (defaults: 1000000, dims 32 256).
  */
object PqBytesRegimeProbe {
  private def dropCachesOrNot(): Boolean =
    try {
      val w = new java.io.FileWriter("/proc/sys/vm/drop_caches")
      try { w.write("3\n"); true } finally w.close()
    } catch { case _: Throwable => false }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dims = {
      val d = args.drop(1).map(_.toInt)
      if (d.isEmpty) Seq(32, 256) else d.toSeq
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val canDrop = dropCachesOrNot()
    println(s"cold-read arm available (drop_caches writable): $canDrop")

    dims.foreach { dim =>
      // same 64-cluster construction as IvfServeScaleProbe, dim-general:
      // the noise term is per-(id, d) hashed, so at dim >= 256 the fp32
      // payload is ~incompressible (parquet dictionary/RLE find nothing)
      def clusteredVec(idCol: org.apache.spark.sql.Column) =
        transform(sequence(lit(0), lit(dim - 1)), d =>
          (sin((idCol % 64).cast("double") * 7.3 + d.cast("double") * 1.1) +
            ((abs(xxhash64(idCol * 33 + d)) % 1000).cast("double") / 1000.0
              - 0.5) * 0.1).cast("float"))
      val vecs = spark.range(n).select(
        col("id").cast("string").as("id"), col("id").as("vec_id"),
        clusteredVec(col("id")).as("embedding"))
        .repartition(32).cache()
      vecs.count()
      val ivfPath = java.nio.file.Files
        .createTempDirectory(s"bytes_ivf_d$dim").toString
      val pqPath = java.nio.file.Files
        .createTempDirectory(s"bytes_pq_d$dim").toString
      var t = System.nanoTime()
      graft.operators.IvfIndex.buildKMeans(vecs, ivfPath, k = 64, iters = 3)
      println(f"dim=$dim ivf build: ${(System.nanoTime() - t) / 1e9}%.0f s")
      t = System.nanoTime()
      graft.operators.PqIndex.build(vecs, pqPath, m = 8, ksub = 32)
      println(f"dim=$dim pq build:  ${(System.nanoTime() - t) / 1e9}%.0f s")
      val ivfBytes = graft.operators.PqIndex.assignBytes(ivfPath)
      val pqBytes = graft.operators.PqIndex.assignBytes(pqPath)
      println(f"dim=$dim on disk: ivf fp32 ${ivfBytes / 1048576.0}%.1f MiB, " +
        f"pq codes ${pqBytes / 1048576.0}%.1f MiB -> " +
        f"${ivfBytes.toDouble / pqBytes}%.1fx")

      val qvecs = (0 until 5).map { i =>
        // query near cluster (i*13)%64 — same construction as corpus rows
        val id = (i * 13L) % 64L + 64L * 997L
        (0 until dim).map { d =>
          (math.sin((id % 64).toDouble * 7.3 + d * 1.1)).toFloat
        }.toArray
      }
      def ivfOnce(q: Array[Float]): Double = {
        val t0 = System.nanoTime()
        graft.operators.IvfIndex.topK(spark, ivfPath, q, k = 10,
          nprobe = 8).collect()
        (System.nanoTime() - t0) / 1e6
      }
      def pqOnce(q: Array[Float]): Double = {
        val t0 = System.nanoTime()
        graft.operators.PqIndex.topK(spark, pqPath, vecs, q, k = 10,
          nprobe = 8, refine = 16).collect()
        (System.nanoTime() - t0) / 1e6
      }
      // warm (page-cached) arms first — codegen + listing warmup included
      qvecs.take(2).foreach { q => ivfOnce(q); pqOnce(q) }
      val warmIvf = qvecs.map(ivfOnce)
      val warmPq = qvecs.map(pqOnce)
      def med(xs: Seq[Double]) = xs.sorted.apply((xs.size - 1) / 2)
      println(f"dim=$dim WARM  ivf_fp32 ${med(warmIvf)}%7.1f ms/q   " +
        f"pq ${med(warmPq)}%7.1f ms/q   (page-cached)")
      if (canDrop) {
        // cold arms: drop the page cache before EVERY timed call;
        // interleaved so a box-phase drift cannot bias one arm
        val coldIvf = scala.collection.mutable.Buffer[Double]()
        val coldPq = scala.collection.mutable.Buffer[Double]()
        qvecs.foreach { q =>
          dropCachesOrNot(); coldIvf += ivfOnce(q)
          dropCachesOrNot(); coldPq += pqOnce(q)
        }
        println(f"dim=$dim COLD  ivf_fp32 ${med(coldIvf.toSeq)}%7.1f ms/q   " +
          f"pq ${med(coldPq.toSeq)}%7.1f ms/q   " +
          f"(caches dropped per call; ratio ${med(coldIvf.toSeq) / med(coldPq.toSeq)}%.2fx)")
      }
      vecs.unpersist()
      Seq(ivfPath, pqPath).foreach { d =>
        scala.util.Try(org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(d)))
      }
    }
    spark.stop()
  }
}
