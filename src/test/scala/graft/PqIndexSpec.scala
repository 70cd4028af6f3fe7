package graft

import graft.domain.PlaceholderEmbedding
import graft.operators.{IvfIndex, PqIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantized index: refine-corrected recall on clustered vectors,
  * real compression vs the fp32 layout, exact refined scores, and
  * deterministic builds.
  */
class PqIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val docVecs = graft.tools.ClusteredVectors
    .fromDocuments(spark, "/root/testdata/sf0.001")

  test("full-probe PQ + refine recovers brute-force top-10 on clustered vectors") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq").toString
    PqIndex.build(docVecs, tmp, m = 8, ksub = 32)
    val qvecs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 61 === 0).orderBy("doc_id")
      .select("text").collect()
      .map(r => graft.domain.LexicalEmbedding.embed(r.getString(0))).toSeq
    assert(qvecs.size >= 8, s"query sample too small: ${qvecs.size}")
    val recalls = qvecs.map { q =>
      val exact = docVecs
        .withColumn("sim", graft.functions.round4(graft.functions
          .VectorFunctions.cosineSim(col("embedding"), typedlit(q))))
        .orderBy(desc("sim"), asc("vec_id")).limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val pq = PqIndex
        .topK(spark, tmp, docVecs, q, k = 10, nprobe = 64, refine = 8)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (exact & pq).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    info(f"pq full-probe recall@10 = $mean%.3f")
    // 1e-9 slack: the mean of exact tenths lands on 0.9 minus an ulp
    assert(mean >= 0.9 - 1e-9, s"PQ+refine recall@10 $mean < 0.9: $recalls")
    // refined sims are FULL precision: the top hit of a query that IS a
    // corpus vector must score exactly 1.0
    val self = docVecs.orderBy("vec_id").select("embedding").head
      .getAs[scala.collection.Seq[Float]](0).toArray
    val top = PqIndex.topK(spark, tmp, docVecs, self, k = 1, nprobe = 64).head
    assert(top.getAs[Double]("sim") == 1.0, s"got $top")
  }

  test("code table is an order of magnitude smaller than the fp32 layout") {
    val tmpPq = java.nio.file.Files.createTempDirectory("graft-pq-sz").toString
    val tmpF = java.nio.file.Files.createTempDirectory("graft-f32-sz").toString
    // bigger corpus so parquet footers don't dominate the ratio
    import spark.implicits._
    val big = (0 until 20000).map { i =>
      (i.toLong, s"label${i % 4}", PlaceholderEmbedding.embed(s"doc $i").toSeq)
    }.toDF("vec_id", "label", "embedding")
    PqIndex.build(big, tmpPq, cellBits = 2, m = 8, ksub = 16)
    IvfIndex.build(big, tmpF, cellBits = 2)
    val ratio = {
      def f32Bytes(p: String): Long = {
        val root = java.nio.file.Paths.get(p, "assignments")
        val s = java.nio.file.Files.walk(root)
        try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
          .filter(x => x.getFileName.toString.endsWith(".parquet"))
          .map(java.nio.file.Files.size).sum
        finally s.close()
      }
      f32Bytes(tmpF).toDouble / PqIndex.assignBytes(tmpPq)
    }
    info(f"fp32/pq assignment size ratio = $ratio%.1f x")
    assert(ratio >= 10.0, s"expected >=10x compression, got ${ratio}x")
  }

  test("build is deterministic: identical codebooks and codes across runs") {
    val t1 = java.nio.file.Files.createTempDirectory("graft-pq-d1").toString
    val t2 = java.nio.file.Files.createTempDirectory("graft-pq-d2").toString
    PqIndex.build(docVecs, t1, m = 8, ksub = 8, iters = 3)
    PqIndex.build(docVecs.repartition(7), t2, m = 8, ksub = 8, iters = 3)
    def codes(p: String) = spark.read.parquet(s"$p/assignments")
      .orderBy("vec_id").select("vec_id", "code").collect().map(_.toSeq).toSeq
    def books(p: String) = spark.read.parquet(s"$p/codebooks")
      .orderBy("subspace", "centroid_id").collect().map(_.toSeq).toSeq
    assert(books(t1) == books(t2), "codebooks must not depend on partitioning")
    assert(codes(t1) == codes(t2), "codes must not depend on partitioning")
  }
}
