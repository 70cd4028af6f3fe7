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

  test("reduced-nprobe PQ and OPQ-lite rotation: measured recall, exact " +
    "refine parity, rotation never catastrophic") {
    val tmpP = java.nio.file.Files.createTempDirectory("graft-pq-np").toString
    val tmpR = java.nio.file.Files.createTempDirectory("graft-pq-rot").toString
    PqIndex.build(docVecs, tmpP, m = 8, ksub = 32)
    PqIndex.buildRotated(docVecs, tmpR, m = 8, ksub = 32)
    val qvecs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 61 === 0).orderBy("doc_id")
      .select("text").collect()
      .map(r => graft.domain.LexicalEmbedding.embed(r.getString(0))).toSeq
    def recallOf(f: Array[Float] => org.apache.spark.sql.DataFrame): Double = {
      val rs = qvecs.map { q =>
        val exact = docVecs
          .withColumn("sim", graft.functions.round4(graft.functions
            .VectorFunctions.cosineSim(col("embedding"), typedlit(q))))
          .orderBy(desc("sim"), asc("vec_id")).limit(10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val got = f(q).select("vec_id").collect().map(_.getLong(0)).toSet
        (got & exact).size.toDouble / exact.size
      }
      rs.sum / rs.size
    }
    val plain = recallOf(q =>
      PqIndex.topK(spark, tmpP, docVecs, q, k = 10, nprobe = 8, refine = 8))
    val rotated = recallOf(q =>
      PqIndex.topKRotated(spark, tmpR, docVecs, q, k = 10, nprobe = 8, refine = 8))
    info(f"nprobe=8 recall@10: plain pq = $plain%.3f, opq-lite rotated = $rotated%.3f")
    val plainFull = recallOf(q =>
      PqIndex.topK(spark, tmpP, docVecs, q, k = 10, nprobe = 64, refine = 8))
    val rotatedFull = recallOf(q =>
      PqIndex.topKRotated(spark, tmpR, docVecs, q, k = 10, nprobe = 64, refine = 8))
    info(f"full-probe recall@10: plain pq = $plainFull%.3f, rotated = $rotatedFull%.3f" +
      " (separates codebook quality from cell routing)")
    // PINNED NEGATIVE RESULT: on THESE embeddings (hashed-lexical — sparse,
    // axis-aligned energy) the rotation HURTS: measured 0.90 -> 0.82
    // full-probe, 0.87 -> 0.74 at nprobe 8. PCA densifies the naturally
    // sparse subvectors, and 4-5 bit sub-codebooks quantize dense slices
    // worse than sparse ones; the published OPQ win is for correlated DENSE
    // model embeddings. The engine therefore defaults to the identity
    // rotation; buildRotated stays as the option for dense-embedding
    // deployments. This assertion is the honest record — if the data ever
    // changes such that rotation wins, it should fail and flip the default.
    assert(plain >= rotated,
      s"rotation now WINS on this data ($rotated > $plain) — flip the default")
    assert(rotatedFull >= 0.7, s"rotated PQ collapsed: $rotatedFull")
    // refine parity: a corpus vector queried against the ROTATED index at
    // full probe still scores exactly 1.0 (cosine is rotation-invariant,
    // refine runs against the original fp32 vectors)
    val self = docVecs.orderBy("vec_id").select("embedding").head
      .getAs[scala.collection.Seq[Float]](0).toArray
    val top = PqIndex.topKRotated(spark, tmpR, docVecs, self, k = 1, nprobe = 64)
      .head
    assert(top.getAs[Double]("sim") == 1.0, s"got $top")
    // the stored rotation must be a PERMUTED ORTHONORMAL basis (the
    // balanced-allocation reorder really happened and preserved geometry)
    val rot = spark.read.parquet(s"$tmpR/rotation")
      .orderBy("component").collect().map(_.getSeq[Double](1).toArray)
    assert(rot.length == 64 && rot.forall(_.length == 64))
    for (i <- Seq(0, 13, 37)) {
      val n = math.sqrt(rot(i).map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-6, s"row $i not unit: $n")
    }
    val dot0_1 = rot(0).zip(rot(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot0_1) < 1e-6, s"rows not orthogonal: $dot0_1")
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

  // --- frozen-codebook drift lifecycle (r16, VERDICT r15 item 7): the
  // IvfIndexSpec policy matrix, mirrored — coherent never advises /
  // 3 drifted batches trip / rebuild restores fit and clears state /
  // replay stays a no-op / a stale crash bracket recovers.

  private def cluster(from: Int, until: Int, base: Double) = {
    import spark.implicits._
    (from until until).map { i =>
      (i.toLong, Seq.tabulate(8)(d =>
        (base + (i % 5) * 0.01 + d * 0.001).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("pq drift policy: three consecutive drifted batches trip " +
    "REBUILD_ADVISED, a coherent stream never trips, rebuildIndex " +
    "re-trains codebooks, restores fit, and preserves replay (r16)") {
    import graft.streaming.StreamingIngest
    def build(tmp: String): Unit = assert(StreamingIngest.pqBatch(
      cluster(0, 100, 0.0).unionByName(cluster(100, 200, 1.0)),
      0L, tmp, m = 8, ksub = 4))
    // COHERENT stream: in-distribution appends never advise
    val tmpC = java.nio.file.Files.createTempDirectory("graft-pq-polc")
      .toString
    build(tmpC)
    (1 to 3).foreach { b =>
      assert(StreamingIngest.pqBatch(
        cluster(100 + 100 * b, 200 + 100 * b, (b % 2).toDouble),
        b.toLong, tmpC, m = 8, ksub = 4))
    }
    assert(!IvfIndex.rebuildAdvised(spark, tmpC),
      "a coherent stream must never advise a PQ rebuild")
    // DRIFTED stream: advisory appears exactly at the 3rd consecutive
    // over-threshold batch
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-pol")
      .toString
    build(tmp)
    assert(StreamingIngest.pqBatch(cluster(200, 300, 1.0), 1L, tmp))
    assert(StreamingIngest.pqBatch(cluster(300, 400, 25.0), 2L, tmp))
    assert(StreamingIngest.pqBatch(cluster(400, 500, 25.0), 3L, tmp))
    assert(!IvfIndex.rebuildAdvised(spark, tmp),
      "two drifted batches must not trip a K=3 rule")
    assert(StreamingIngest.pqBatch(cluster(500, 600, 25.0), 4L, tmp))
    assert(IvfIndex.rebuildAdvised(spark, tmp),
      "three consecutive drifted batches must advise")
    // offline rebuild against the fp32 source (all committed vectors):
    // codebooks retrain, advisory + stale fit history clear, commit
    // markers survive
    val source = cluster(0, 100, 0.0).unionByName(cluster(100, 200, 1.0))
      .unionByName(cluster(200, 300, 1.0))
      .unionByName(cluster(300, 400, 25.0))
      .unionByName(cluster(400, 500, 25.0))
      .unionByName(cluster(500, 600, 25.0))
    PqIndex.rebuildIndex(spark, tmp, source)
    assert(!IvfIndex.rebuildAdvised(spark, tmp),
      "rebuild must clear the advisory")
    assert(IvfIndex.fitHistory(spark, tmp).isEmpty,
      "fit history rated the RETIRED codebooks — must clear")
    def nRows = spark.read.parquet(s"$tmp/assignments").count()
    assert(nRows == 600L)
    // replay of a committed batch after the swap stays a no-op
    assert(!StreamingIngest.pqBatch(cluster(500, 600, 25.0), 4L, tmp,
      m = 8, ksub = 4), "commit markers survive the swap — replay must skip")
    assert(nRows == 600L)
    // the rebuilt codebooks FIT the formerly-drifted cluster: a new batch
    // rates ~baseline and does not re-advise
    assert(StreamingIngest.pqBatch(cluster(600, 700, 25.0), 5L, tmp,
      m = 8, ksub = 4))
    val hist = IvfIndex.fitHistory(spark, tmp)
    assert(hist.map(_._1) == Seq(5L), s"got $hist")
    assert(hist.head._2 < IvfIndex.DefaultFitRatioThreshold,
      s"rebuilt codebooks must fit the drifted cluster: $hist")
    assert(!IvfIndex.rebuildAdvised(spark, tmp))
    // geometry preserved without being respecified: m=8, ksub=4 survive
    val books = PqIndex.readCodebooks(spark, tmp)
    assert(books.size == 8 && books.head.size == 4,
      s"rebuild changed geometry: m=${books.size} ksub=${books.head.size}")
  }

  test("pq rebuild recovery: a stale _REBUILD_INPROGRESS bracket is " +
    "repaired by re-running rebuildIndex, and the rebuilt index serves (r16)") {
    import graft.streaming.StreamingIngest
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-rec")
      .toString
    assert(StreamingIngest.pqBatch(
      cluster(0, 100, 0.0).unionByName(cluster(100, 200, 1.0)),
      0L, tmp, m = 8, ksub = 4))
    assert(StreamingIngest.pqBatch(cluster(200, 300, 25.0), 1L, tmp))
    IvfIndex.writeSmallFile(spark, s"$tmp/_REBUILD_INPROGRESS", "0")
    val source = cluster(0, 100, 0.0).unionByName(cluster(100, 200, 1.0))
      .unionByName(cluster(200, 300, 25.0))
    PqIndex.rebuildIndex(spark, tmp, source)
    assert(!new java.io.File(s"$tmp/_REBUILD_INPROGRESS").exists(),
      "recovery must clear the in-progress bracket")
    assert(spark.read.parquet(s"$tmp/assignments").count() == 300)
    // the recovered index serves through the PQ query path (refine against
    // the fp32 source): a stored vector's top-1 is an exact-cosine hit
    val q = cluster(250, 251, 25.0).select("embedding")
      .head().getSeq[Float](0).toArray
    val top = PqIndex.topK(spark, tmp, source, q, k = 1, nprobe = 64)
      .collect()
    assert(top.nonEmpty && top.head.getAs[Double]("sim") > 0.999,
      s"${top.toSeq}")
    // idempotent recovery: a second rebuild is a fixed point
    PqIndex.rebuildIndex(spark, tmp, source)
    assert(spark.read.parquet(s"$tmp/assignments").count() == 300)
  }

  test("append/rebuild REQUIRE the CELLBITS geometry marker — a marker-less " +
    "pre-r16 index fails loudly instead of guessing the default (ADVICE r16)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-cb").toString
    val source = cluster(0, 100, 0.0).unionByName(cluster(100, 200, 1.0))
    PqIndex.build(source, tmp, m = 8, ksub = 4)
    // simulate an index written before the marker existed
    assert(new java.io.File(s"$tmp/CELLBITS").delete())
    val e = intercept[IllegalStateException] {
      PqIndex.append(cluster(200, 300, 1.0), tmp)
    }
    assert(e.getMessage.contains("CELLBITS"), e.getMessage)
    // full build() re-adopts the marker; append works again
    PqIndex.build(source, tmp, m = 8, ksub = 4)
    PqIndex.append(cluster(200, 300, 1.0), tmp)
    assert(spark.read.parquet(s"$tmp/assignments").count() == 300)
  }
}
