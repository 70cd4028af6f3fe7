package graft

import graft.jobs.CorpusPipelineJob
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end smoke of the training-corpus pipeline job: the composed run
  * must conserve the corpus through the funnel, redact survivors, carry the
  * URL policy when the column exists, and pack shards that conserve the
  * kept set — each invariant owned by an operator-level gate, re-asserted
  * here across the composition boundary.
  */
class CorpusPipelineJobSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("pipeline job runs standalone on the driver documents + urls") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("url", concat(lit("https://WWW.Site"),
        (col("doc_id") % 7).cast("string"), lit(".com/p?utm_source=x")))
    val out = CorpusPipelineJob.run(docs)
    val (kept, funnel, profile, shards) =
      (out.kept, out.funnel, out.profile, out.shards)
    val total = docs.count()
    val funnelRows = funnel.collect()
    assert(funnelRows.map(_.getLong(1)).sum == total,
      "funnel stage counts must sum to the corpus")
    val keptRows = kept.collect()
    assert(keptRows.nonEmpty && keptRows.length ==
      funnelRows.find(_.getString(0) == "kept").map(_.getLong(1)).get)
    // survivors are redacted and policy-checked
    assert(kept.filter(col("text").rlike(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).count() == 0,
      "no live emails may survive the pipeline")
    assert(keptRows.forall(r =>
      !r.getAs[String]("canonical_url").contains("utm_")))
    // shard packing conserves the kept set
    val shardRows = shards.collect()
    assert(shardRows.map(_.getLong(2)).sum == keptRows.length)
    // profile covers every input source
    assert(profile.select("source").collect().map(_.getString(0)).toSet ==
      docs.select("source").distinct().collect().map(_.getString(0)).toSet)
    out.release()
  }

  test("benchmark decontamination stage: a kept doc copying a benchmark " +
    "5-gram drops as f_decontaminated, funnel conserves (r14)") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // benchmark = a verbatim copy of one real kept document's text, so
    // exactly that doc (and any true twins) trips the 5-gram overlap
    val plain = CorpusPipelineJob.run(docs)
    val victim = plain.kept.orderBy("doc_id").select("doc_id", "text")
      .head()
    plain.release()
    val bench = Seq((9999999L, victim.getString(1)))
      .toDF("doc_id", "text")
    val out = CorpusPipelineJob.run(docs, benchmark = Some(bench))
    try {
      val funnelRows = out.funnel.collect()
      assert(funnelRows.map(_.getLong(1)).sum == docs.count(),
        s"funnel must conserve: ${funnelRows.mkString(", ")}")
      val decon = funnelRows.find(_.getString(0) == "f_decontaminated")
      assert(decon.exists(_.getLong(1) >= 1),
        s"the planted benchmark copy must drop: ${funnelRows.mkString(", ")}")
      assert(out.kept.filter(col("doc_id") === victim.getLong(0)).count()
        == 0, "the contaminated doc must not ship")
      // only kept rows re-attribute: exactly one kept row remains
      assert(funnelRows.map(_.getString(0)).count(_ == "kept") == 1)
    } finally out.release()
  }

  test("streaming twin honors the decontamination benchmark per " +
    "micro-batch (r14)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    val tmp = java.nio.file.Files.createTempDirectory("graft-sdecon")
      .toString
    val clean = "the quick morning walk through the park with the dog " +
      "was long and the weather was mild and the air was fresh"
    val dirty = "prefix words then the quick morning walk through the " +
      "park with the dog appears copied here verbatim"
    val bench = Seq((77L, clean)).toDF("doc_id", "text")
    val b0 = Seq((1L, dirty, "web"),
      (2L, "a wholly original account of the harbor and the boats and " +
        "the tide tables of the little town", "web"))
      .toDF("doc_id", "text", "source")
    graft.streaming.StreamingIngest.pipelineBatch(
      b0, 0L, s"$tmp/out", benchmark = Some(bench))
    val funnel = spark.read.parquet(s"$tmp/out/funnel")
    assert(funnel.agg(sum("n")).head.getLong(0) == 2L)
    assert(funnel.filter($"stage" === "f_decontaminated").count() == 1L,
      funnel.collect().mkString(", "))
    val kept = spark.read.parquet(s"$tmp/out/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"contaminated doc must not ship: $kept")
  }

  test("streaming decontam shingles the benchmark ONCE per stream, not " +
    "per batch (r15)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-dkeys")
      .toString
    // an accumulator-probed benchmark source: every evaluation of a
    // benchmark row bumps the counter, so a per-batch re-shingle would
    // show up as a growing value across micro-batches
    val acc = spark.sparkContext.longAccumulator("benchScanRows")
    val probe = udf((s: String) => { acc.add(1L); s })
    val evalText = "the quick morning walk through the park with the dog " +
      "was long and the weather was mild and the air was fresh"
    val bench = Seq((77L, evalText)).toDF("doc_id", "text")
      .withColumn("text", probe($"text"))
    val dirty0 = "prefix words then the quick morning walk through the " +
      "park with the dog appears copied here verbatim"
    val dirty2 = "other filler first but the quick morning walk through " +
      "the park with the dog shows up again in this one"
    def writeWave(rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "text", "source").coalesce(1)
        .write.mode("append").json(s"$tmp/in")
    writeWave(Seq((1L, dirty0, "web"),
      (2L, "a wholly original account of the harbor and the boats and " +
        "the tide tables of the little town", "web")))
    val q = graft.streaming.StreamingIngest.pipelineStream(
      spark, s"$tmp/in", s"$tmp/out", s"$tmp/cp", benchmark = Some(bench))
    q.processAllAvailable()
    val afterB0 = acc.value
    assert(afterB0 > 0, "batch 0 must materialize the benchmark shingles")
    writeWave(Seq((10L, "an unrelated letter about the garden and the " +
      "rain and the seeds that must be planted before the frost", "web")))
    q.processAllAvailable()
    writeWave(Seq((20L, dirty2, "web")))
    q.processAllAvailable()
    q.stop()
    assert(acc.value == afterB0,
      s"benchmark re-scanned after batch 0: $afterB0 -> ${acc.value}")
    val funnel = spark.read.parquet(s"$tmp/out/funnel")
    // three micro-batches ran, and the CACHED keys still decontaminate
    // later batches: the planted copies drop in batch 0 AND batch 2
    assert(funnel.select("batch_id").distinct().count() == 3)
    val decon = funnel.filter($"stage" === "f_decontaminated")
      .select("batch_id").as[Long].collect().toSet
    assert(decon == Set(0L, 2L),
      s"cached keys must decontaminate every batch: $decon")
  }

  test("selection stage composes classifier keep -> soft-dedup weight -> " +
    "UniMax mixture over survivors with a conserving funnel (r13)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = CorpusPipelineJob.runWithSelection(docs,
      CorpusPipelineJob.SelectionConfig(
        positiveSources = Seq("src0", "src1", "src2")))
    try {
      val total = docs.count()
      val funnelRows = out.funnel.collect()
      // the extended funnel still conserves the corpus: hygiene stages +
      // classifier split account for every input doc exactly once
      assert(funnelRows.map(_.getLong(1)).sum == total,
        s"funnel must conserve: ${funnelRows.mkString(", ")}")
      val selRows = out.selected.collect()
      assert(selRows.nonEmpty, "some survivors must pass the classifier")
      assert(selRows.length == funnelRows
        .find(_.getString(0) == "kept").map(_.getLong(1)).get,
        "selected must equal the funnel's kept row")
      val hygieneKept = CorpusPipelineJob.run(docs)
      val hygieneKeptN = hygieneKept.kept.count()
      hygieneKept.release()
      val clfDropped = funnelRows
        .find(_.getString(0) == "s_classifier_drop").map(_.getLong(1))
        .getOrElse(0L)
      assert(selRows.length + clfDropped == hygieneKeptN,
        "classifier split must partition the hygiene survivors")
      // every selected doc carries a positive sd_weight, and the weights
      // average to ~1 (SoftDedup conserves mass over the scored set)
      assert(selRows.forall(_.getAs[Double]("sd_weight") > 0))
      val meanW = selRows.map(_.getAs[Double]("sd_weight")).sum /
        selRows.length
      assert(math.abs(meanW - 1.0) < 0.01, s"mean norm weight: $meanW")
      // the mixture covers exactly the surviving sources and its shares
      // sum to <= 1 (== 1 when any source is uncapped)
      val mixRows = out.mixture.collect()
      assert(mixRows.map(_.getAs[String]("source")).toSet ==
        selRows.map(_.getAs[String]("source")).toSet)
      val shareSum = mixRows.map(_.getAs[Double]("mix_share")).sum
      assert(shareSum <= 1.0 + 1e-6, s"shares sum: $shareSum")
    } finally out.release()
  }

  test("streaming pipeline twin appends kept + batch-tagged funnel rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-pipes").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
      .coalesce(1).write.mode("overwrite").json(s"$tmp/in")
    val q = graft.streaming.StreamingIngest.pipelineStream(
      spark, s"$tmp/in", s"$tmp/out", s"$tmp/cp")
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(s"$tmp/out/kept")
    val funnel = spark.read.parquet(s"$tmp/out/funnel")
    val total = Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(funnel.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
      == total, "per-batch funnels must still conserve the corpus")
    val keptN = funnel.filter($"stage" === "kept")
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(kept.count() == keptN)
    assert(funnel.columns.contains("batch_id"))
  }

  test("cross-batch dedup: a duplicate arriving in a later batch is " +
    "emitted once, funnel conserves, replay is idempotent (r12)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    val tmp = java.nio.file.Files.createTempDirectory("graft-xbatch").toString
    val twin = "the cat and dog of the house is happy with all the good " +
      "things around here today"
    val other = "a fine morning walk in the park with the dog and all the " +
      "good friends of the family is here"
    val b1 = Seq((1L, twin, "web"), (2L, "el la de que el la de que", "web"))
      .toDF("doc_id", "text", "source")
    val b2 = Seq((10L, twin, "web"), (11L, other, "web"))
      .toDF("doc_id", "text", "source")
    graft.streaming.StreamingIngest.pipelineBatch(b1, 0L, s"$tmp/out")
    graft.streaming.StreamingIngest.pipelineBatch(b2, 1L, s"$tmp/out")
    val kept = spark.read.parquet(s"$tmp/out/kept")
    val funnel = spark.read.parquet(s"$tmp/out/funnel")
    // the twin content is emitted exactly once — by the batch that saw it
    // first; batch-local dedup could never catch this (r11 divergence)
    val keptCount = kept.count() // materialize before the replay below
    assert(kept.filter($"text".contains("cat and dog")).count() == 1,
      "cross-batch twin must be emitted exactly once")
    val b2f = funnel.filter($"batch_id" === 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b2f.get("e_cross_batch_dup").contains(1L),
      s"batch 1 must attribute the twin to e_cross_batch_dup: $b2f")
    assert(b2f.get("kept").contains(1L), s"got $b2f")
    // conservation across batches: stage counts still sum to the corpus
    assert(funnel.agg(sum("n")).head.getLong(0) == 4L)
    // IDEMPOTENT RESTART: replaying batch 1 under the same batchId must
    // leave every output unchanged — and crucially must NOT dedup the
    // batch against its OWN earlier store write, which would silently
    // erase `other` from the corpus on every recovery
    graft.streaming.StreamingIngest.pipelineBatch(b2, 1L, s"$tmp/out")
    val kept2 = spark.read.parquet(s"$tmp/out/kept")
    assert(kept2.count() == keptCount, "replay must not change kept/")
    assert(kept2.filter($"text".contains("fine morning walk")).count() == 1,
      "replay must not self-dedup the batch against its own store write")
    assert(spark.read.parquet(s"$tmp/out/funnel")
      .agg(sum("n")).head.getLong(0) == 4L)
  }

  test("fpstore compaction: folded store still cross-batch-dedups, replay " +
    "stays idempotent, and the fingerprint set is unchanged (r13)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    val tmp = java.nio.file.Files.createTempDirectory("graft-fpcomp").toString
    val twin = "the cat and dog of the house is happy with all the good " +
      "things around here today"
    def batchDf(id: Long, text: String) =
      Seq((id, text, "web")).toDF("doc_id", "text", "source")
    def uniqueText(i: Long) = s"unique document number $i about the " +
      s"morning walk in the park with friends and family member $i here"
    // batches 0..5: twin in batch 0, unique content after
    graft.streaming.StreamingIngest.pipelineBatch(
      batchDf(0L, twin), 0L, s"$tmp/out")
    (1L to 5L).foreach { i =>
      graft.streaming.StreamingIngest.pipelineBatch(
        batchDf(i * 10, uniqueText(i)), i, s"$tmp/out")
    }
    val store = s"$tmp/out/fpstore"
    def partIds() = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).sorted.toSeq
    assert(partIds() == (0L to 5L), s"got ${partIds()}")
    val fpsBefore = spark.read.parquet(store).select("fp")
      .distinct().as[String].collect().toSet
    // force compaction (pressure threshold 2 < 6 partitions) as batch 6
    // would: fold ids 0..5 into the max folded id (5)
    graft.streaming.StreamingIngest.compactFpStore(
      spark, store, upToExclusive = 6L, maxPartitions = 2)
    assert(partIds() == Seq(5L), s"got ${partIds()}")
    assert(spark.read.parquet(store).select("fp")
      .distinct().as[String].collect().toSet == fpsBefore,
      "compaction must change layout, never the fingerprint set")
    // the folded store still catches the batch-0 twin arriving in batch 6
    graft.streaming.StreamingIngest.pipelineBatch(
      batchDf(100L, twin), 6L, s"$tmp/out")
    val funnel6 = spark.read.parquet(s"$tmp/out/funnel")
      .filter($"batch_id" === 6).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel6.get("e_cross_batch_dup").contains(1L), s"got $funnel6")
    // replay of batch 6 (compaction now a no-op: only partition 5 is
    // below it besides its own) must leave every output unchanged
    val keptBefore = spark.read.parquet(s"$tmp/out/kept").count()
    graft.streaming.StreamingIngest.pipelineBatch(
      batchDf(100L, twin), 6L, s"$tmp/out")
    assert(spark.read.parquet(s"$tmp/out/kept").count() == keptBefore)
    assert(spark.read.parquet(s"$tmp/out/funnel")
      .filter($"batch_id" === 6).agg(sum("n")).head.getLong(0) == 1L)
  }

  test("streaming selection: weights freeze on batch 0, unseen tokens " +
    "score neutral, funnel conserves per batch, replay idempotent (r13)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.sum
    val tmp = java.nio.file.Files.createTempDirectory("graft-selstrm")
      .toString
    val b0 = Seq(
      (1L, "cur", "insight wisdom clarity insight depth"),
      (2L, "cur", "wisdom clarity depth nuance insight"),
      (3L, "raw", "spam junk noise spam clickbait"),
      (4L, "raw", "junk noise clickbait spam junk"))
      .toDF("doc_id", "source", "text")
    graft.streaming.StreamingIngest.selectionBatch(
      b0, 0L, s"$tmp/out", Seq("cur"))
    // batch 0 under its own frozen weights == the batch-mode classifier
    val batchMode = graft.operators.TextPolicy
      .qualityClassifier(b0, Seq("cur"), 9.0)
      .filter($"keep").select("doc_id").as[Long].collect().toSet
    def selectedIds(b: Long) = spark.read.parquet(s"$tmp/out/selected")
      .filter($"batch_id" === b).select("doc_id").as[Long].collect().toSet
    assert(selectedIds(0L) == batchMode,
      "batch 0 must reproduce the batch classifier exactly")
    val wBefore = spark.read.parquet(s"$tmp/out/clfweights").collect()
      .map(_.toString).sorted.toSeq
    // batch 1: one curated-shaped doc (frozen weights keep it), one doc of
    // entirely UNSEEN tokens (scores 0 -> kept when its pareto draw > 0)
    val b1 = Seq(
      (10L, "raw", "insight wisdom clarity depth nuance"),
      (11L, "raw", "zzq yyw xxv uut tts"))
      .toDF("doc_id", "source", "text")
    graft.streaming.StreamingIngest.selectionBatch(
      b1, 1L, s"$tmp/out", Seq("cur"))
    assert(spark.read.parquet(s"$tmp/out/clfweights").collect()
      .map(_.toString).sorted.toSeq == wBefore,
      "weights must FREEZE after batch 0 — later batches never retrain")
    assert(selectedIds(1L).contains(10L),
      "frozen weights must keep the curated-shaped later arrival")
    val unseenScore = spark.read.parquet(s"$tmp/out/selected")
      .filter($"doc_id" === 11L).select("score").as[Double].collect()
    assert(unseenScore.isEmpty || unseenScore.head == 0.0,
      s"unseen-token doc scores neutral 0: ${unseenScore.toSeq}")
    // per-batch funnel conservation
    val funnel = spark.read.parquet(s"$tmp/out/selfunnel")
    assert(funnel.filter($"batch_id" === 1).agg(sum("n"))
      .head.getLong(0) == 2L)
    // replay idempotence
    val before = selectedIds(1L)
    graft.streaming.StreamingIngest.selectionBatch(
      b1, 1L, s"$tmp/out", Seq("cur"))
    assert(selectedIds(1L) == before, "replay must not change selected/")
  }

  test("streaming selection: a crash between weights-dir creation and " +
    "data landing retrains on the next batch instead of wedging (r14, " +
    "ADVICE marker gating)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-selwedge")
      .toString
    // simulate the crash window: the weights DIRECTORY exists but holds
    // no committed data and no marker — the pre-r14 fs.exists(dir) gate
    // would skip training forever and every batch would fail reading it
    new java.io.File(s"$tmp/out/clfweights").mkdirs()
    val b0 = Seq(
      (1L, "cur", "insight wisdom clarity insight depth"),
      (2L, "raw", "spam junk noise spam clickbait"))
      .toDF("doc_id", "source", "text")
    graft.streaming.StreamingIngest.selectionBatch(
      b0, 0L, s"$tmp/out", Seq("cur"))
    assert(new java.io.File(s"$tmp/out/clfweights._TRAINED").exists(),
      "training must commit the marker")
    assert(spark.read.parquet(s"$tmp/out/clfweights").count() > 0)
    assert(spark.read.parquet(s"$tmp/out/selected").count() >= 1)
  }

  test("streaming selection: committed pre-marker weights are adopted " +
    "and the marker backfilled instead of retraining (r15, ADVICE " +
    "upgrade path)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-selup")
      .toString
    // simulate a pre-r14 stream: weights parquet committed, NO marker
    val trainSet = Seq(
      (1L, "cur", "insight wisdom clarity insight depth"),
      (2L, "raw", "spam junk noise spam clickbait"))
      .toDF("doc_id", "source", "text")
    graft.operators.TextPolicy.qualityClassifierWeights(trainSet, Seq("cur"))
      .write.mode("overwrite").parquet(s"$tmp/out/clfweights")
    val wBefore = spark.read.parquet(s"$tmp/out/clfweights").collect()
      .map(_.toString).sorted.toSeq
    // the first post-upgrade batch has DIFFERENT content: a retrain would
    // replace the vocabulary wholesale
    val b = Seq((10L, "cur", "entirely different vocabulary here today"))
      .toDF("doc_id", "source", "text")
    graft.streaming.StreamingIngest.selectionBatch(
      b, 7L, s"$tmp/out", Seq("cur"))
    assert(new java.io.File(s"$tmp/out/clfweights._TRAINED").exists(),
      "adoption must backfill the marker")
    assert(spark.read.parquet(s"$tmp/out/clfweights").collect()
      .map(_.toString).sorted.toSeq == wBefore,
      "pre-marker committed weights must survive the upgrade unchanged")
  }

  test("fpstore read failure fails the micro-batch instead of silently " +
    "skipping cross-batch dedup (r13, ADVICE)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-fperr").toString
    val b = Seq((1L, "a perfectly fine document about the morning walk in " +
      "the park with the dog", "web")).toDF("doc_id", "text", "source")
    graft.streaming.StreamingIngest.pipelineBatch(b, 0L, s"$tmp/out")
    // corrupt the store: a parquet file that isn't parquet
    val part = new java.io.File(s"$tmp/out/fpstore").listFiles()
      .find(_.getName.startsWith("batch_id=")).get
    part.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.write(f.toPath, "not parquet".getBytes)
    }
    intercept[Exception] {
      graft.streaming.StreamingIngest.pipelineBatch(
        Seq((2L, "another fine document about the evening walk in the " +
          "park with the cat", "web")).toDF("doc_id", "text", "source"),
        1L, s"$tmp/out")
      // force evaluation path: pipelineBatch writes eagerly, so reaching
      // here without throwing means the corrupt read was swallowed
    }
  }

  test("streaming twin catches a duplicate across two separate " +
    "micro-batches end-to-end") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-xstream").toString
    val twin = "the cat and dog of the house is happy with all the good " +
      "things around here today"
    new java.io.File(s"$tmp/in").mkdirs()
    Seq((1L, twin, "web")).toDF("doc_id", "text", "source")
      .coalesce(1).write.mode("overwrite").json(s"$tmp/in/b0")
    // the file source reads nested dirs only with a glob; write flat files
    def moveUp(sub: String): Unit = {
      val dir = new java.io.File(s"$tmp/in/$sub")
      dir.listFiles().filter(_.getName.endsWith(".json")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$tmp/in/$sub.json"))
      }
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    moveUp("b0")
    val q = graft.streaming.StreamingIngest.pipelineStream(
      spark, s"$tmp/in", s"$tmp/out", s"$tmp/cp")
    q.processAllAvailable()
    Seq((10L, twin, "web")).toDF("doc_id", "text", "source")
      .coalesce(1).write.mode("overwrite").json(s"$tmp/in/b1")
    moveUp("b1")
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(s"$tmp/out/kept")
    assert(kept.count() == 1,
      "the second micro-batch's twin must be dropped by the store join")
    val funnel = spark.read.parquet(s"$tmp/out/funnel")
    assert(funnel.filter($"stage" === "e_cross_batch_dup").count() == 1)
  }

  test("pipeline job main with --select writes the selection relations " +
    "too (r13)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jobsel")
      .toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$tmp/docs")
    CorpusPipelineJob.main(Array(s"$tmp/docs", s"$tmp/out", "500.0",
      "--select", "src0,src1,src2"))
    for (rel <- Seq("kept", "funnel", "selected", "mixture", "profile",
        "shards"))
      assert(spark.read.parquet(s"$tmp/out/$rel").count() > 0,
        s"$rel must be written and non-empty")
    // the funnel written by --select is the EXTENDED one
    assert(spark.read.parquet(s"$tmp/out/funnel")
      .filter(col("stage") === "s_classifier_drop").count() <= 1)
  }

  test("pipeline job main writes all four relations") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$tmp/in")
    // main() builds its own session via getOrCreate (shares the test one)
    CorpusPipelineJob.main(Array(s"$tmp/in", s"$tmp/out", "400"))
    val kept = SparkTestSession.spark.read.parquet(s"$tmp/out/kept")
    val funnel = SparkTestSession.spark.read.parquet(s"$tmp/out/funnel")
    val shards = SparkTestSession.spark.read.parquet(s"$tmp/out/shards")
    assert(kept.count() > 0 && funnel.count() > 0 && shards.count() > 0)
    assert(SparkTestSession.spark.read.parquet(s"$tmp/out/profile").count() > 0)
  }
}
