package graft

import java.sql.Timestamp

import graft.domain._
import graft.operators.Multimodal
import graft.streaming.StreamingIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Specs for graph ops, entity dedup, multimodal plumbing, and streaming. */
class ExtendedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("graph snapshot keeps only edges among visible nodes") {
    import spark.implicits._
    val mems = Seq(
      ("a", "Context", 0.9, ts("2026-01-01 00:00:00"), "content a"),
      ("b", "Context", 0.8, ts("2026-01-02 00:00:00"), "content b"),
      ("c", "Context", 0.1, ts("2026-01-03 00:00:00"), "content c"))
      .toDF("id", "type", "importance", "timestamp", "content")
    val edges = Seq(("a", "b", "RELATES_TO"), ("a", "c", "RELATES_TO"))
      .toDF("src", "dst", "rel_type")
    val (nodes, visEdges) = GraphOps.snapshot(mems, edges, minImportance = 0.5)
    assert(nodes.select("id").collect().map(_.getString(0)).toSet == Set("a", "b"))
    val e = visEdges.collect()
    assert(e.length == 1 && e.head.getAs[String]("dst") == "b",
      "edge to invisible node c must be dropped")
    assert(nodes.columns.contains("node_size") && nodes.columns.contains("node_label"))
  }

  test("sync diff reports ids missing on each side, excluding artifacts") {
    import spark.implicits._
    val canonical = Seq(("a", "Context"), ("b", "Context"), ("meta", "MetaPattern"))
      .toDF("id", "type")
    val replica = Seq("b", "x").toDF("id")
    val diff = GraphOps.syncDiff(canonical, replica).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(diff == Set(("a", "replica"), ("x", "canonical")))
  }

  test("topPreferences ranks a confidence-only edge by its coalesced strength") {
    import spark.implicits._
    val t = ts("2026-01-01 00:00:00")
    val edges = Seq(
      Edge("a", "b", "PREFERS_OVER", Some(0.4), None, None, None, None, None, None, t),
      // no strength — only confidence; must NOT sort as null/last
      Edge("c", "d", "PREFERS_OVER", None, None, Some(0.9), None, None, None, None, t),
      Edge("e", "f", "RELATES_TO", Some(1.0), None, None, None, None, None, None, t))
      .toDF()
    val top = GraphOps.topPreferences(edges, k = 2).collect()
    assert(top.map(_.getAs[String]("src")).toSeq == Seq("c", "a"),
      "confidence-only edge (0.9) must outrank strength=0.4 edge")
  }

  test("touchLastAccessed updates only matched ids") {
    import spark.implicits._
    val now = ts("2026-02-01 00:00:00")
    val old = ts("2026-01-01 00:00:00")
    val mems = Seq(("a", old), ("b", old)).toDF("id", "last_accessed")
    val out = GraphOps.touchLastAccessed(mems, Seq("a").toDF("id"), now)
      .collect().map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    assert(out("a") == now && out("b") == old)
  }

  test("entity dedup merges near-duplicate slugs via levenshtein blocking") {
    import spark.implicits._
    val entities = Seq(
      ("people", "alice"), ("people", "alicia"), ("people", "bob"),
      ("tools", "spark-submit"), ("tools", "sparksubmit"),
      // same slug as a people entity in ANOTHER category: the people merge
      // must not leak across categories
      ("projects", "alicia"))
      .toDF("category", "slug")
    val merged = EntityOps.mergeMap(entities)
      .collect().map(r => (r.getAs[String]("category"), r.getAs[String]("slug")) ->
        r.getAs[String]("canonical_slug")).toMap
    assert(merged(("people", "alicia")) == "alice")
    assert(merged(("tools", "sparksubmit")) == "spark-submit")
    assert(merged(("people", "bob")) == "bob")
    assert(merged(("projects", "alicia")) == "alicia",
      "a people merge must never rewrite a same-slug project")
    // token-block channel: containment pairs beyond the length buckets
    val far = Seq(("people", "bob"), ("people", "bob-the-builder"))
      .toDF("category", "slug")
    val farMerged = EntityOps.mergeMap(far)
      .collect().map(r => r.getAs[String]("slug") -> r.getAs[String]("canonical_slug")).toMap
    assert(farMerged("bob-the-builder") == "bob",
      "token-aligned containment must merge across a >7-char length gap")
  }

  test("frequent-token blocks are capped to O(k) candidates, not C(k,2)") {
    import spark.implicits._
    // 60 slugs sharing the token "john" with strictly increasing lengths:
    // the token channel would emit C(60,2)=1770 pairs from this one block;
    // with the default maxTokenBlock=50 the token is dropped and only the
    // ±1 length-bucket channel pairs neighbours — candidates stay O(k)
    val slugs = (1 to 60).map(i => ("people", "john-" + "x" * i))
    val cands = graft.domain.EntityOps.dedupCandidates(slugs.toDF("category", "slug"))
    val n = cands.count()
    assert(n < 600, s"expected O(k) candidates from a capped block, got $n")
    // a genuine near-dup pair sharing ONLY the capped token must still
    // surface via the length-bucket channel when length-eligible
    val withPair = (slugs ++ Seq(("people", "john-smith"), ("people", "john-smyth")))
      .toDF("category", "slug")
    val pair = graft.domain.EntityOps.dedupCandidates(withPair)
      .filter(col("a_slug") === "john-smith" && col("b_slug") === "john-smyth")
      .collect()
    assert(pair.length == 1 && pair.head.getAs[Double]("sim") >= 0.5,
      "capped-token near-dups must still pair through the length channel")
    // no-silent-caps signal: the dropped block is queryable with its size
    val dropped = graft.domain.EntityOps.droppedTokenBlocks(withPair)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(dropped.toSeq == Seq(("people", "john", 62L)))
  }

  test("the merge job surfaces dropped token blocks in its output " +
    "(VERDICT r6 item 6)") {
    import spark.implicits._
    // the signal existed but nothing emitted it: mergeJob must return the
    // dropped-block rows alongside the merge map whenever the cap trips
    val slugs = (1 to 60).map(i => ("people", "john-" + "x" * i))
    val tripped = graft.domain.EntityOps.mergeJob(slugs.toDF("category", "slug"))
    val drops = tripped.droppedTokenBlocks.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(drops.toSeq == Seq(("people", "john", 60L)),
      "mergeJob must carry the dropped-block accounting")
    assert(tripped.mergeMap.count() == 60,
      "every slug still resolves through the merge map")
    // and a corpus under the cap reports a clean (empty) accounting
    val clean = graft.domain.EntityOps.mergeJob(
      Seq(("people", "ada"), ("people", "adah")).toDF("category", "slug"))
    assert(clean.droppedTokenBlocks.isEmpty,
      "no cap trip must mean zero dropped-block rows")
    // the cap parameter reaches the candidate channel through the job
    val tight = graft.domain.EntityOps.mergeJob(
      Seq(("people", "bob-a"), ("people", "bob-b"), ("people", "bob-c"))
        .toDF("category", "slug"), maxTokenBlock = 2)
    assert(tight.droppedTokenBlocks.collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq == Seq(("bob", 3L)))
  }

  test("token block size counts distinct slugs, not token occurrences") {
    import spark.implicits._
    // "bob-bob-bob-bob-bob" repeats its token 5 times; occurrence counting
    // would see block size 6 and drop "bob" at maxTokenBlock=2, losing the
    // containment pair (length buckets 4 vs 0 can never pair). Distinct-slug
    // counting sees 2 and keeps it.
    val ents = Seq(("people", "bob-bob-bob-bob-bob"), ("people", "bob"))
      .toDF("category", "slug")
    val cands = graft.domain.EntityOps.dedupCandidates(ents, maxTokenBlock = 2)
      .collect()
    assert(cands.length == 1 && cands.head.getAs[String]("a_slug") == "bob",
      "a repeated-token slug must not inflate its block past the cap")
  }

  test("multimodal decode stage is deterministic, schema-stable, null-safe") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val decoded = Multimodal.decodeStage(assets)
    assert(decoded.schema == Multimodal.decodedSchema)
    val rows = decoded.collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("n_bytes") > 0)
      assert(r.getAs[scala.collection.Seq[Float]]("features").length == 8)
    }
    // determinism: decoding twice gives identical feature vectors
    val again = Multimodal.decodeStage(assets).collect()
    assert(rows.map(_.getAs[scala.collection.Seq[Float]]("features").toSeq).toSeq ==
      again.map(_.getAs[scala.collection.Seq[Float]]("features").toSeq).toSeq)
  }

  test("IVF probe: nprobe=all matches brute force; nprobe=2 recall@10 >= 0.9 " +
    "on a clustered corpus") {
    import graft.functions.VectorFunctions.cosineSim
    import graft.functions.round4
    import graft.operators.Similarity
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 30).flatMap { ci =>
      val center = Array.fill(64)(rnd.nextGaussian().toFloat)
      (0 until 20).map { mi =>
        (ci * 20L + mi, center.map(v => v + rnd.nextGaussian().toFloat * 0.1f))
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    val qvec = rows.head._2
    def ids(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select("vec_id").collect().map(_.getLong(0)).toSeq
    val brute = ids(df
      .withColumn("sim", round4(cosineSim(col("embedding"), typedlit(qvec))))
      .orderBy(desc("sim"), asc("vec_id")).limit(10))
    // probing every cell loses nothing
    assert(ids(Similarity.ivfTopK(df, qvec, 10, nprobe = 64)) == brute)
    // probing 2 of up to 64 cells keeps >= 9 of the true top-10
    val probed = ids(Similarity.ivfTopK(df, qvec, 10, nprobe = 2))
    val overlap = probed.toSet.intersect(brute.toSet).size
    assert(overlap >= 9, s"recall@10 = $overlap/10 at nprobe=2")
  }

  test("multimodal frame sampling bounds frames per asset") {
    val decoded = Multimodal.decodeStage(Multimodal.syntheticAssets(spark, 30))
    val frames = Multimodal.frameSample(decoded, everyK = 10, maxFrames = 3)
    val perAsset = frames.groupBy("asset_id").count().collect()
    assert(perAsset.nonEmpty)
    perAsset.foreach(r => assert(r.getLong(1) <= 3 + 1))
  }

  test("streaming windowed counts finalize with watermark semantics") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val events = Seq(
      (1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
      (2L, ts("2024-01-01 00:04:00"), 2L, "click", 2.0),
      (3L, ts("2024-01-01 00:12:00"), 1L, "view", 3.0),
      (4L, ts("2024-01-01 01:00:00"), 2L, "click", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    events.write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream.schema(StreamingIngest.eventSchema)
      .parquet(s"$tmp/in")
    val q = StreamingIngest.windowedCounts(stream)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table("win_counts").collect()
    // the 01:00 event advances the watermark past the first two windows
    assert(out.exists(r => r.getAs[Long]("n") == 2 &&
      r.getAs[String]("event_type") == "click"),
      s"got ${out.mkString(";")}")
  }

  test("streaming PRECEDED_BY: stream-stream interval self-join links only " +
    "in-band predecessors") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-e1s").toString
    val mems = Seq(
      ("m1", ts("2024-01-01 00:00:00")),
      ("m2", ts("2024-01-01 00:05:00")), // 5 min after m1 -> in band
      ("m3", ts("2024-01-01 00:30:00")), // 25 min after m2 -> out of band
      ("m4", ts("2024-01-01 00:36:00"))) // 6 min after m3 -> in band
      .toDF("id", "ts")
    mems.write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema("id STRING, ts TIMESTAMP").parquet(s"$tmp/in")
    val q = StreamingIngest.precededByStream(stream, bandMinutes = 10)
      .writeStream.format("memory").queryName("preceded_by")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()
    val edges = spark.table("preceded_by").collect()
      .map(r => r.getAs[String]("src") -> r.getAs[String]("dst")).toSet
    assert(edges == Set("m2" -> "m1", "m4" -> "m3"), s"got $edges")
  }

  test("streaming sessionize counts events per user with state") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val events = Seq(
      StreamingIngest.SessionEvent(1L, ts("2024-01-01 00:00:00"), "click"),
      StreamingIngest.SessionEvent(1L, ts("2024-01-01 00:10:00"), "view"),
      StreamingIngest.SessionEvent(2L, ts("2024-01-01 00:05:00"), "click"))
    events.toDF().write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[StreamingIngest.SessionEvent].schema)
      .parquet(s"$tmp/in").as[StreamingIngest.SessionEvent]
    val q = StreamingIngest.sessionize(stream)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()
    val out = spark.table("sessions").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("nEvents")).toMap
    assert(out(1L) == 2 && out(2L) == 1, s"got $out")
  }

  test("streaming dedup drops in-horizon refeeds, keeps distinct content") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val mems = Seq(
      ("m1", "The SAME exact content!", ts("2024-01-01 00:00:00")),
      ("m2", "the same--EXACT (content)", ts("2024-01-01 00:02:00")), // same fp
      ("m3", "something else entirely", ts("2024-01-01 00:03:00")),
      ("m4", "The SAME exact content!", ts("2024-01-01 00:05:00"))) // refeed
      .toDF("id", "content", "ts")
    mems.write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema("id STRING, content STRING, ts TIMESTAMP").parquet(s"$tmp/in")
    val q = StreamingIngest.dedupStream(stream)
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()
    val kept = spark.table("stream_dedup").collect()
      .map(_.getAs[String]("id")).toSet
    // one survivor per fingerprint: m2/m4 normalize to m1's fingerprint
    assert(kept.size == 2 && kept.contains("m3"), s"got $kept")
  }

  test("sessionize timeout closes state and emits the final summary") {
    import org.apache.spark.sql.streaming.TestGroupState
    import StreamingIngest.{SessionEvent, SessionState, sessionStep}
    // data step: state accumulates and a timeout is armed
    val s1 = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.empty(),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    val up1 = sessionStep(7L, Iterator(
      SessionEvent(7L, ts("2024-01-01 00:00:00"), "click"),
      SessionEvent(7L, ts("2024-01-01 00:05:00"), "view")), s1)
    assert(up1.nEvents == 2 && up1.sessionSeconds == 300)
    assert(s1.exists)
    // timeout step (empty iterator): the closing summary is emitted from
    // state — no fabricated epoch-0 timestamps — and the state is removed
    val s2 = TestGroupState.create[SessionState](
      optionalState = org.apache.spark.api.java.Optional.of(s1.get),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = true)
    val up2 = sessionStep(7L, Iterator.empty, s2)
    assert(up2.nEvents == 2 && up2.sessionSeconds == 300,
      s"closing summary must come from state, got $up2")
    assert(s2.isRemoved, "timed-out state must be removed")
  }

  test("streaming hygiene: PII/lang/quality/mixture run stateless on a stream") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-hyg").toString
    Seq(
      (100L, "reach me at jo.doe@example.com about the spark rollout plan",
        "HTTPS://WWW.Site0.COM/a?utm_source=x&ref=1#f"),
      (101L, "el informe de la semana pasada sobre los datos y las tablas",
        "https://ok.com/b?gclid=9"),
      (102L, "plain unremarkable note with no sensitive content at all",
        "https://ok.com/c"))
      .toDF("doc_id", "text", "url")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, url STRING").parquet(s"$tmp/in")
    val q = StreamingIngest.hygieneStream(stream)
      .writeStream.format("memory").queryName("stream_hygiene")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()
    val rows = spark.table("stream_hygiene").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(100L).getAs[String]("redacted").contains("<EMAIL>"))
    assert(!rows(100L).getAs[String]("redacted").contains("example.com"))
    assert(rows(101L).getAs[String]("lang_pred") == "es")
    assert(rows.values.forall(_.getAs[Int]("n_tokens") > 0))
    // URL policy on the stream: canonicalized + blocklist, same
    // expressions as the q_url_canonical batch oracle
    assert(rows(100L).getAs[String]("canonical_url") ==
      "https://www.site0.com/a?ref=1")
    assert(rows(100L).getAs[Boolean]("url_blocked"))
    assert(rows(101L).getAs[String]("canonical_url") == "https://ok.com/b")
    assert(!rows(101L).getAs[Boolean]("url_blocked"))
    // the streaming coin is the same md5 coin the batch oracle gates —
    // flags must agree with the batch expression bit-for-bit
    val batchKeep = StreamingIngest.hygieneStream(
      spark.read.parquet(s"$tmp/in")).select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    rows.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("keep") == batchKeep(id)) }
  }

  test("streaming ingest writes classified memories per micro-batch") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    Seq(("We decided to use spark for analytics", Seq("infra")))
      .toDF("content", "tags")
      .write.mode("overwrite").json(s"$tmp/in")
    val q = StreamingIngest.ingestStream(spark, s"$tmp/in", s"$tmp/out", s"$tmp/cp")
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == 1)
    assert(out.select("type").head().getString(0) == "Decision")
    assert(out.select("embedding").head().getSeq[Float](0).nonEmpty)
  }

  test("ingest upsert keeps the newest row per id (MERGE semantics)") {
    import spark.implicits._
    val t1 = ts("2026-01-01 00:00:00"); val t2 = ts("2026-01-02 00:00:00")
    val existing = Seq(("a", "old content", t1), ("b", "keep", t1))
      .toDF("id", "content", "updated_at")
    val incoming = Seq(("a", "new content", t2), ("c", "created", t2))
      .toDF("id", "content", "updated_at")
    val merged = graft.domain.Ingest.upsert(existing, incoming)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(merged == Map("a" -> "new content", "b" -> "keep", "c" -> "created"))
  }

  test("backup writes a readable parquet snapshot of both relations") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-backup").toString
    val mems = Seq(("a", "x")).toDF("id", "content")
    val edges = Seq(("a", "b", "RELATES_TO")).toDF("src", "dst", "rel_type")
    graft.domain.GraphOps.backup(mems, edges, tmp)
    assert(spark.read.parquet(s"$tmp/memories").count() == 1)
    assert(spark.read.parquet(s"$tmp/edges").count() == 1)
  }

  test("salted join matches plain join results under a hot key") {
    import spark.implicits._
    // hot key: 90% of fact rows share key "hot"
    val fact = ((1 to 90).map(i => ("hot", i)) ++ (1 to 10).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val dim = (Seq("hot") ++ (1 to 10).map(i => s"k$i")).map(k => (k, s"d-$k"))
      .toDF("dkey", "label")
    val salted = graft.operators.Skew.saltedJoin(fact, dim, "key", "dkey", k = 8)
      .select("key", "v", "label").collect().map(_.toSeq).toSet
    val plain = fact.join(dim, fact("key") === dim("dkey"))
      .select("key", "v", "label").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size == 100)
  }

  test("salted count equals plain count per key") {
    import spark.implicits._
    val df = ((1 to 500).map(_ => "hot") ++ Seq("a", "b", "b")).toDF("key")
    val salted = graft.operators.Skew.saltedCount(df, "key", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == Map("hot" -> 500L, "a" -> 1L, "b" -> 2L))
  }
}
