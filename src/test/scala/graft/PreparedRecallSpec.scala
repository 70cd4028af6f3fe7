package graft

import java.sql.Timestamp

import graft.domain._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Prepared (plan-reuse) recall serving: the cached analyzed template +
  * per-request LocalRelation swap must return exactly what the ad-hoc
  * single-query path returns, for every request class (keyword, trending),
  * across successive different requests, and must release its cached index
  * on close().
  */
class PreparedRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  val now: Timestamp = ts("2026-01-10 00:00:00")

  def mem(id: String, content: String, t: String, tags: Seq[String] = Nil,
      typ: String = "Context", importance: Double = 0.5,
      metadata: String = "{}"): Memory = {
    val tstamp = ts(t)
    Memory(id, content, tstamp, tstamp, None, tstamp, tstamp, importance, 0.7,
      typ, tags.map(_.toLowerCase), Nil, metadata, None, enriched = false,
      processed = false, 1.0, archived = false, protected_flag = false,
      PlaceholderEmbedding.embed(content))
  }

  lazy val memories = {
    import spark.implicits._
    Seq(
      mem("m1", "We decided to use postgres for the main database",
        "2026-01-01 10:00:00", Seq("database"), "Decision", 0.9,
        metadata = """{"project": "alpha"}"""),
      mem("m2", "postgres connection pooling pattern with pgbouncer",
        "2026-01-02 10:00:00", Seq("database"), "Pattern", 0.6),
      mem("m3", "I prefer dark mode editors", "2026-01-03 10:00:00",
        Seq("preferences"), "Preference", 0.4),
      mem("m4", "Sprint planning notes for project alpha",
        "2026-01-07 10:00:00", Seq("project:alpha"), "Context", 0.5),
      mem("m5", "Old decision: use mysql for storage", "2025-12-01 10:00:00",
        Seq("database"), "Decision", 0.7)).toDF()
  }

  def single(q: String): Seq[(String, Double)] = {
    import spark.implicits._
    Recall.recall(memories, Seq.empty[Edge].toDF(),
      RecallRequest(query = Some(q), limit = 5, now = now))
      .select("id", "final_score").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
  }

  test("prepared recall matches the single-query path across successive " +
    "different requests, including the trending class") {
    import spark.implicits._
    val prepared = new PreparedRecall(memories, Seq.empty[Edge].toDF(),
      limit = 5, now = now)
    try {
      // different request per call — each must re-plant the swapped
      // relation, not serve the previous request's plan data
      // "project alpha" hits m1's metadata sidecar (Q5, strong-evidence
      // score 1.0): the SERIAL parity case for the batch metadata channel
      // (VERDICT r8 item 2)
      for (q <- Seq("postgres database", "dark mode editors", "project",
          "project alpha", "*", "postgres database")) {
        val got = prepared.recall(q)
          .orderBy(asc("rank")).select("id", "final_score").collect()
          .map(r => (r.getString(0), r.getDouble(1))).toSeq
        val want = single(q)
        assert(got.map(_._1) == want.map(_._1),
          s"query '$q': ids ${got.map(_._1)} vs ${want.map(_._1)}")
        got.zip(want).foreach { case ((_, gs), (_, ws)) =>
          assert(math.abs(gs - ws) < 1e-9, s"query '$q': score $gs vs $ws")
        }
      }
    } finally prepared.close()
  }

  test("every reachable serve class is pre-built at prepare time — no " +
    "first-query lazy build (r13)") {
    import spark.implicits._
    val prepared = new PreparedRecall(memories, Seq.empty[Edge].toDF(),
      limit = 5, now = now)
    try {
      // one representative query per class, none equal to the prepare
      // markers; "unbuilt" would mean a lazy build still waits on the
      // first request of that class
      for (q <- Seq("postgres database", "memory memories", "for the",
          "ml the", "", "ml")) {
        val diag = prepared.fastPathDiagnosis(q)
        assert(diag != "unbuilt",
          s"class of '$q' must be pre-built at prepare time, got: $diag")
      }
    } finally prepared.close()
  }

  test("prepared recall accepts a caller-supplied query vector") {
    import spark.implicits._
    val prepared = new PreparedRecall(memories, Seq.empty[Edge].toDF(),
      limit = 5, now = now)
    try {
      val q = "postgres database"
      val got = prepared.recall(q,
        qvec = Some(PlaceholderEmbedding.embed(q)))
        .orderBy(asc("rank")).select("id").collect().map(_.getString(0)).toSeq
      assert(got == single(q).map(_._1))
    } finally prepared.close()
  }

  test("one handle serves 8 concurrent threads with per-thread parity " +
    "(VERDICT r7 item 5)") {
    import spark.implicits._
    val prepared = new PreparedRecall(memories, Seq.empty[Edge].toDF(),
      limit = 5, now = now)
    try {
      // distinct query per thread, covering keyword, multi-token, and the
      // trending class; expectations computed on the single path up front
      val queries = Seq("postgres database", "dark mode editors",
        "project alpha", "connection pooling", "mysql storage",
        "sprint planning notes", "postgres pooling pattern", "*")
      val want = queries.map(q => q -> single(q)).toMap
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      try {
        val tasks = for (q <- queries; round <- 1 to 3) yield {
          pool.submit(new Runnable {
            override def run(): Unit = try {
              val got = prepared.recall(q)
                .orderBy(asc("rank")).select("id", "final_score").collect()
                .map(r => (r.getString(0), r.getDouble(1))).toSeq
              if (got.map(_._1) != want(q).map(_._1))
                failures.add(s"'$q' round $round: ids ${got.map(_._1)} " +
                  s"vs ${want(q).map(_._1)}")
              else got.zip(want(q)).foreach { case ((_, gs), (_, ws)) =>
                if (math.abs(gs - ws) >= 1e-9)
                  failures.add(s"'$q' round $round: score $gs vs $ws")
              }
            } catch {
              case e: Throwable => failures.add(s"'$q' round $round threw: $e")
            }
          })
        }
        tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdownNow()
      assert(failures.isEmpty,
        s"concurrent serving diverged:\n${failures.toArray.mkString("\n")}")
    } finally prepared.close()
  }

  test("r11 fast path: evidence gate enables, serves keyword classes, " +
    "declines template-absent classes to the replanned fallback") {
    import spark.implicits._
    val prepared = new PreparedRecall(memories, Seq.empty[Edge].toDF(),
      limit = 5, now = now)
    try {
      assert(prepared.fastPathEnabled,
        s"fast path should enable on this corpus: ${prepared.fastPathDiagnosis}")
      // keyword-class queries serve FAST and match the replanned path
      for (q <- Seq("postgres database", "dark mode editors", "mysql")) {
        val fast = prepared.fastRecall(q)
        assert(fast.isDefined, s"fast path must serve keyword query '$q'")
        val f = fast.get.orderBy(asc("rank")).collect().map(_.toString).toSeq
        val r = prepared.recallReplanned(q).orderBy(asc("rank"))
          .collect().map(_.toString).toSeq
        assert(f == r, s"fast/replanned divergence on '$q'")
      }
      // the trending class activates a channel the keyword-marker template
      // does not contain — it gets its OWN lazily-built class template on
      // first use and must then serve fast with replanned parity (empty
      // query and wildcard are the same class and share it)
      for (q <- Seq("*", "")) {
        val fast = prepared.fastRecall(q)
        assert(fast.isDefined,
          s"trending-class '$q' must serve off its class template: " +
            prepared.fastPathDiagnosis)
        val f = fast.get.orderBy(asc("rank")).collect().map(_.toString).toSeq
        val r = prepared.recallReplanned(q).orderBy(asc("rank"))
          .collect().map(_.toString).toSeq
        assert(f == r && f.nonEmpty, s"trending parity on '$q'")
      }
      // stopword-only (phrase-branch) class likewise
      val ph = prepared.fastRecall("the of and a")
      assert(ph.isDefined, s"phrase-class must serve: ${prepared.fastPathDiagnosis}")
      assert(ph.get.orderBy(asc("rank")).collect().map(_.toString).toSeq ==
        prepared.recallReplanned("the of and a").orderBy(asc("rank"))
          .collect().map(_.toString).toSeq)
      // a caller-supplied qvec is a knob the template was not built with —
      // recall() must route it to the replanned path (and stay correct)
      val qvec = PlaceholderEmbedding.embed("postgres database")
      val viaKnob = prepared.recall("postgres database", Some(qvec))
        .orderBy(asc("rank")).collect().map(_.toString).toSeq
      val viaKnobReplanned = prepared
        .recallReplanned("postgres database", Some(qvec))
        .orderBy(asc("rank")).collect().map(_.toString).toSeq
      assert(viaKnob == viaKnobReplanned && viaKnob.nonEmpty)
    } finally prepared.close()
  }

  test("r12 ADVICE: template builds never mutate the session conf, and " +
    "the gate diagnosis is keyed per serve class") {
    import spark.implicits._
    // the r11 idiom toggled session-global AQE off during each (lazy!)
    // class build and restored it in a finally — two concurrent builds
    // could capture each other's temporary "false" and leave AQE off for
    // the whole session. The fix plans under a cloned session; pin the
    // observable contract: the shared conf is bit-identical across eager
    // AND lazy builds, even when builds run concurrently.
    val key = "spark.sql.adaptive.enabled"
    spark.conf.set(key, "true")
    val prepared = new PreparedRecall(memories, Seq.empty[Edge].toDF(),
      limit = 5, now = now)
    try {
      assert(spark.conf.get(key) == "true",
        "eager keyword-class build mutated the session conf")
      // race two lazy first-builds of DIFFERENT classes (trending and
      // phrase-only) — the r11 idiom fails this nondeterministically;
      // the cloned-session build cannot
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val tasks = Seq("", "the of and a").map { q =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = { prepared.fastRecall(q); () }
          })
        }
        tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdownNow()
      assert(spark.conf.get(key) == "true",
        "a lazy class build mutated (or failed to isolate) the session conf")
      // per-class diagnosis: each class reports ITS OWN gate outcome,
      // not whichever class built last
      assert(prepared.fastPathDiagnosis("postgres db").startsWith("enabled"),
        s"keyword class: ${prepared.fastPathDiagnosis("postgres db")}")
      assert(prepared.fastPathDiagnosis("").startsWith("enabled"),
        s"trending class: ${prepared.fastPathDiagnosis("")}")
      assert(prepared.fastPathDiagnosis("the of and a").startsWith("enabled"),
        s"phrase class: ${prepared.fastPathDiagnosis("the of and a")}")
    } finally prepared.close()
  }

  test("close() releases the cached index relations") {
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    val prepared = new PreparedRecall(memories, Seq.empty[Edge].toDF(),
      limit = 5, now = now)
    prepared.recall("postgres database").collect()
    assert(!spark.sharedState.cacheManager.isEmpty,
      "the prepared index must be cached while serving")
    prepared.close()
    assert(spark.sharedState.cacheManager.isEmpty,
      "close() must unpersist every index relation")
  }
}
