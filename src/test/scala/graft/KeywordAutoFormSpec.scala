package graft

import graft.domain.BatchRecall
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r17 batch keyword-form auto-selection (VERDICT r16 items 1-2): the
  * index persists bounded df stats at build time, and `keywordForm="auto"`
  * routes between the inverted-index form and the one-scan form by the
  * KeywordStageProbe pair-fan-out estimate — picking the measured winner
  * in both regimes, bitwise-unchanged results, and ZERO extra Spark jobs
  * versus hard-coding the chosen form.
  *
  * Measured regimes (tools.KeywordFormProbe, local[32]):
  *  - common-token queries: ratio ≈ 2 pairs/scan-row at BOTH 10⁶ docs
  *    (61.7 vs 23.5 s) and the 500-doc oracle corpus (28.2 vs
  *    21.3 ms/q) — scan wins; the estimate sits far above the 0.5
  *    crossover.
  *  - rare-token queries: ratio ≈ 0 — the index form skips the corpus
  *    scan entirely and wins; the estimate sits far below the crossover.
  */
class KeywordAutoFormSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val now = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")

  /** The KeywordFormProbe corpus shape, small: every doc shares two
    * corpus-wide content tokens + a near-unique id token.
    */
  private def corpus(n: Long): DataFrame = {
    val ts0 = to_timestamp(lit("2026-01-01 00:00:00"))
    spark.range(n).select(
      col("id").cast("string").as("id"),
      concat(lit("scale note number "), (col("id") + 100000).cast("string"),
        lit(" in group "), (col("id") % 16).cast("string")).as("content"),
      ts0.as("timestamp"), ts0.as("t_valid"),
      lit(null).cast("timestamp").as("t_invalid"),
      ts0.as("updated_at"), ts0.as("last_accessed"),
      lit(0.5).as("importance"), lit(0.7).as("confidence"),
      lit("Context").as("type"), array(lit("scale")).as("tags"),
      array(lit("scale")).as("tag_prefixes"), lit("{}").as("metadata"),
      lit(1.0).as("relevance_score"), lit(false).as("archived"),
      lit(false).as("protected_flag"),
      array_repeat(lit(0.1f), 8).as("embedding"))
  }

  private def queriesDf(n: Int, rare: Boolean): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val id = 100000 + (i * 37) % 2000
      (i.toLong, if (rare) s"$id" else s"note number $id")
    }.toDF("qid", "query")
  }

  private def toks(queries: DataFrame): Seq[(Seq[String], Boolean)] =
    queries.collect().map { r =>
      val t = graft.domain.Recall.keywords(r.getString(1))
      (t: Seq[String], t.isEmpty && r.getString(1).toLowerCase.trim.length < 3)
    }.toSeq

  // the inverted-index form is the only producer of a collect_set
  // aggregate in the batch plan — a structural witness of which form the
  // auto route picked
  private def usesIndexForm(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("collect_set")

  private def run(mems: DataFrame, queries: DataFrame,
      idx: Option[BatchRecall.RecallIndex], form: String): DataFrame =
    BatchRecall.batchRecall(mems, spark.emptyDataFrame, queries, limit = 5,
      now = now, index = idx, keywordForm = form)

  test("chooser: common-token fan-out routes to scan, rare-token requests " +
    "route to index, and results are bitwise-identical either way") {
    val mems = corpus(2000).cache()
    mems.count()
    val idx = BatchRecall.buildIndex(mems).cache().materialize()
    val st = idx.kwStats.get
    assert(st.corpusRows == 2000L)
    assert(st.topDf.nonEmpty, "materialize() must collect the df table")
    // the corpus-wide tokens are in the table with full df
    val dfMap = st.topDf.toMap
    assert(dfMap("note") == 2000L && dfMap("number") == 2000L,
      s"common tokens must carry corpus-wide df: ${st.topDf.take(5).toSeq}")

    val common = queriesDf(40, rare = false)
    val rare = queriesDf(40, rare = true)
    assert(BatchRecall.chooseKeywordForm(st, toks(common)) == "scan",
      "corpus-wide shared tokens => pair fan-out >> scan rows => scan")
    assert(BatchRecall.chooseKeywordForm(st, toks(rare)) == "index",
      "near-unique tokens => tiny fan-out, no corpus pass => index")

    // end-to-end: auto picks the chooser's form (structural witness) and
    // all three forms agree bitwise in both regimes
    for ((qs, expectIndex) <- Seq((common, false), (rare, true))) {
      val auto = run(mems, qs, Some(idx), "auto")
      assert(usesIndexForm(auto) == expectIndex,
        s"auto must route to ${if (expectIndex) "index" else "scan"} here")
      val rows = Seq("auto", "index", "scan").map(f =>
        run(mems, qs, Some(idx), f).collect().map(_.toString).sorted.toSeq)
      assert(rows.distinct.size == 1,
        "the forms must produce bitwise-identical results")
    }
    idx.unpersist(); mems.unpersist()
  }

  test("tail matching mass (r18, ADVICE r17): a token contained in many " +
    "below-topK tokens charges its sampled fan-out, not one tailDf") {
    // hand-built stats: top table of 2 irrelevant tokens; tail of 10_000
    // tokens / 50_000 postings, sampled at 4 tokens of which 2 contain
    // the query token -> charge max(tailDf, 0.5 x 50_000) = 25_000
    val st = BatchRecall.KeywordStats(corpusRows = 100000L,
      topDf = Array(("alpha", 500L), ("beta", 400L)), tailDf = 5L,
      tailTokens = 10000L, tailPostings = 50000L,
      tailSample = Array("u00017", "u99917", "zzz", "qqq"))
    val est = BatchRecall.estimateKeywordPairs(st, Seq((Seq("17"), false)))
    assert(est == 25000L, s"sampled tail mass: got $est, want 25000")
    // floor: a token matching NO sampled tail token keeps the old
    // single-token tailDf allowance
    val estFloor =
      BatchRecall.estimateKeywordPairs(st, Seq((Seq("alph"), false)))
    assert(estFloor == 5L + 500L, s"floor + top match: got $estFloor")
    // sample-less stats (old index layout / no tail) behave exactly as r17
    val stOld = BatchRecall.KeywordStats(100000L,
      Array(("alpha", 500L)), tailDf = 7L)
    assert(BatchRecall.estimateKeywordPairs(stOld,
      Seq((Seq("nomatch"), false))) == 7L)
    // and collectStats populates the tail fields on a long-tail corpus
    val mems = corpus(3000).cache() // 3000 unique id tokens > DfTopK=2048
    mems.count()
    val idx = BatchRecall.buildIndex(mems).cache().materialize()
    val stats = idx.kwStats.get
    assert(stats.tailTokens > 0 && stats.tailPostings > 0 &&
      stats.tailSample.nonEmpty,
      s"long-tail corpus must populate tail stats: $stats")
    assert(stats.tailSample.length <= BatchRecall.TailSampleK)
    // deterministic: a rebuild collects the identical sample
    val stats2 = BatchRecall.buildIndex(mems).cache().materialize().kwStats.get
    assert(stats.tailSample.toSeq == stats2.tailSample.toSeq,
      "hash-ordered tail sample must be deterministic")
    idx.unpersist(); mems.unpersist()
  }

  test("a stats-less ad-hoc index keeps the r16 default (index form): the " +
    "oracle path q_batch_recall_100q is plan-identical") {
    val mems = corpus(500).cache()
    mems.count()
    val idx = BatchRecall.buildIndex(mems).cache() // no materialize: no stats
    assert(idx.kwStats.isEmpty)
    val auto = run(mems, queriesDf(20, rare = false), Some(idx), "auto")
    assert(usesIndexForm(auto), "no stats => keep the measured default")
    idx.unpersist(); mems.unpersist()
  }

  test("auto adds ZERO Spark jobs vs hard-coding the form it picked — the " +
    "estimate is driver arithmetic over build-time stats") {
    val mems = corpus(2000).cache()
    mems.count()
    val idx = BatchRecall.buildIndex(mems).cache().materialize()
    // count ONLY jobs carrying this test's job group (ADVICE r17): a
    // session-global onJobStart counter would also count any concurrent
    // suite's jobs on the shared test session — flaky under parallel
    // test execution. The group id is set around each counted run.
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val groupId = s"kw-auto-form-${System.nanoTime()}"
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (groupId == j.properties.getProperty("spark.jobGroup.id"))
          counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    def jobsOf(form: String, qs: DataFrame): Int = {
      // one untimed run first: AQE plans differently on first execution
      // of a shape only when statistics change, but broadcast warm-up
      // jobs would otherwise differ between the first and second caller
      run(mems, qs, Some(idx), form).collect()
      org.apache.spark.sql.graftshim.GraftShim.drainListenerBus(spark)
      counter.set(0)
      spark.sparkContext.setJobGroup(groupId, "counted keyword-form run")
      try run(mems, qs, Some(idx), form).collect()
      finally spark.sparkContext.clearJobGroup()
      org.apache.spark.sql.graftshim.GraftShim.drainListenerBus(spark)
      counter.get()
    }
    try {
      val common = queriesDf(40, rare = false)
      val rare = queriesDf(40, rare = true)
      // auto picks scan on the common corpus, index on the rare one
      assert(jobsOf("auto", common) == jobsOf("scan", common),
        "auto(=scan) must schedule exactly the hard-coded scan's jobs")
      assert(jobsOf("auto", rare) == jobsOf("index", rare),
        "auto(=index) must schedule exactly the hard-coded index's jobs")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      idx.unpersist(); mems.unpersist()
    }
  }
}
