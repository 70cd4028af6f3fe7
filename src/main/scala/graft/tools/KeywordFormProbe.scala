package graft.tools

import graft.domain.BatchRecall
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the batch keyword channel's two forms at a million rows (r16,
  * follow-up to `KeywordStageProbe`): the inverted-index form (pair
  * materialization — the measured common-token fan-out) vs the one-scan
  * expression form (`kwSingle`, qid-generic, no pairs), end-to-end through
  * the FULL batch plan, interleaved, with a bitwise result compare.
  *
  * Run: `sbt "runMain graft.tools.KeywordFormProbe [nDocs] [nQueries]"`
  * — or `KeywordFormProbe /root/testdata/sf0.01` for the ORACLE corpus
  * (the exact q_batch_recall_100q inputs), which measures the crossover's
  * other side: the regime where the index form should win and `auto`
  * must keep it.
  */
object KeywordFormProbe {

  /** Crossover sweep (r18, VERDICT r17 item 6): the 0.5 pairs-per-scan-row
    * crossover was pinned from two regimes measured FAR from the boundary
    * (ratios ~2.0 and ~0.0). This arm generates corpora whose estimated
    * ratio lands ON the 0.2–1.0 range — a shared 4-char token carried by a
    * tunable fraction p of docs (ratio ≈ p: fan-out = p·n·nq pairs over
    * n·nq scan rows) plus one fixed-width unique token per doc (equal
    * length, so no substring cross-matching) — and measures both forms
    * end-to-end at each point, bitwise-compared. Run:
    * `sbt "runMain graft.tools.KeywordFormProbe sweep [nDocs] [nQueries]"`
    */
  private def runSweep(spark: SparkSession, n: Long, nq: Int): Unit = {
    import spark.implicits._
    val ts0 = to_timestamp(lit("2026-01-01 00:00:00"))
    def corpus(pMille: Int) = spark.range(n).select(
      col("id").cast("string").as("id"),
      concat(lit("doc "),
        when(pmod(col("id"), lit(1000)) < pMille, lit("shpt "))
          .otherwise(lit("")),
        format_string("u%08d", col("id"))).as("content"),
      ts0.as("timestamp"), ts0.as("t_valid"),
      lit(null).cast("timestamp").as("t_invalid"),
      ts0.as("updated_at"), ts0.as("last_accessed"),
      lit(0.5).as("importance"), lit(0.7).as("confidence"),
      lit("Context").as("type"), array(lit("scale")).as("tags"),
      array(lit("scale")).as("tag_prefixes"), lit("{}").as("metadata"),
      lit(1.0).as("relevance_score"), lit(false).as("archived"),
      lit(false).as("protected_flag"),
      array_repeat(lit(0.1f), 8).as("embedding"))
    // every query carries the shared token + one real unique token
    val queries = (0 until nq).map { i =>
      val id = (i.toLong * 9973) % n
      (i.toLong, f"shpt u$id%08d")
    }.toDF("qid", "query").cache()
    queries.count()
    val now = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
    println(f"[sweep] n=$n%,d docs x $nq queries; crossover constant = " +
      f"${BatchRecall.KeywordScanCrossover}")
    println("[sweep]  p_shared  est_ratio  auto   index_s   scan_s  winner")
    val points = sys.env.get("GRAFT_SWEEP_PMILLE")
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(200, 350, 500, 650, 800, 1000))
    for (pMille <- points) {
      val mems = corpus(pMille).repartition(32).cache()
      mems.count()
      val idx = BatchRecall.buildIndex(mems).cache().materialize()
      val st = idx.kwStats.get
      val toks = queries.collect().map { r =>
        val t = graft.domain.Recall.keywords(r.getString(1))
        (t: Seq[String], false)
      }.toSeq
      val ratio = BatchRecall.estimateKeywordPairs(st, toks).toDouble /
        (st.corpusRows * nq)
      val auto = BatchRecall.chooseKeywordForm(st, toks)
      def run(form: String): (Double, Seq[String]) = {
        val t = System.nanoTime()
        val rows = BatchRecall.batchRecall(mems, spark.emptyDataFrame,
          queries, limit = 5, now = now, index = Some(idx),
          keywordForm = form).collect()
        ((System.nanoTime() - t) / 1e9, rows.map(_.toString).sorted.toSeq)
      }
      run("index"); run("scan") // warm codegen for both shapes
      // interleaved 2x each; best-of to shed one-off phase noise
      val samples = (1 to 2).map(_ => (run("index"), run("scan")))
      val idxS = samples.map(_._1._1).min
      val scanS = samples.map(_._2._1).min
      val equal = samples.forall(s => s._1._2 == s._2._2)
      require(equal, "sweep: forms must stay bitwise-equal")
      val winner = if (idxS < scanS) "index" else "scan"
      println(f"[sweep]     ${pMille / 1000.0}%.2f      $ratio%6.3f  " +
        f"$auto%-5s  $idxS%7.2f  $scanS%7.2f  $winner%-5s" +
        (if ((winner == "scan") != (auto == "scan")) "  <-- auto differs"
         else ""))
      idx.unpersist(); mems.unpersist()
    }
    queries.unpersist()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("sweep")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      spark.range(1000000L).selectExpr("sum(id)").collect()
      runSweep(spark,
        args.drop(1).headOption.map(_.toLong).getOrElse(200000L),
        args.drop(2).headOption.map(_.toInt).getOrElse(100))
      spark.stop()
      return
    }
    val oracleDir = args.headOption.filter(_.contains("/"))
    val n = if (oracleDir.isDefined) 0L
      else args.headOption.map(_.toLong).getOrElse(1000000L)
    val nqArg = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    import spark.implicits._
    val ts0 = to_timestamp(lit("2026-01-01 00:00:00"))
    val (mems, queries) = oracleDir match {
      case Some(dir) =>
        val (m, q) = graft.operators.RecallPipeline
          .batchRecall100Inputs(spark, dir)
        (m, q.select(col("qid"), col("query")))
      case None =>
        val m = spark.range(n).select(
          col("id").cast("string").as("id"),
          concat(lit("scale note number "), col("id").cast("string"),
            lit(" in group "), (col("id") % 64).cast("string")).as("content"),
          ts0.as("timestamp"), ts0.as("t_valid"),
          lit(null).cast("timestamp").as("t_invalid"),
          ts0.as("updated_at"), ts0.as("last_accessed"),
          lit(0.5).as("importance"), lit(0.7).as("confidence"),
          lit("Context").as("type"), array(lit("scale")).as("tags"),
          array(lit("scale")).as("tag_prefixes"), lit("{}").as("metadata"),
          lit(1.0).as("relevance_score"), lit(false).as("archived"),
          lit(false).as("protected_flag"),
          array_repeat(lit(0.1f), 8).as("embedding"))
          .repartition(32).cache()
        // query shape (3rd arg): "common" = every query shares the two
        // corpus-wide tokens (the measured fan-out case); "rare" = each
        // query is ONE near-unique id token (the regime where the
        // inverted index should win — tiny pair fan-out, no corpus scan)
        val rare = args.drop(2).headOption.contains("rare")
        val q = (0 until nqArg).map { i =>
          val id = (100000L + i.toLong * 9973) % math.max(n, 200000L)
          (i.toLong, if (rare) s"$id" else s"note number $id")
        }.toDF("qid", "query")
        (m, q)
    }
    // ms/q divides by the ACTUAL query count (ADVICE r17): in oracle mode
    // the query set size is fixed by the corpus, and a stray second CLI
    // argument used to silently skew the printed per-query figure
    val nq = queries.count().toInt
    println(s"corpus rows = ${mems.count()}")
    val idx = BatchRecall.buildIndex(mems).cache().materialize()
    val now = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")

    // the r17 auto chooser's own view of this corpus: estimate from the
    // persisted stats (materialize() collected them) vs the scan rows
    val st = idx.kwStats.get
    val toks = queries.collect().map { r =>
      val t = graft.domain.Recall.keywords(r.getString(1))
      (t: Seq[String], t.isEmpty && r.getString(1).trim.length < 3)
    }.toSeq
    val est = BatchRecall.estimateKeywordPairs(st, toks)
    val scanRows = st.corpusRows * toks.count(!_._2)
    println(f"[kwform] est pairs = $est%,d, scan rows = $scanRows%,d, " +
      f"ratio = ${est.toDouble / scanRows}%.3f -> auto picks " +
      s"${BatchRecall.chooseKeywordForm(st, toks)}")

    def run(form: String): (Double, Seq[String]) = {
      val t = System.nanoTime()
      val rows = BatchRecall.batchRecall(mems, spark.emptyDataFrame, queries,
        limit = 5, now = now, index = Some(idx), keywordForm = form)
        .collect()
      ((System.nanoTime() - t) / 1e9, rows.map(_.toString).sorted.toSeq)
    }
    val forms = Seq("index", "scan", "auto")
    run("index"); run("scan") // warm
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    var results = Map[String, Seq[String]]()
    for (_ <- 1 to 2; form <- forms) {
      val (secs, rows) = run(form)
      times(form) = secs :: times(form)
      results += form -> rows
    }
    forms.foreach { f =>
      println(f"[kwform] $f%-6s best ${times(f).min}%6.1f s " +
        f"(${times(f).min * 1000 / nq}%6.1f ms/q)")
    }
    val same = forms.map(results(_)).distinct.size == 1
    println(s"[kwform] bitwise equal results: $same " +
      s"(${results("index").size} rows)")
    require(same, "all keyword forms must produce identical results")
    mems.unpersist(); idx.unpersist()
    spark.stop()
  }
}
