package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measured scale evidence for the training-data pipeline operators (the
  * ScaleProbe discipline from round 3, applied to this round's additions):
  * synthesize corpora of growing size with PLANTED duplicate structure, run
  * each operator warm, and print per-size timings so linearity is a
  * recorded fact rather than a plan-shape argument.
  *
  * Synthetic corpus (fully deterministic, generated distributed via
  * `spark.range` — the driver never materializes rows):
  *  - documents: ~40-word word-soup from a small vocabulary keyed by a
  *    64-bit mix of (id, position); every 10th doc repeats one phrase so
  *    repetition signals vary.
  *  - embeddings: 64-dim unit-ish vectors; 10% of docs are jittered copies
  *    of a base vector (id % 7 buckets) so the near-dup graph has real
  *    clusters of bounded size.
  *
  * Run: `sbt "runMain graft.tools.PipelineScaleProbe [sizes...]"`
  */
object PipelineScaleProbe {

  private def mix(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    abs(xxhash64(c))

  def syntheticDocs(spark: SparkSession, n: Long): DataFrame = {
    val vocab = Seq("pipeline", "review", "standup", "retro", "incident",
      "migration", "rollout", "oncall", "postmortem", "planning", "shuffle",
      "broadcast", "partition", "executor", "catalyst", "codegen")
    val vocabCol = array(vocab.map(lit): _*)
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(p =>
        // every 10th doc collapses to a 4-word cycle -> high repetition
        element_at(vocabCol,
          (mix(col("id") * 41 + p) % when(col("id") % 10 === 0, 4)
            .otherwise(vocab.size)).cast("int") + 1)): _*).as("text"))
  }

  def syntheticVectors(spark: SparkSession, n: Long, dim: Int = 64): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        // 10% of ids share a per-(id%7) base vector with tiny jitter ->
        // planted near-dup clusters; the rest are hash-isotropic
        val base = (mix(col("id") % 7 * 131 + i) % 2000 - 1000).cast("float") / 1000f
        val noise = (mix(col("id") * 257 + i) % 2000 - 1000).cast("float") / 1000f
        when(col("id") % 10 === 0, base + noise / lit(50f)).otherwise(noise)
      }).as("embedding"))

  /** Longer docs (150 tokens) with a PLANTED duplicated run: every 10th
    * doc carries the same fixed 70-token sequence at positions 20-89, so
    * the paper-point exact-substring pass (n = 50) has real >= 50-token
    * duplicate spans to find; all other positions are hash-unique word
    * soup (a 16-word vocabulary makes accidental 50-gram collisions
    * impossible in practice, 16^-50).
    */
  def syntheticLongDocs(spark: SparkSession, n: Long): DataFrame = {
    val vocab = Seq("pipeline", "review", "standup", "retro", "incident",
      "migration", "rollout", "oncall", "postmortem", "planning", "shuffle",
      "broadcast", "partition", "executor", "catalyst", "codegen")
    val vocabCol = array(vocab.map(lit): _*)
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 150).map { p =>
        val rand = element_at(vocabCol,
          (mix(col("id") * 41 + p) % vocab.size).cast("int") + 1)
        if (p >= 20 && p < 90)
          when(col("id") % 10 === 0, element_at(vocabCol,
            (mix(lit(p * 17 + 3)) % vocab.size).cast("int") + 1))
            .otherwise(rand)
        else rand
      }: _*).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(10000L, 50000L, 100000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      f // warm-up run (codegen)
      val t0 = System.nanoTime()
      val rows = f
      println(f"[pipescale] $label ${(System.nanoTime() - t0) / 1e9}%7.2f s ($rows rows)")
    }

    for (n <- sizes) {
      val docs = syntheticDocs(spark, n).cache(); docs.count()
      val vecs = syntheticVectors(spark, n).cache(); vecs.count()
      time(s"repetition  n=$n") {
        graft.operators.TextPolicy.repetitionSignals(docs).count()
      }
      time(s"semanticdup n=$n") {
        graft.operators.Dedup.semanticDedup(vecs, threshold = 0.9).count()
      }
      time(s"bm25        n=$n") {
        graft.operators.TextSearch
          .bm25TopK(docs, "text", "doc_id", Seq("catalyst", "shuffle", "codegen"), 10)
          .count()
      }
      time(s"boilerplate n=$n") {
        graft.operators.TextPolicy.boilerplateFlags(docs, 3, 15, 0.5).count()
      }
      time(s"perplexity  n=$n") {
        graft.operators.TextPolicy.perplexityScores(docs, vocab = 12).count()
      }
      val langDocs = docs.withColumn("lang",
        when(col("doc_id") % 3 === 0, "zh").otherwise("en"))
      time(s"dsir        n=$n") {
        graft.operators.TextAnalysis
          .dsirWeights(langDocs, buckets = 64, targetLang = "en").count()
      }
      // random multigraph: n edges over n/10 nodes, avg degree ~10
      val edges = spark.range(n).select(
        concat(lit("n"), (mix(col("id") * 13) % (n / 10)).cast("string")).as("src"),
        concat(lit("n"), (mix(col("id") * 29 + 7) % (n / 10)).cast("string")).as("dst"))
      time(s"pagerank3   n=$n") {
        graft.operators.GraphAnalytics
          .pageRank(edges, iters = 3, damping = 0.85, topK = 30).count()
      }
      time(s"lpa2        n=$n") {
        graft.operators.GraphAnalytics.labelPropagation(edges
          .select(col("src").as("u"), col("dst").as("v")), iters = 2).count()
      }
      time(s"kmeans8x2   n=$n") {
        graft.operators.KMeans.fit(vecs, k = 8, iters = 2).count()
      }
      time(s"pca_cov     n=$n") {
        graft.operators.Pca.covariance(vecs).count()
      }
      time(s"pca_covfast n=$n") {
        graft.operators.Pca.covarianceFast(vecs).count()
      }
      val srcDocs = docs.withColumn("source",
        concat(lit("s"), (col("doc_id") % 5).cast("string")))
      time(s"seq_chunks  n=$n") {
        graft.operators.TextAnalysis.sequenceChunks(srcDocs, ctx = 256L).count()
      }
      // NB quality classifier (r12): one explode pass consumed twice via
      // exchange reuse + a vocabulary-sized weight join — linear in corpus
      time(s"quality_clf n=$n") {
        graft.operators.TextPolicy
          .qualityClassifier(srcDocs, Seq("s0", "s1"), 9.0).count()
      }
      // feature-hashed at-scale form (r12 VERDICT item 4): bounded 4096-row
      // weight table (always broadcastable) vs the unbounded-vocabulary
      // exact form above
      time(s"quality_clf_h4096 n=$n") {
        graft.operators.TextPolicy
          .qualityClassifierHashed(srcDocs, Seq("s0", "s1"), 9.0, 4096)
          .count()
      }
      time(s"unimax      n=$n") {
        graft.operators.TextAnalysis
          .unimaxMix(srcDocs, budgetTokens = n, maxEpochsMicro = 800000L)
          .count()
      }
      // r14: CCNet-shaped bigram-LM apply (train on a bounded 10% slice,
      // score the whole corpus) and rank-based classifier AUC — both must
      // stay linear in corpus
      time(s"bigram_lm   n=$n") {
        val lm = graft.operators.TextPolicy
          .bigramLmTrain(docs.filter(col("doc_id") % 10 === 0))
        graft.operators.TextPolicy.bigramPerplexity(docs, lm).count()
      }
      time(s"clf_auc     n=$n") {
        graft.operators.TextPolicy
          .classifierAuc(srcDocs, Seq("s0", "s1"), 9.0).count()
      }
      // r13 additions: overlap matrix / KL grid / novelty / weighted
      // sample / zipf head-fit — all must stay linear in corpus
      time(s"src_overlap n=$n") {
        graft.operators.TextAnalysis.sourceOverlap(
          srcDocs.withColumn("doc_id", col("doc_id"))).count()
      }
      time(s"src_kl      n=$n") {
        graft.operators.TextAnalysis.sourceDivergence(srcDocs).count()
      }
      time(s"novelty     n=$n") {
        graft.operators.TextAnalysis.ngramNovelty(docs).count()
      }
      time(s"wsample     n=$n") {
        graft.operators.TextAnalysis.weightedSample(
          srcDocs.withColumn("w",
            (pmod(col("doc_id"), lit(7)) + 1).cast("double")), 10).count()
      }
      time(s"zipf        n=$n") {
        graft.operators.TextAnalysis.zipfSlope(srcDocs, 50).count()
      }
      // exact-substring at the PAPER's n=50 (VERDICT r11 item 3): hashed
      // vs literal-string gram on 150-token docs with planted 70-token
      // duplicate runs — the hashed form's dominant shuffle carries 8
      // bytes per position where the string form carries ~300
      val longDocs = syntheticLongDocs(spark, n).cache(); longDocs.count()
      time(s"xsubstr50h  n=$n") {
        graft.operators.Dedup.substringDupSpansPaper(longDocs).count()
      }
      time(s"xsubstr50s  n=$n") {
        graft.operators.Dedup
          .substringDupSpansDf(longDocs, n = 50, hashed = false).count()
      }
      // the APPLY step (r13): cut the duplicated runs, keep-first —
      // hashed detection + span explosion + per-doc rebuild
      time(s"xsubapply50 n=$n") {
        graft.operators.Dedup
          .substringDedupApplyDf(longDocs, n = 50, hashed = true).count()
      }
      // per-source dup-rate over the PAPER-point (hashed n=50) span frame
      // (r13 VERDICT item 4): the promised 100 TB composition as code —
      // detector output feeds the two-frame aggregation overload
      time(s"duprate50h  n=$n") {
        graft.operators.Dedup.dupRateBySource(
          graft.operators.Dedup.substringDupSpansPaper(longDocs),
          longDocs.withColumn("source",
            concat(lit("s"), (col("doc_id") % 5).cast("string")))).count()
      }
      longDocs.unpersist()
      docs.unpersist(); vecs.unpersist()
    }

    // --- mega-family skew arm (r12 VERDICT item 1) -----------------------
    // One planted family of 100k+1 twins (star pair graph: doc 0 paired
    // with 1..n — the boilerplate shape LSH dedup meets on web crawls),
    // run through the REAL family stage (Dedup.familiesFromPairs), with
    // per-stage task skew printed. A/B: the old count().over(
    // partitionBy(component)) form funnels every row of the family through
    // ONE task (max/mean read ratio ~= numPartitions); the shipped
    // groupBy+join form pre-combines per partition, so no stage reads the
    // family on a single task.
    {
      import org.apache.spark.sql.expressions.Window
      val n = 100000L
      // AQE off for this arm ONLY: at probe scale (100k narrow rows) AQE
      // coalesces every exchange to one task, hiding the skew signature
      // this arm exists to expose; a 10^8-row family at 100 TB is NOT
      // coalesced, so the static 32-partition plan is the faithful shape.
      val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val pairs = spark.range(1L, n + 1).select(
        lit(0L).as("src"), col("id").as("dst"))
        .unionByName(spark.range(1L, n, 97).select( // sparse extra edges
          col("id").as("src"), (col("id") + 1).as("dst")))
        .repartition(32).cache()
      pairs.count()
      val skew = new SkewListener
      spark.sparkContext.addSparkListener(skew)
      def runAndReport(label: String)(f: => Long): Unit = {
        skew.reset()
        val t0 = System.nanoTime()
        val rows = f
        Thread.sleep(1000) // let the listener bus drain task-end events
        val worst = skew.worstStages(6)
        println(f"[pipescale] $label ${(System.nanoTime() - t0) / 1e9}%7.2f s ($rows rows)")
        worst.foreach { case (sid, name, nT, maxR, meanR) =>
          println(f"[pipescale]   $label stage=$sid [$name] tasks=$nT maxReadRec=$maxR meanReadRec=$meanR%.0f skew=${maxR / math.max(meanR, 1.0)}%.1fx")
        }
      }
      // force the family_size computation with sum(family_size): a bare
      // count() lets ColumnPruning delete the unused Window (and would
      // A/B an empty stage against a real one)
      def groupbyForm(): Long = graft.operators.Dedup.familiesFromPairs(pairs)
        .select(sum(col("family_size"))).collect().head.getLong(0)
      def windowForm(): Long = {
        // the pre-r13 shape, kept here ONLY as the skew baseline
        val vertices = pairs.select(col("src").as("id"))
          .unionByName(pairs.select(col("dst").as("id"))).distinct()
        graft.domain.Consolidation.connectedComponents(vertices, pairs)
          .withColumn("family_size",
            count(lit(1)).over(Window.partitionBy(col("component"))))
          .select(sum(col("family_size"))).collect().head.getLong(0)
      }
      runAndReport(s"lshfam_groupby_aqeoff n=$n")(groupbyForm())
      runAndReport(s"lshfam_window_aqeoff  n=$n")(windowForm())
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      runAndReport(s"lshfam_groupby_aqeon  n=$n")(groupbyForm())
      runAndReport(s"lshfam_window_aqeon   n=$n")(windowForm())
      spark.sparkContext.removeSparkListener(skew)
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      pairs.unpersist()
    }

    // --- mega-fingerprint hygiene arm (r13 VERDICT item 1) ----------------
    // One boilerplate page planted 100k+1 times (one content fingerprint —
    // the shape a crawl's cookie-banner page has at 10^7-10^8 copies), mixed
    // with an equal mass of unique docs, run through the REAL flagship
    // hygiene path (TextPolicy.hygieneStaged: the route every batch,
    // streaming, and selection pipeline funnels through). A/B: the pre-r14
    // keep-first form ranked survivors with a running-sum window partitioned
    // by the content fingerprint, which reads the ENTIRE twin family on one
    // task (maxReadRec ~= family size, skew ~= numPartitions); the shipped
    // form aggregates keeper = min(doc_id) per fingerprint (combiner
    // pre-reduces each input partition to ONE row per fingerprint) and joins
    // back — no stage reads the family on a single task.
    {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.fingerprint
      val n = 100000L
      val priorAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // survives a_lang (en stopwords), b_quality (stopword-dense, no
      // punctuation), c_repetition (dupfrac 5/17 = 0.29): all twins reach
      // the keep-first stage, the worst case for the dedup key
      val boiler = "the pipeline review and standup of the incident is " +
        "planning the rollout and oncall of the retro"
      val docs = spark.range(n + 1)
        .select(col("id").as("doc_id"), lit(boiler).as("text"))
        .unionByName(syntheticDocs(spark, n)
          .select((col("doc_id") + n + 1).as("doc_id"), col("text")))
        .repartition(32).cache()
      docs.count()
      val skew = new SkewListener
      spark.sparkContext.addSparkListener(skew)
      def runAndReport(label: String)(f: => Long): Unit = {
        skew.reset()
        val t0 = System.nanoTime()
        val rows = f
        Thread.sleep(1000)
        println(f"[pipescale] $label ${(System.nanoTime() - t0) / 1e9}%7.2f s ($rows rows)")
        skew.worstStages(6).foreach { case (sid, name, nT, maxR, meanR) =>
          println(f"[pipescale]   $label stage=$sid [$name] tasks=$nT maxReadRec=$maxR meanReadRec=$meanR%.0f skew=${maxR / math.max(meanR, 1.0)}%.1fx")
        }
      }
      // shipped flagship path: signal frame checkpointed once (r15),
      // keeper aggregate + survivor join over the materialized rows
      def aggregateForm(): Long = {
        val (staged, ck) = graft.operators.TextPolicy
          .hygieneStagedCheckpointed(docs, None)
        val n = staged.groupBy("stage").count()
          .select(sum(col("count"))).collect().head.getLong(0)
        graft.functions.releaseCheckpoint(ck)
        n
      }
      // the pre-r14 shape, kept here ONLY as the skew baseline: keep-first
      // rank via a running-sum window partitioned by the fingerprint
      def windowForm(): Long = docs
        .withColumn("_surv_rank", sum(lit(1)).over(
          Window.partitionBy(coalesce(
              nullif(fingerprint(col("text")), lit("")),
              concat(lit("doc#"), col("doc_id"))))
            .orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("stage",
          when(col("_surv_rank") > 1, "d_fingerprint_dup").otherwise("kept"))
        .groupBy("stage").count()
        .select(sum(col("count"))).collect().head.getLong(0)
      runAndReport(s"hygiene_aggjoin_aqeoff n=$n")(aggregateForm())
      runAndReport(s"hygiene_window_aqeoff  n=$n")(windowForm())
      // the AQE contrast is the finding's point: the join's hot fingerprint
      // partition is AQE-splittable (and at probe scale the tiny keeper
      // side even turns broadcast — no probe-side shuffle at all), while
      // the window's hot partition has NO runtime remedy
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      runAndReport(s"hygiene_aggjoin_aqeon  n=$n")(aggregateForm())
      runAndReport(s"hygiene_window_aqeon   n=$n")(windowForm())

      // --- mega-source shardPack arm (r13 VERDICT item 2) -----------------
      // One source holding ~all docs (the "web" crawl shape): the unsalted
      // per-source cumsum (saltWidth = Long.MaxValue = the pre-r14 plan)
      // serializes the whole source onto one window task; the shipped
      // salted two-phase form bounds every window group at saltWidth docs
      // and stitches with a one-row-per-salt prefix — bitwise-equal output
      // (TextSearchSpec), skew gone.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val srcDocs = docs.select(col("doc_id"), col("text"))
        .withColumn("source",
          when(col("doc_id") % 100 === 99, "tail").otherwise("web"))
        .repartition(32).cache()
      srcDocs.count()
      def packRows(width: Long): Long = graft.operators.TextAnalysis
        .shardPack(srcDocs, 500.0, width)
        .select(sum(col("n_docs"))).collect().head.getLong(0)
      runAndReport(s"shardpack_salted4096_aqeoff n=${2 * n}")(packRows(4096L))
      runAndReport(s"shardpack_unsalted_aqeoff   n=${2 * n}")(packRows(Long.MaxValue))
      srcDocs.unpersist()

      // --- SemDeDup mega-bucket arm (r13 VERDICT item 3) ------------------
      // n IDENTICAL embeddings: one sign bucket in every band — the
      // degenerate corpus SemDeDup exists to clean. salts=1 is the pre-r14
      // plan (the whole bucket sorts on one window task); the shipped
      // salts=64 form bounds every chain/star group at n/64 and the only
      // whole-bucket stage is the 64-row anchor chain.
      val megaVecs = spark.range(n).select(
        (col("id") * 37 + 5).as("vec_id"),
        transform(sequence(lit(0), lit(31)),
          i => sin(i.cast("double") * 1.7).cast("float")).as("embedding"))
        .repartition(32).cache()
      megaVecs.count()
      def semPairs(salts: Int): Long = graft.operators.Similarity
        .boundedBandedPairs(megaVecs, 8, 0.9, salts)
        .select(count(lit(1))).collect().head.getLong(0)
      runAndReport(s"semdedup_salt64_aqeoff n=$n")(semPairs(64))
      runAndReport(s"semdedup_salt1_aqeoff  n=$n")(semPairs(1))
      megaVecs.unpersist()

      // --- mega-segment ranked-gap arm (r14 sweep) ------------------------
      // largestGap over ONE market segment holding 2n customers: the old
      // plan ranks/lags the whole segment on one window task; the shipped
      // salted ranking stitches per-dollar-bucket ranks with a one-row-
      // per-bucket prefix (bitwise-same output, q_r4_gap_floor).
      val megaCust = spark.range(2 * n).select(
        lit("BUILDING").as("c_mktsegment"), col("id").as("c_custkey"),
        ((mix(col("id") * 7 + 3) % 1000000).cast("double") / 100.0)
          .as("c_acctbal"))
        .repartition(32).cache()
      megaCust.count()
      def gapRows(): Long = graft.operators.RecallShapes
        .largestGap(megaCust).count()
      def gapRowsWindow(): Long = {
        import org.apache.spark.sql.expressions.Window
        val rank = Window.partitionBy(col("c_mktsegment"))
          .orderBy(desc("c_acctbal"), asc("c_custkey"))
        val seg = Window.partitionBy(col("c_mktsegment"))
        val best = Window.partitionBy(col("c_mktsegment"))
          .orderBy(desc("gap"), asc("rn"))
        megaCust
          .withColumn("rn", row_number().over(rank))
          .withColumn("n", count(lit(1)).over(seg))
          .withColumn("gap", graft.functions.round4(
            lag(col("c_acctbal"), 1).over(rank) - col("c_acctbal")))
          .filter(col("rn") > 1 && col("rn") <= col("n") / 2)
          .withColumn("pick", row_number().over(best))
          .filter(col("pick") === 1).count()
      }
      runAndReport(s"rankgap_salted_aqeoff n=${2 * n}")(gapRows())
      runAndReport(s"rankgap_window_aqeoff n=${2 * n}")(gapRowsWindow())
      megaCust.unpersist()

      // --- LPA mega-hub arm (r15 VERDICT item 1) --------------------------
      // Star graph: one hub with n leaf neighbors, each carrying a DISTINCT
      // initial label — the power-law-degree worst case for LPA's per-node
      // keep-best (a web-graph hub sees 10^5-10^6 neighbor labels). The
      // pre-r15 plan ranked (hub, label) counts with row_number() over
      // (partition by node): the hub's whole neighbor-label set reads on
      // ONE window task every round. The shipped form keeps best via
      // min_by(label, struct(-cnt, label)) — a combiner aggregate that
      // pre-reduces each map partition to one row per node, so the hub's
      // reducer reads <= numPartitions rows.
      val hubEdges = spark.range(1L, n + 1)
        .select(lit(0L).as("u"), col("id").as("v"))
        .repartition(32).cache()
      hubEdges.count()
      def lpaAggForm(): Long = graft.operators.GraphAnalytics
        .labelPropagation(hubEdges, iters = 2).count()
      def lpaWindowForm(): Long = {
        // the pre-r15 shape, kept here ONLY as the skew baseline
        import org.apache.spark.sql.expressions.Window
        val e0 = hubEdges.filter(col("u") =!= col("v"))
        val sym2 = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
          .distinct().cache()
        var labels = sym2.select(col("u").as("node")).distinct()
          .withColumn("label", col("node"))
        val byCount = Window.partitionBy(col("nu"))
          .orderBy(desc("cnt"), asc("nlabel"))
        for (_ <- 1 to 2) {
          val best = sym2.join(labels, sym2("v") === labels("node"))
            .groupBy(col("u").as("nu"), col("label").as("nlabel"))
            .agg(count(lit(1)).as("cnt"))
            .withColumn("_rn", row_number().over(byCount))
            .filter(col("_rn") === 1)
            .select(col("nu"), col("nlabel"))
          labels = labels.join(best, labels("node") === best("nu"), "left")
            .select(col("node"),
              coalesce(col("nlabel"), col("label")).as("label"))
            .localCheckpoint()
        }
        val out = labels.count(); sym2.unpersist(); out
      }
      runAndReport(s"lpa_hub_minby_aqeoff  n=$n")(lpaAggForm())
      runAndReport(s"lpa_hub_window_aqeoff n=$n")(lpaWindowForm())
      // honest caveat on the A/B: Spark 4's InferWindowGroupLimit rewrites
      // a `row_number() over (...) = 1` filter into a map-side partial
      // group-limit, so THIS window shape (unlike the running-sum/count
      // windows the r14 sweep closed) is already bounded per task — print
      // whether the rewrite fired so the probe records WHY the window arm
      // shows no straggler on this Spark version
      locally {
        import org.apache.spark.sql.expressions.Window
        val byCount = Window.partitionBy(col("nu"))
          .orderBy(desc("cnt"), asc("nlabel"))
        val plan = hubEdges.select(col("u").as("nu"), col("v").as("nlabel"))
          .groupBy(col("nu"), col("nlabel")).agg(count(lit(1)).as("cnt"))
          .withColumn("_rn", row_number().over(byCount))
          .filter(col("_rn") === 1)
          .queryExecution.executedPlan.toString
        println(s"[pipescale]   lpa_hub window plan has WindowGroupLimit=" +
          plan.contains("WindowGroupLimit"))
      }
      hubEdges.unpersist()

      spark.sparkContext.removeSparkListener(skew)
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      docs.unpersist()
    }
    spark.stop()
  }
}

/** Per-stage task-skew collector: tracks shuffle-read records per task and
  * reports the stages with the highest max/mean ratio — the straggler
  * signature a skewed-key window produces.
  */
final class SkewListener extends org.apache.spark.scheduler.SparkListener {
  import scala.collection.mutable
  private val byStage = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
  private val names = mutable.Map.empty[Int, String]
  def reset(): Unit = synchronized { byStage.clear(); names.clear() }
  override def onTaskEnd(
      t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
    synchronized {
      val recs = Option(t.taskMetrics)
        .map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
      byStage.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) += recs
    }
  override def onStageCompleted(
      s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
    synchronized {
      names(s.stageInfo.stageId) = s.stageInfo.name.takeWhile(_ != '\n')
    }
  /** Top-k stages by max task read records:
    * (stageId, name, nTasks, max, mean).
    */
  def worstStages(k: Int): Seq[(Int, String, Int, Long, Double)] =
    synchronized {
      byStage.toSeq
        .filter { case (_, rs) => rs.nonEmpty && rs.max > 0 }
        .map { case (sid, rs) =>
          (sid, names.getOrElse(sid, "?").take(60), rs.size, rs.max,
            rs.sum.toDouble / rs.size) }
        .sortBy(-_._4).take(k)
    }
}
