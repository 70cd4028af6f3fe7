package graft

import graft.operators.{GraphAnalytics, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the r9 data-selection/graph operators on hand-computed
  * fixtures: DSIR importance weights, per-source length quantiles, and
  * fixed-iteration PageRank.
  */
class DataSelectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("dsir: target-like docs score above off-target docs") {
    import spark.implicits._
    // target = lang 'en'. Docs 1-3 share the en vocabulary; doc 4 is
    // disjoint: every one of its features appears only in raw, so its
    // average log-ratio must be lower than every en doc's.
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the rug"),
      (3L, "en", "a cat and a dog"),
      (4L, "zh", "zhe ge mao zuo zai dian")).toDF("doc_id", "lang", "text")
    val res = TextAnalysis.dsirWeights(docs, buckets = 64, targetLang = "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(res.size == 4)
    val minEn = Seq(1L, 2L, 3L).map(res).min
    assert(res(4L) < minEn, s"off-target doc must rank last: $res")
    // en-only features are majority-target: positive average evidence
    assert(minEn > res(4L) && res(4L) < 0.0, s"expected negative llr: $res")
  }

  test("dsir: n_feats counts unigrams plus bigrams") {
    import spark.implicits._
    val docs = Seq((1L, "en", "a b c"), (2L, "en", "solo"))
      .toDF("doc_id", "lang", "text")
    val res = TextAnalysis.dsirWeights(docs, buckets = 16, targetLang = "en")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(res(1L) == 5, s"3 unigrams + 2 bigrams: $res") // a b c, a b, b c
    assert(res(2L) == 1, s"single token has no bigram: $res")
  }

  test("dsir: the feature aggregate is planned once and reused") {
    // both distribution passes must consume the same per-(doc,bucket)
    // shuffle — a plan with two exploded corpus scans would pay the
    // dominant cost twice at 100 TB
    val df = TextAnalysis.dsirWeights(spark, "/root/testdata/sf0.001")
    df.collect() // execute THIS plan so AQE finalizes it (count() would
                 // build and finalize a different QueryExecution)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
      || "Generate ".r.findAllIn(plan).size <= 1,
      s"expected the explode subplan shared via exchange reuse:\n$plan")
  }

  test("length quantiles: exact percentile bounds and band membership") {
    import spark.implicits._
    // n_chars 10,20,30,40,50: p10 = 14, p50 = 30, p90 = 46 under linear
    // interpolation (R-7): p = (n-1)*q, floor+frac interpolation.
    val docs = (1 to 5).map(i => (i.toLong, "s0", i * 10L))
      .toDF("doc_id", "source", "n_chars")
    val r = TextAnalysis.lengthQuantiles(docs).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getDouble(1) == 14.0 && row.getDouble(2) == 30.0 &&
      row.getDouble(3) == 46.0, s"unexpected quantiles: $row")
    // band [14, 46] keeps 20, 30, 40
    assert(row.getLong(4) == 5 && row.getLong(5) == 3, s"band count: $row")
  }

  test("pagerank: hand-computed chain a->b->c over 2 iterations") {
    import spark.implicits._
    // r0 = 1 everywhere. Iter1: a=0.15, b=0.15+0.85*1=1.0, c=1.0.
    // Iter2: a=0.15, b=0.15+0.85*0.15=0.2775, c=0.15+0.85*1.0=1.0.
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val res = GraphAnalytics.pageRank(edges, iters = 2, damping = 0.85,
      topK = 10).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(res("a") == 0.15 && res("b") == 0.2775 && res("c") == 1.0,
      s"unexpected ranks: $res")
  }

  test("pagerank: out-degree splits mass and multi-edges collapse") {
    import spark.implicits._
    // a fans out to b and c (deg 2) with a duplicate a->b edge that must
    // not double b's inflow. Iter1: b = c = 0.15 + 0.85 * (1/2) = 0.575.
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c")).toDF("src", "dst")
    val res = GraphAnalytics.pageRank(edges, iters = 1, damping = 0.85,
      topK = 10).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(res("b") == 0.575 && res("c") == 0.575 && res("a") == 0.15,
      s"unexpected ranks: $res")
  }

  test("pagerank: dangling-mass redistribution matches a driver-side reference") {
    import spark.implicits._
    // a->b, b->c, c dangles. Driver-side reference implements the textbook
    // update new(v) = (1-d) + d*(inflow(v) + S/N) with S = dangling mass.
    val edgeSeq = Seq(("a", "b"), ("b", "c"))
    val nodesRef = Seq("a", "b", "c")
    val d = 0.85
    def reference(iters: Int): Map[String, Double] = {
      val out = edgeSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var r = nodesRef.map(_ -> 1.0).toMap
      for (_ <- 1 to iters) {
        val dangMass = nodesRef.filterNot(out.contains).map(r).sum
        val inflow = nodesRef.map { v =>
          v -> edgeSeq.filter(_._2 == v)
            .map { case (s, _) => r(s) / out(s).size }.sum
        }.toMap
        r = nodesRef.map(v =>
          v -> ((1 - d) + d * (inflow(v) + dangMass / nodesRef.size))).toMap
      }
      r.view.mapValues(x => math.round((x + 1e-9) * 1e4) / 1e4).toMap
    }
    val edges = edgeSeq.toDF("src", "dst")
    for (iters <- Seq(1, 3, 5)) {
      val res = GraphAnalytics.pageRank(edges, iters, damping = d, topK = 10,
          dedup = true, redistributeDangling = true, tol = None)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(res == reference(iters), s"iters=$iters: $res vs ${reference(iters)}")
    }
    // mass conservation: redistributed total rank stays at N (un-rounded
    // drift only; compare at the rounded precision)
    val r5 = GraphAnalytics.pageRank(edges, 5, d, topK = 10,
        dedup = true, redistributeDangling = true, tol = None)
      .collect().map(_.getDouble(1)).sum
    assert(math.abs(r5 - 3.0) < 0.001, s"mass not conserved: $r5")
  }

  test("pagerank: convergence-delta stop reaches the fixed point early") {
    import spark.implicits._
    // star: a,b,c all point at hub h; generous iteration budget, tight tol.
    // The converged result must match a long fixed-iteration run, proving
    // the early stop does not change the answer.
    val edges = Seq(("a", "h"), ("b", "h"), ("c", "h")).toDF("src", "dst")
    val converged = GraphAnalytics.pageRank(edges, iters = 50, damping = 0.85,
        topK = 10, dedup = true, redistributeDangling = false,
        tol = Some(1e-7))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val long = GraphAnalytics.pageRank(edges, iters = 50, damping = 0.85,
        topK = 10).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(converged == long, s"$converged vs $long")
    // sources settle at 0.15 immediately; the non-redistributed hub absorbs
    assert(converged("a") == 0.15 && converged("h") > converged("a"))
  }

  test("temperature mixing: T flattens shares toward uniform, T=1 is natural") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // 90/10 split. T=1: shares unchanged. T=2 (alpha=.5):
    // sqrt(90)=9.4868, sqrt(10)=3.1623 -> big 0.75, small 0.25 — the
    // low-resource source's repeat factor is 2.5x.
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 100).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val t1 = TextAnalysis.temperatureMix(docs, temperature = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(t1("big") == ((0.9, 0.9, 1.0)) && t1("small") == ((0.1, 0.1, 1.0)),
      s"T=1 must be the natural mix: $t1")
    val t2 = TextAnalysis.temperatureMix(docs, temperature = 2.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(t2("big") == ((0.75, 0.8333)), s"got $t2")
    assert(t2("small") == ((0.25, 2.5)), s"low-resource upsampled 2.5x: $t2")
    // target shares always renormalize to 1
    val shares = TextAnalysis.temperatureMix(docs, temperature = 3.0)
      .collect().map(_.getDouble(3)).sum
    assert(math.abs(shares - 1.0) < 1e-3, s"shares sum: $shares")
  }

  test("unimax: hand-computed waterfill — small source capped at maxEpochs, " +
    "rest split the remaining budget evenly") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) =
      (id, src, Seq.fill(n)("w").mkString(" "))
    // token counts s1=10 s2=20 s3=100 s4=100; budget 100; cap 2 epochs.
    // Ascending caps [20, 40, 200, 200]: r1 20*4=80<=100 -> capped;
    // r2 40*3=120>80 -> uncapped; lambda=(100-20)/3=26.667 for s2,s3,s4.
    val docs = Seq(doc(1, "s1", 10), doc(2, "s2", 20), doc(3, "s3", 100),
      doc(4, "s4", 100)).toDF("doc_id", "source", "text")
    val out = TextAnalysis.unimaxMix(docs, budgetTokens = 100L,
      maxEpochsMicro = 2000000L).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Boolean]("capped"), r.getAs[Double]("alloc_tokens"),
          r.getAs[Double]("epochs"), r.getAs[Double]("mix_share")))).toMap
    assert(out("s1") == ((true, 20.0, 2.0, 0.2)), s"s1: ${out("s1")}")
    for (s <- Seq("s2", "s3", "s4"))
      assert(out(s)._1 == false &&
        math.abs(out(s)._2 - 26.6667) <= 1e-4, s"$s: ${out(s)}")
    assert(math.abs(out("s2")._3 - 1.3333) <= 1e-4 &&
      math.abs(out("s3")._3 - 0.2667) <= 1e-4, s"epochs: $out")
    // allocations exhaust the budget when anyone is uncapped
    assert(math.abs(out.values.map(_._2).sum - 100.0) <= 1e-3)
  }

  test("heaps law: pure-noise vocabulary fits beta ~ 1, a closed " +
    "vocabulary fits ~ 0 (r13)") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // noise: every token globally unique -> V(N) = N -> beta = 1
    val noise = (1L to 64L).map(d =>
      (d, (0 until 20).map(p => s"u${d}_$p").mkString(" ")))
      .toDF("doc_id", "text")
    val bNoise = TextAnalysis.heapsLaw(noise).collect().head
      .getAs[Double]("heaps_beta")
    assert(math.abs(bNoise - 1.0) < 0.01, s"noise beta: $bNoise")
    // closed vocabulary: 8 tokens cycling -> V saturates -> beta ~ 0
    val closed = (1L to 64L).map(d =>
      (d, (0 until 20).map(p => s"t${(d + p) % 8}").mkString(" ")))
      .toDF("doc_id", "text")
    val bClosed = TextAnalysis.heapsLaw(closed).collect().head
      .getAs[Double]("heaps_beta")
    assert(bClosed < 0.1, s"closed-vocab beta: $bClosed")
  }

  test("ngram novelty: a verbatim later copy scores 0, the original 1, " +
    "and a half-overlap doc scores its fresh fraction (r13)") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val a = (0 until 12).map(i => s"w$i").mkString(" ") // 10 shingles
    val half = ((6 until 12) ++ (100 until 106)).map(i => s"w$i")
      .mkString(" ") // shares shingles from a's tail, adds fresh ones
    val docs = Seq((1L, a), (2L, a), (3L, half))
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_novel"), r.getAs[Double]("novelty")))).toMap
    assert(out(1L)._2 == 1.0, s"original is fully novel: ${out(1L)}")
    assert(out(2L) == ((0L, 0.0)), s"verbatim later copy: ${out(2L)}")
    assert(out(3L)._2 > 0.0 && out(3L)._2 < 1.0,
      s"half-overlap sits strictly between: ${out(3L)}")
  }

  test("zipf slope: a perfect power law recovers its exponent; flat " +
    "frequencies fit ~0 (r13)") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // synthesize frequencies directly as repeated tokens: source zipf has
    // token t_r appearing round(1000 / r) times (slope -1); source flat
    // has every token 50 times (slope 0)
    def docsOf(src: String, freq: Int => Int) = (1 to 20).flatMap { r =>
      Seq.fill(freq(r))(s"t$r")
    }.grouped(40).zipWithIndex.map { case (ts, i) =>
      (src.hashCode.toLong * 1000 + i, src, ts.mkString(" "))
    }.toSeq
    val docs = (docsOf("zipf", r => math.round(1000.0 / r).toInt) ++
      docsOf("flat", _ => 50)).toDF("doc_id", "source", "text")
    val out = TextAnalysis.zipfSlope(docs, topN = 20).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("zipf_slope")).toMap
    assert(math.abs(out("zipf") - (-1.0)) < 0.01, s"got ${out("zipf")}")
    assert(math.abs(out("flat")) < 0.01, s"got ${out("flat")}")
  }

  test("weighted sample: heavy-weight docs dominate the reservoir and the " +
    "salted two-phase top-k equals the single-window form (r13)") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one source, 10 heavy docs (w=1000) among 90 near-zero (w=0.001):
    // A-ES keys put the heavy docs at ~1e9 and the light ones at ~0, so
    // the k=10 reservoir must be exactly the heavy set
    val docs = (1L to 100L).map(i =>
      (i, "s0", if (i <= 10) 1000.0 else 0.001)).toDF("doc_id", "source", "w")
    val got = TextAnalysis.weightedSample(docs, k = 10).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet == (1L to 10L).toSet,
      s"heavy docs must dominate: ${got.map(_.getAs[Long]("doc_id")).toSeq}")
    // structural equality vs the plain single-window top-k
    val u = graft.functions.TextFunctions
      .md5Bucket("ws#", col("doc_id"), 1000000).cast("double") / 1e6
    val single = docs.withColumn("key_u",
        round(pow(u, lit(1.0) / col("w")) * 1e9 + 1e-3).cast("long"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("source"))
        .orderBy(desc("key_u"), asc("doc_id"))))
      .filter(col("rank") <= 10)
      .select(col("source"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("key_u"),
        graft.functions.round4(col("w")).as("w"))
    val twoPhase = TextAnalysis.weightedSample(docs, k = 10)
    assert(twoPhase.exceptAll(single).isEmpty &&
      single.exceptAll(twoPhase).isEmpty,
      "two-phase top-k must equal the single-window form")
  }

  test("source divergence: twin sources sit near zero KL, disjoint-vocab " +
    "sources far above, and both directions are positive (r13)") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Seq(
      (1L, "s_twin1", "alpha beta gamma delta alpha beta"),
      (2L, "s_twin2", "alpha beta gamma delta beta alpha"),
      (3L, "s_other", "omega psi chi phi omega psi"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Double]("kl_ab"), r.getAs[Double]("kl_ba")))).toMap
    val twins = out(("s_twin1", "s_twin2"))
    val far = out(("s_other", "s_twin1"))
    assert(twins._1 < 0.01 && twins._2 < 0.01,
      s"same-distribution sources must sit near zero: $twins")
    assert(far._1 > 10 * twins._1.max(1e-6), s"disjoint vocab: $far vs $twins")
    assert(out.values.forall(v => v._1 >= 0 && v._2 >= 0),
      s"KL is non-negative: $out")
  }

  test("unimax: a zero-token source leaves the allocation entirely — no " +
    "NaN epochs, other allocations as if it never existed (r13, ADVICE)") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) =
      (id, src, Seq.fill(n)("w").mkString(" "))
    val base = Seq(doc(1, "s1", 10), doc(2, "s2", 20), doc(3, "s3", 100),
      doc(4, "s4", 100))
    val withEmpty = (base :+ ((5L, "sempty", "")))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.unimaxMix(withEmpty, budgetTokens = 100L,
      maxEpochsMicro = 2000000L).collect()
    assert(!out.exists(_.getAs[String]("source") == "sempty"),
      "zero-token source must not appear")
    assert(out.forall(r => !r.getAs[Double]("epochs").isNaN))
    val ref = TextAnalysis.unimaxMix(base.toDF("doc_id", "source", "text"),
      budgetTokens = 100L, maxEpochsMicro = 2000000L).collect()
    assert(out.map(_.toString).sorted.sameElements(ref.map(_.toString).sorted),
      "allocation must match the fixture without the empty source")
  }

  test("unimax: epoch cap binds everywhere when the budget exceeds " +
    "total capacity — allocation underfills, never over-repeats") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Seq((1L, "s1", Seq.fill(10)("w").mkString(" ")),
      (2L, "s2", Seq.fill(20)("w").mkString(" ")),
      (3L, "s3", Seq.fill(100)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.unimaxMix(docs, budgetTokens = 1000L,
      maxEpochsMicro = 2000000L).collect()
    assert(out.forall(_.getAs[Boolean]("capped")), "all capped")
    assert(out.forall(r => math.abs(r.getAs[Double]("epochs") - 2.0) <= 1e-4),
      "every source at exactly the epoch cap")
    val total = out.map(_.getAs[Double]("alloc_tokens")).sum
    assert(math.abs(total - 260.0) <= 1e-3, s"2*(10+20+100) = 260: $total")
  }

  test("sequence chunks: boundary splits, carry-over, and exact fills") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // ctx=4. Source s: docs of 3, 3, 2 tokens -> stream of 8 tokens = 2
    // exactly-full sequences. Doc 11 (tokens 3..5) SPANS the seq boundary:
    // seq 0 holds docs 10+11 (no carry), seq 1 holds docs 11+12 with doc
    // 11 carried over.
    val docs = Seq(
      (10L, "s", "a b c"), (11L, "s", "d e f"), (12L, "s", "g h"),
      // second source: a single 5-token doc -> one full seq + a 1-token
      // partial; the doc carries into its own second sequence
      (20L, "t", "p q r s t"))
      .toDF("doc_id", "source", "text")
    val rows = TextAnalysis.sequenceChunks(docs, ctx = 4L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(rows(("s", 0L)) == ((2L, 4L, 0L, 10L, 11L)), s"got $rows")
    assert(rows(("s", 1L)) == ((2L, 4L, 1L, 11L, 12L)), s"got $rows")
    assert(rows(("t", 0L)) == ((1L, 4L, 0L, 20L, 20L)), s"got $rows")
    assert(rows(("t", 1L)) == ((1L, 1L, 1L, 20L, 20L)), s"got $rows")
    // conservation: sequence token sums equal the corpus token count
    assert(rows.values.map(_._2).sum == 13L)
  }

  test("containment pairs: quoted-subset docs flag where Jaccard would not") {
    // doc 2 is doc 1's first third quoted verbatim inside unrelated text:
    // containment of the short side is high while Jaccard stays low.
    val rows = graft.operators.Dedup
      .containmentPairs(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty, "driver corpus must surface containment pairs")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs are (a < b)")
      assert(r.getDouble(3) >= 0.5 && r.getDouble(3) <= 1.0)
    }
    // cross-check one pair against a direct shingle-set computation
    import graft.functions.TextFunctions.wordShingles
    import org.apache.spark.sql.functions.col
    val (a, b) = (rows.head.getLong(0), rows.head.getLong(1))
    val sets = Tables.documents(spark, "/root/testdata/sf0.01")
      .filter(col("doc_id").isin(a, b))
      .select(col("doc_id"), wordShingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val inter = sets(a).intersect(sets(b)).size
    assert(rows.head.getLong(2) == inter.toLong,
      s"exact intersection mismatch: ${rows.head} vs $inter")
  }

  test("triangle counts: hand graph with one triangle plus a dangling wedge") {
    import spark.implicits._
    // K3 on {1,2,3} plus edge 3-4: nodes 1,2,3 each sit in 1 triangle,
    // node 4 in none; the 2-4 wedge through 3 must NOT close. Duplicate
    // edge rows must not double-count.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 3L), (3L, 4L))
      .toDF("u", "v")
    val res = graft.operators.GraphAnalytics.triangleCounts(edges, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $res")
    // reversed orientations and self-loops normalize away: the same graph
    // stored undirected (+ a self-loop) must count identically
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L), (3L, 2L),
      (4L, 3L), (2L, 2L)).toDF("u", "v")
    val res2 = graft.operators.GraphAnalytics.triangleCounts(messy, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res2 == res, s"orientation must not matter: $res2")
  }

  test("label propagation: hand-traced sync rounds on two bridged cliques") {
    import spark.implicits._
    // K3 on {1,2,3} and K3 on {10,11,12} joined by one bridge edge 3-10.
    // Hand trace (sync, most-frequent neighbor label, ties to min):
    //   round 1: 1->2, 2->1, 3->1 (min of all-singleton {1,2,10}),
    //            10->3 (min of {11,12,3}), 11->10, 12->10
    //   round 2: 1->1, 2->1, 3->1, 10->10 ({1,10,10}: 10 wins by count),
    //            11->3 ({3,10} tie -> 3), 12->3 ({3,10} tie -> 3)
    // The left clique converges to label 1; the bridge's round-1 pull
    // leaves the right clique mid-oscillation — the documented behavior of
    // SYNC LPA at a fixed round count (the determinism the oracle needs;
    // more rounds settle it, and the spec's pinned map is the contract).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("u", "v")
    val res = GraphAnalytics.labelPropagation(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 3L, 12L -> 3L), s"got $res")
    // determinism across parallelism
    val res2 = GraphAnalytics.labelPropagation(edges.repartition(7), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res2 == res)
    // lone edge = the textbook sync-LPA 2-cycle: the pair SWAPS labels
    // each round (100->200, 200->100, then back), so even round counts
    // return both to their own label — pinned as-is; an odd count agrees
    // on the swapped pair instead
    val pair = Seq((100L, 200L)).toDF("u", "v")
    val even = GraphAnalytics.labelPropagation(pair, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(even == Map(100L -> 100L, 200L -> 200L), s"got $even")
    val odd = GraphAnalytics.labelPropagation(pair, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(odd == Map(100L -> 200L, 200L -> 100L), s"got $odd")
  }

  test("winnowing guarantee: a shared run of >= w+n-1 tokens always pairs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // w=4, n=3: any verbatim run of >= 6 tokens must share a fingerprint.
    // Docs 1/2 share exactly a 6-token run embedded in unrelated text;
    // docs 3/4 share nothing.
    val shared = "orange mango papaya guava lychee durian"
    val docs = Seq(
      (1L, s"aa bb cc $shared dd ee ff gg hh"),
      (2L, s"pp qq $shared rr ss tt uu vv ww xx"),
      (3L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10"),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")).map { case (i, t) => (i, t) }
    val tmp = java.nio.file.Files.createTempDirectory("graft-win").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val pairs = graft.operators.Dedup
      .winnowingPairs(spark, tmp, w = 4, maxDf = 20, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      s"the winnowing theorem demands (1,2) pairs: $pairs")
    assert(!pairs.exists(p => p._1 >= 3L || p._2 >= 3L),
      s"disjoint docs must not pair: $pairs")
  }

  test("as-of join: strictly-prior click, per user, null when none") {
    import org.apache.spark.sql.functions._
    // verify against a per-row recomputation on real data: for each
    // purchase, the latest click with (ts, event_id) strictly before it
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("purchase", "click"))
      .select("event_id", "user_id", "event_type", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime))
    val expected = ev.filter(_._3 == "purchase").map { case (id, u, _, ts) =>
      val prior = ev.filter(e => e._2 == u && e._3 == "click" &&
        (e._4 < ts || (e._4 == ts && e._1 < id)))
      id -> (if (prior.isEmpty) None
             else Some(prior.maxBy(e => (e._4, e._1))._1))
    }.toMap
    val got = graft.operators.Relational
      .asofClickForPurchase(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet)
    assert(got == expected)
    assert(got.values.exists(_.isEmpty),
      "fixture should include a purchase with no prior click")
  }

  test("conversion funnel: order constraints gate each stage") {
    import org.apache.spark.sql.functions.col
    // cross-check against a driver recomputation on real data: a user
    // converts stage 2 only with a click strictly after their first
    // signup, stage 3 only with a purchase strictly after that first
    // qualifying click
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val byUser = ev.groupBy(_._1)
    def firstAfter(es: Array[(Long, String, Long)], t: String,
        after: Option[Long]): Option[Long] =
      after.flatMap(a => es.filter(e => e._2 == t && e._3 > a)
        .map(_._3).sorted.headOption)
    val stages = byUser.values.map { es =>
      val t1 = es.filter(_._2 == "signup").map(_._3).sorted.headOption
      val t2 = firstAfter(es, "click", t1)
      val t3 = firstAfter(es, "purchase", t2)
      (t1.isDefined, t2.isDefined, t3.isDefined)
    }
    val expected = (stages.count(_._1), stages.count(_._2), stages.count(_._3))
    val row = graft.operators.Relational
      .conversionFunnel(spark, "/root/testdata/sf0.001").head()
    assert((row.getLong(0).toInt, row.getLong(1).toInt, row.getLong(2).toInt)
      == expected, s"got $row expected $expected")
    assert(row.getLong(0) >= row.getLong(1) &&
      row.getLong(1) >= row.getLong(2), "funnel must be monotone")
  }

  test("corpus profile: sketch aggregates stay within 5% of exact answers") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val prof = TextAnalysis.corpusProfile(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = docs
      .groupBy("source")
      .agg(countDistinct(md5(col("text"))).as("d"),
        expr("percentile(n_chars, 0.5D)").as("p50"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(prof.keySet == exact.keySet)
    exact.foreach { case (src, (d, p50)) =>
      val row = prof(src)
      assert(math.abs(row.getLong(2) - d).toDouble / d <= 0.05,
        s"$src distinct: sketch ${row.getLong(2)} vs exact $d")
      assert(math.abs(row.getLong(4) - p50) / math.max(p50, 1.0) <= 0.05,
        s"$src p50: sketch ${row.getLong(4)} vs exact $p50")
    }
  }

  test("length quantiles: approx_percentile swap stays within 5% at sf0.001") {
    // the 100 TB path uses the sketch aggregate; pin its drift against the
    // exact per-source p50 on real data so the swap documented in the
    // scaladoc is evidence, not hope.
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = docs.groupBy("source")
      .agg(expr("percentile(n_chars, 0.5D)").as("p50"))
    val approx = docs.groupBy("source")
      .agg(expr("approx_percentile(n_chars, 0.5D, 1000)").as("ap50"))
    val joined = exact.join(approx, "source").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getDouble(1)
      val a = r.getLong(2).toDouble
      assert(math.abs(a - e) / math.max(e, 1.0) <= 0.05,
        s"approx p50 drifted >5% for ${r.getString(0)}: exact=$e approx=$a")
    }
  }

  test("exact-substring spans: hand-traced coverage, merging, and " +
    "within-doc repetition") {
    import spark.implicits._
    // n=4 keeps the trace small. Fixtures:
    //  doc 1 & 2 share the 6-token run "r1 r2 r3 r4 r5 r6" -> dup 4-gram
    //    starts at 3 positions -> ONE merged span of 6 tokens in each;
    //  doc 3 repeats its own 4 tokens "x1 x2 x3 x4" twice (positions 0-3
    //    and 4-7): the gram occurs twice IN THE SAME DOC -> both
    //    occurrences are duplicate spans, and they touch -> one 8-token
    //    span (the within-doc case pairwise detectors cannot express);
    //  doc 4 is clean -> zeros;
    //  doc 5 has 3 tokens (< n) -> no grams -> zeros.
    val docs = Seq(
      (1L, "a1 a2 r1 r2 r3 r4 r5 r6 a3 a4"),
      (2L, "b1 r1 r2 r3 r4 r5 r6 b2 b3 b4"),
      (3L, "x1 x2 x3 x4 x1 x2 x3 x4 y1 y2"),
      (4L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      (5L, "d1 d2 d3"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-sspan").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val out = graft.operators.Dedup.substringDupSpans(spark, tmp, n = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // (n_tokens, n_spans, dup_tokens, dup_frac)
    assert(out(1L) == ((10L, 1L, 6L, 0.6)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((10L, 1L, 6L, 0.6)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((10L, 1L, 8L, 0.8)), s"doc3 self-repeat: ${out(3L)}")
    assert(out(4L) == ((10L, 0L, 0L, 0.0)), s"clean doc: ${out(4L)}")
    assert(out(5L) == ((3L, 0L, 0L, 0.0)), s"short doc: ${out(5L)}")
    // the hashed variant must agree EXACTLY on the same fixtures
    val hashed = graft.operators.Dedup
      .substringDupSpans(spark, tmp, n = 4, hashed = true).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(hashed == out, s"hashed variant drifted: $hashed vs $out")
  }

  test("bucketed-edges table yields the same PageRank as the raw edge " +
    "frame (r12 layout writer)") {
    import spark.implicits._
    val edges = (0 until 400).map(i =>
      (s"n${i % 37}", s"n${(i * 7 + 3) % 37}")).toDF("src", "dst")
    val raw = GraphAnalytics.pageRank(edges, iters = 3, damping = 0.85,
      topK = 15).collect().map(_.toString).toSeq
    GraphAnalytics.writeBucketedEdges(edges, "ds_bucketed_edges")
    try {
      val bucketed = GraphAnalytics.pageRank(
        spark.table("ds_bucketed_edges"), iters = 3, damping = 0.85,
        topK = 15, dedup = false).collect().map(_.toString).toSeq
      assert(bucketed == raw, "layout must never change results")
    } finally spark.sql("DROP TABLE ds_bucketed_edges")
  }

  test("exact-substring spans: hashed-gram variant is bitwise-equal to " +
    "the string-gram form at sf0.01, n=8 and the paper's n=50 (r12)") {
    // the hashed form's decision is always by exact string (hash only
    // routes candidates into verification), so results must be EQUAL —
    // not approximately equal — at any n
    val dir = "/root/testdata/sf0.01"
    for (n <- Seq(8, 50)) {
      val s = graft.operators.Dedup.substringDupSpans(spark, dir, n)
        .collect().map(_.toString)
      val h = graft.operators.Dedup
        .substringDupSpans(spark, dir, n, hashed = true)
        .collect().map(_.toString)
      assert(s.sameElements(h), s"hashed != string at n=$n")
      if (n == 8) assert(s.nonEmpty)
    }
  }

  test("doremi: the divergent domain carries the largest excess loss and " +
      "gains weight; weights stay a distribution") {
    import spark.implicits._
    // Domains a/b share one vocabulary (the corpus LM models them well —
    // small excess); domain c is disjoint (the corpus LM is a poor proxy
    // for it — large excess). DoReMi must upweight c above uniform and
    // above both a and b.
    val docs = Seq(
      ("a", "the cat sat on the mat the cat sat again"),
      ("a", "the dog sat on the rug the dog sat again"),
      ("b", "the cat and the dog sat on the mat"),
      ("b", "the rug and the mat the cat the dog"),
      ("c", "zhe ge mao zuo zai dian zi shang mian ne"),
      ("c", "na ge gou zuo zai di tan shang mian ba"))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val res = TextAnalysis.doremiMix(docs, eta = 1.0, steps = 10,
      smoothing = 0.001).collect()
    val bySrc = res.map(r => r.getString(0) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(bySrc.keySet == Set("a", "b", "c"))
    val (exC, wC, wAvgC) = bySrc("c")
    assert(exC > bySrc("a")._1 && exC > bySrc("b")._1,
      s"disjoint domain must have the largest excess: $bySrc")
    assert(wC > 1.0 / 3 && wC > bySrc("a")._2 && wC > bySrc("b")._2,
      s"divergent domain must gain weight: $bySrc")
    // final and averaged weights each sum to ~1 (quantization leaves
    // <= n micro-units of slack)
    val sumW = res.map(_.getDouble(3)).sum
    val sumAvg = res.map(_.getDouble(4)).sum
    assert(math.abs(sumW - 1.0) < 1e-3 && math.abs(sumAvg - 1.0) < 1e-3,
      s"weights must normalize: $sumW / $sumAvg")
    assert(res.forall(_.getDouble(2) >= 0.0), "excess is clamped at 0")
    // the averaged mixture is smoother than the final step: it sits
    // between uniform and the final weight for the extreme domain
    assert(wAvgC <= wC + 1e-9 && wAvgC >= 1.0 / 3 - 1e-9,
      s"average must interpolate toward uniform: $bySrc")
  }

  test("epoch shuffle: positions are an exact permutation, shards balance, " +
    "seeds reshuffle, replay is identical (r14)") {
    import spark.implicits._
    val docs = (0L until 2000L).map(Tuple1(_)).toDF("doc_id")
    def run(seed: String) = graft.operators.TextAnalysis
      .epochShuffle(docs, seed, shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = run("ep0")
    // a total permutation: every position 1..n exactly once
    assert(a.map(_._3).sorted.toSeq == (1L to 2000L), "not a permutation")
    // the md5 key is uniform: every shard within 2x of fair share
    val byShard = a.groupBy(_._2).view.mapValues(_.size)
    assert(byShard.size == 8 && byShard.values.forall(n => n > 125 && n < 500),
      s"unbalanced shards: ${byShard.toMap}")
    // deterministic replay, seed-sensitive order
    assert(run("ep0").toSeq == a.toSeq, "replay must be identical")
    val b = run("ep1")
    assert(b.map(_._3).sorted.toSeq == (1L to 2000L))
    assert(a.toSeq != b.toSeq, "a new seed must reshuffle")
  }
}
