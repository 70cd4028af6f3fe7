package graft.domain

import java.sql.Timestamp

import graft.functions.TextFunctions
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Batched recall: run MANY recall requests against the corpus in ONE Spark
  * plan — the engine's answer to the reference's one-request-at-a-time
  * online serving (BASELINE.json: "Batch embedding + graph build, not online
  * serving"). A queries relation (qid, query) joins the memories relation
  * once per channel; every downstream stage (scoring, dedup, ranking) is a
  * window partitioned by qid. Amortized cost per query is a small constant
  * over the corpus scan instead of a full plan execution per request.
  *
  * Scale shape: the queries side is broadcast (requests are small); the
  * memories side is scanned once per channel; per-query top-k are windows on
  * (qid) — total shuffle volume is O(queries x overfetch), not O(corpus).
  * At index scale the vector channel drops in an IVF/LSH pre-filter (see
  * ARCHITECTURE.md) without changing this plan's structure.
  */
object BatchRecall {

  /** Queries df must have (qid: any, query: string). Returns per-qid ranked
    * results (qid, rank, id, final_score, match_type + component columns).
    *
    * The query relation is a bounded REQUEST batch (the reference receives
    * these as HTTP requests — driver-side data by nature), so it is
    * collected once and re-planted as a LocalRelation: every one of the
    * ~7 broadcast exchanges it feeds then broadcasts driver-local rows
    * instead of launching a scan + embed job per exchange.
    *
    * If `queries` carries a pre-computed `qvec` (array&lt;float&gt;) column it is
    * used as the query vector (e.g. vectors looked up from an embedding
    * table); otherwise the placeholder provider embeds the query text.
    *
    * `roundScores=true` quantizes channel and final scores to 4 decimals
    * BEFORE ranking: rank order then depends only on values an external
    * engine (the DuckDB oracle) reproduces exactly, with the asc-id
    * tie-break absorbing any sub-1e-4 float divergence.
    */
  /** Names of the derived request-relation columns ([[requestRelation]]);
    * [[PreparedRecall]] uses them to locate the relation inside the
    * analyzed template plan when swapping in a new request.
    */
  val RequestCols: Seq[String] =
    Seq("qid", "query", "qvec", "qtrim", "phrase", "qtokens", "kw_max",
      "is_trend", "md_terms")

  /** Driver-side request preprocessing: collect the (qid, query[, qvec])
    * relation and re-plant it as a LocalRelation carrying every per-query
    * derived value the plan needs (tokens, phrase, theoretical keyword max,
    * trending flag). Factored out so [[PreparedRecall]] can rebuild ONLY
    * this relation per request and splice it into a cached template plan.
    */
  def requestRelation(queries: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = queries.sparkSession
    val hasQvec = queries.columns.contains("qvec")
    val qCols = if (hasQvec) Seq(col("qid"), col("query"), col("qvec"))
      else Seq(col("qid"), col("query"))
    val reqs = queries.select(qCols: _*).collect().toSeq.map { r =>
      (r.get(0), r.get(1).asInstanceOf[String],
        if (hasQvec) Some(r.getSeq[Float](2)) else None)
    }
    requestRelationFromSeq(spark, queries.schema("qid").dataType, reqs)
  }

  /** [[requestRelation]] without the DataFrame round-trip: derive the
    * request rows in plain Scala and plant them directly — the serving
    * path calls this once per request, where two extra Dataset
    * constructions + collects would cost ~40 ms.
    */
  def requestRelationFromSeq(spark: org.apache.spark.sql.SparkSession,
      qidType: org.apache.spark.sql.types.DataType,
      reqs: Seq[(Any, String, Option[Seq[Float]])]): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val qLocal = reqs.map { case (qid, query, qvecOpt) =>
      val qlower = query.toLowerCase
      // the SAME keyword extractor as the single path (`Recall.keywords`:
      // [a-z0-9]+ runs, >= 3 chars, stopword-filtered, order-preserving
      // dedup — `automem/utils/text.py:81-101`); a whitespace split would
      // tokenize "dark-mode" as one token and diverge from single recall
      val toks = Recall.keywords(query)
      val qvec = qvecOpt.getOrElse(PlaceholderEmbedding.embed(query).toSeq)
      // theoretical keyword maximum (`runtime_recall_helpers.py:655-660`):
      // 3 per keyword (+2 content, +1 tag) plus 3 for the phrase when the
      // normalized query is >= 3 chars; stopword-only queries take the
      // phrase-only branch maximum of 3. The trim is JAVA trim (all chars
      // <= U+0020), same as the single path — Spark's trim() strips spaces
      // only, so the normalized strings are computed driver-side and
      // planted as columns rather than recomputed in SQL.
      val qtrim = qlower.trim
      val phrase = if (qtrim.length >= 3) qtrim else ""
      val kwMax: Double =
        if (toks.nonEmpty) 3.0 * toks.length + (if (phrase.nonEmpty) 3.0 else 0.0)
        else 3.0
      // empty / "*" / sub-3-char stopword-only queries take the TRENDING
      // channel instead of keyword search, matching the single-query path
      // (`runtime_recall_helpers.py:618-629` via Recall.keywordChannel)
      val isTrend = toks.isEmpty && phrase.isEmpty
      // Q5 prefilter terms (`runtime_recall_helpers.py:192-199` via
      // MetadataScoring.prefilterTerms) — empty means the metadata channel
      // is skipped for this query, matching Recall.metadataChannel
      val mdTerms = MetadataScoring.prefilterTerms(query)
      Row(qid, query, qvec, qtrim, phrase, toks, kwMax, isTrend, mdTerms)
    }
    val qSchema = StructType(Seq(
      StructField("qid", qidType),
      StructField("query", StringType),
      StructField("qvec", ArrayType(FloatType, containsNull = false)),
      StructField("qtrim", StringType),
      StructField("phrase", StringType),
      StructField("qtokens", ArrayType(StringType, containsNull = true)),
      StructField("kw_max", DoubleType),
      StructField("is_trend", BooleanType),
      StructField("md_terms", ArrayType(StringType, containsNull = false))))
    spark.createDataFrame(qLocal.toSeq.asJava, qSchema)
  }

  /** The exploded (qid, tok) relation and its distinct-token projection,
    * computed DRIVER-SIDE from the request relation and planted as
    * LocalRelations. Deriving them in-plan (`explode` / `distinct` over the
    * request) would be equivalent, but those operators do not fold to a
    * LocalRelation, so every broadcast that consumes them pays a one-task
    * Spark job; a planted LocalRelation broadcasts straight from the driver
    * with no job — worth ~100 ms per served request.
    */
  def requestTokenRelations(q: DataFrame): (DataFrame, DataFrame) =
    requestTokenRelationsFromSeq(q.sparkSession, q.schema("qid").dataType,
      q.select(col("qid"), col("qtokens")).collect().toSeq.map(r =>
        (r.get(0), r.getSeq[String](1))))

  /** [[requestTokenRelations]] from already-collected (qid, tokens) pairs —
    * no Spark round-trip.
    */
  def requestTokenRelationsFromSeq(spark: org.apache.spark.sql.SparkSession,
      qidType: org.apache.spark.sql.types.DataType,
      toks: Seq[(Any, Seq[String])]): (DataFrame, DataFrame) = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val qtokRows = toks.flatMap { case (qid, ts) => ts.map(t => Row(qid, t)) }
    val distinctRows = qtokRows.map(_.getString(1)).distinct.map(Row(_))
    val qtok = spark.createDataFrame(qtokRows.asJava,
      StructType(Seq(StructField("qid", qidType), StructField("tok", StringType))))
    val qtokDistinct = spark.createDataFrame(distinctRows.asJava,
      StructType(Seq(StructField("tok", StringType))))
    (qtok, qtokDistinct)
  }

  /** Query-independent corpus relations the keyword channel probes: the
    * filtered corpus, the exploded (doc, token) / (doc, tag) postings, and
    * their distinct vocabularies. A serving deployment ([[PreparedRecall]])
    * builds this once and caches it — the reference's analog is the
    * persistent keyword index its vector store maintains — so each request
    * pays only the vocabulary x query-token probe, not the index build.
    */
  /** Bounded keyword-channel statistics persisted WITH the index (r17,
    * VERDICT r16 items 1-2): the inputs of the batch keyword form chooser
    * ([[chooseKeywordForm]]). `topDf` holds the `DfTopK` highest
    * document-frequency corpus tokens (df = postings rows per token — the
    * exact row count the index form's `hits` join fans out per query
    * sharing the token); `tailDf` is the df at the truncation rank, an
    * upper bound for every token NOT in the table; `corpusRows` sizes the
    * scan form. Like the IVF quantizer's centroid table, this is a
    * BOUNDED parameter read collected once at index build — the
    * request-time estimate is then pure driver arithmetic over the query
    * tokens, adding ZERO Spark jobs to a serving call.
    *
    * Tail matching mass (r18, ADVICE r17): a query token contained in MANY
    * below-topK corpus tokens fans out by (matching tail tokens × their
    * df), which a single `tailDf` allowance undercounts by orders of
    * magnitude on long-tail vocabularies. The stats therefore also carry
    * `tailTokens` (distinct tokens outside the table), `tailPostings`
    * (their total postings mass) and `tailSample` — a bounded,
    * deterministic (hash-ordered) sample of tail tokens. The estimator
    * rates each query token's substring-match fraction against the sample
    * and charges `frac × tailPostings`, floored at the old `tailDf`
    * single-token allowance. All bounded: ≤ [[TailSampleK]] extra strings.
    */
  final case class KeywordStats(corpusRows: Long,
      topDf: Array[(String, Long)], tailDf: Long,
      tailTokens: Long = 0L, tailPostings: Long = 0L,
      tailSample: Array[String] = Array.empty)

  /** topDf table size: large enough that every fan-out-relevant (high-df)
    * token is in the table — a token outside it contributes at most
    * `tailDf` per occurrence, which at any corpus size is the LOW-df tail
    * by construction. 2048 strings x ~8 bytes df: noise on the driver.
    */
  val DfTopK: Int = 2048

  /** Bounded tail-token sample size for the matching-mass estimate: at
    * 2048 sampled strings the match-fraction standard error is under
    * ~1.1% — far tighter than the order-of-magnitude decision the
    * chooser makes — and the driver cost is another ~16 KB.
    */
  val TailSampleK: Int = 2048

  final case class RecallIndex(base: DataFrame, postings: DataFrame,
      vocab: DataFrame, baseKw: DataFrame, baseHydrate: DataFrame) {
    private def all = Seq(base, postings, vocab, baseKw, baseHydrate)
    @volatile private var _kwStats: Option[KeywordStats] = None
    /** Stats collected by the last [[materialize]]/[[collectStats]] —
      * absent on a never-materialized index, in which case `"auto"` keeps
      * the measured small-corpus default (index form).
      */
    def kwStats: Option[KeywordStats] = _kwStats
    /** One aggregate over the (cached) postings relation + the base count
      * — build-time work, amortized across every request the index
      * serves. Deterministic: ties at the truncation rank break by token.
      */
    def collectStats(topK: Int = DfTopK): KeywordStats = {
      val dfTop = postings.groupBy(col("ptok")).count()
        .orderBy(desc("count"), asc("ptok"))
        .limit(topK + 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val (kept, cut) = dfTop.splitAt(topK)
      val tail = cut.headOption.map(_._2).getOrElse(0L)
      // tail matching mass (r18, ADVICE r17) — only when a tail exists:
      // total postings minus the kept table's mass, distinct-token count
      // via the vocab relation, and a deterministic hash-ordered sample
      // of tail tokens for the request-time substring-match fraction
      val (tailToks, tailMass, sample) =
        if (cut.isEmpty) (0L, 0L, Array.empty[String])
        else {
          val keptSet = kept.map(_._1).toSeq
          val total = postings.count()
          val distinctToks = vocab.count()
          val smp = vocab.filter(!col("ptok").isin(keptSet: _*))
            .orderBy(xxhash64(col("ptok")), col("ptok"))
            .limit(TailSampleK)
            .collect().map(_.getString(0))
          (distinctToks - kept.length, total - kept.map(_._2).sum, smp)
        }
      val st = KeywordStats(base.count(), kept, tail, tailToks, tailMass,
        sample)
      _kwStats = Some(st)
      st
    }
    def cache(): this.type = { all.foreach(_.cache()); this }
    /** Force materialization (so serving calls never pay the build). */
    def materialize(): this.type =
      { all.foreach(_.count()); collectStats(); this }
    def unpersist(): Unit = all.foreach(_.unpersist())
  }

  /** Build the corpus-side index relations. `vocabParallelism` pins the
    * partition count of the vocabulary relations — they feed the
    * substring nested-loop probe, whose parallelism would otherwise be
    * whatever AQE coalesces the distinct to (one task).
    */
  def buildIndex(memories: DataFrame,
      vocabParallelism: Int = 0): RecallIndex = {
    val spark = memories.sparkSession
    val par = if (vocabParallelism > 0) vocabParallelism
      else spark.sparkContext.defaultParallelism
    val base = Recall.baseFilter(memories, RecallRequest())
    val lc = lower(col("content"))
    // ONE postings relation for both hit kinds, weight on the row
    // (+2 content token, +1 tag): the per-request probe then runs a single
    // vocabulary NLJ and a single postings join instead of one per kind
    val contentPostings = base.select(col("id"),
      explode(array_distinct(TextFunctions.tokens(lc))).as("ptok"),
      lit(2).as("w"))
    val tagPostings = base.select(col("id"), explode(col("tags")).as("ptok"),
      lit(1).as("w"))
    val postings = contentPostings.unionByName(tagPostings)
    val vocab = postings.select(col("ptok")).distinct().repartition(par)
    // narrow projections the per-request joins stream against: computing
    // lower(content) / the NUL-joined tag string once at index time keeps
    // them off the per-request critical path
    val baseKw = base.select(col("id"), lower(col("content")).as("_lc"),
      concat_ws("\u0000", col("tags")).as("_tags_str"),
      col("importance"), col("timestamp"))
    val baseHydrate = base.select(col("id"), col("content"), col("timestamp"),
      col("importance"), col("confidence"), col("tags"), col("metadata"),
      col("relevance_score"))
    RecallIndex(base, postings, vocab, baseKw, baseHydrate)
  }

  /** Estimated (qid, id) pair fan-out of the batch keyword channel's
    * INDEX form — the KeywordStageProbe formula,
    * Σ_t df(t) × queries_sharing(t): each query token t materializes one
    * row per posting of every corpus token containing it, per query that
    * shares it, through the `hits ⋈ qtok` join and into the per-(qid, id)
    * aggregate shuffle (measured 10⁸ pairs / ~39 s of a 62 s request at
    * 10⁶ docs × 100 queries sharing two corpus-wide tokens). Computed
    * against the bounded [[KeywordStats.topDf]] table plus the sampled
    * tail matching mass (r18, ADVICE r17): a token outside the table
    * charges its sampled substring-match fraction of the tail's total
    * postings, floored at the `tailDf` single-token allowance — by
    * construction the high-df mass that CAUSES fan-out per matching
    * token is inside the table, and the sample catches a token matching
    * MANY tail tokens at once. Token-less
    * non-trend (phrase-only) queries charge a full corpus pass each
    * (the `emptyTokPairs` fallback). Pure driver arithmetic:
    * |distinct query tokens| × topK substring probes, no Spark job.
    */
  def estimateKeywordPairs(stats: KeywordStats,
      queries: Seq[(Seq[String], Boolean)]): Long = {
    val nonTrend = queries.filterNot(_._2)
    val share = scala.collection.mutable.Map.empty[String, Long]
    nonTrend.foreach(_._1.distinct.foreach(t =>
      share.update(t, share.getOrElse(t, 0L) + 1L)))
    val tokenMass = share.iterator.map { case (tok, nq) =>
      // tail allowance for corpus tokens ⊇ tok OUTSIDE the bounded table
      // (r18, ADVICE r17): rate the token's substring-match fraction
      // against the sampled tail and charge frac × tailPostings, floored
      // at the old single-token tailDf allowance — a token matching many
      // long-tail corpus tokens (e.g. a short substring over a unique-id
      // vocabulary) now charges its real fan-out instead of one token's
      var df = if (stats.tailSample.isEmpty) stats.tailDf
        else {
          var matches = 0
          var s = 0
          while (s < stats.tailSample.length) {
            if (stats.tailSample(s).contains(tok)) matches += 1
            s += 1
          }
          math.max(stats.tailDf,
            math.round(matches.toDouble / stats.tailSample.length *
              stats.tailPostings))
        }
      val top = stats.topDf
      var i = 0
      while (i < top.length) {
        if (top(i)._1.contains(tok)) df += top(i)._2
        i += 1
      }
      df * nq
    }.sum
    tokenMass + stats.corpusRows * nonTrend.count(_._1.isEmpty)
  }

  /** Crossover for [[chooseKeywordForm]], in estimated index-form pairs
    * per scan-form row (scan rows = corpusRows × non-trend queries).
    *
    * r18 re-pin (VERDICT r17 item 6): the original 0.5 was set from two
    * regimes measured FAR from the boundary (ratios ~2.0 and ~0.0). The
    * boundary sweep (tools.KeywordFormProbe sweep mode, 200k docs × 100
    * queries, a shared token carried by a tunable doc fraction p so the
    * estimated ratio ≈ p — the estimate tracked p exactly at every
    * point) measured, best-of-2 interleaved end-to-end seconds:
    *
    *   ratio  0.000  0.005  0.01  0.02  0.05  0.10  0.20  0.35  0.50  1.0
    *   index   3.07   3.48  3.67  4.12  4.65  5.15  6.70  8.21  9.48 12.6
    *   scan    3.26   3.38  3.34  3.69  3.96  4.12  3.71  4.50  4.26  4.8
    *
    * The scan pass is ~flat in ratio (one corpus pass) while the index
    * form's pair fan-out grows linearly, so the forms cross at ratio
    * ≈ 0.005 — the index form only wins on near-pure rare-token
    * workloads where it skips the corpus pass entirely. 0.01 splits the
    * measured boundary: picking "wrong" inside [0.005, 0.02] costs ≤10%
    * either way, while the old 0.5 left scan-winning regimes (1.2-1.8×
    * at ratios 0.05-0.35) on the slow form.
    */
  val KeywordScanCrossover: Double = 0.01

  /** Pick the batch keyword form for `keywordForm = "auto"` from the
    * index's own persisted stats: `"scan"` when the estimated index-form
    * pair fan-out exceeds [[KeywordScanCrossover]] pairs per scan row,
    * `"index"` otherwise. Both forms are bitwise-equal (KeywordFormProbe
    * pins it), so this is a COST decision only. Driver arithmetic — adds
    * zero Spark jobs to the request (KeywordAutoFormSpec pins that too).
    */
  def chooseKeywordForm(stats: KeywordStats,
      queries: Seq[(Seq[String], Boolean)]): String = {
    val nonTrend = queries.count(!_._2)
    if (nonTrend == 0) "index" // keyword channel won't run; keep default
    else {
      val scanRows = stats.corpusRows.toDouble * nonTrend
      val est = estimateKeywordPairs(stats, queries).toDouble
      if (scanRows > 0 && est / scanRows > KeywordScanCrossover) "scan"
      else "index"
    }
  }

  /** IVF pre-filter option for [[batchRecall]]'s vector channel (r16,
    * VERDICT r15 item 1 — the at-scale serving path the r10 scaladoc
    * promised): the persisted [[graft.operators.IvfIndex]] at `path`
    * replaces the corpus x queries cosine scan. Per query the quantizer
    * ranks `nprobe` cells DRIVER-side against the collected centroid table
    * (a parameter read), and the candidate scan reads ONLY the probed
    * cells' parquet partitions — `PartitionFilters: cell IN (...)` static
    * pruning — so vector-channel I/O shrinks by ~nprobe/2^cellBits at any
    * corpus size while the overfetch/scoring tail is structurally
    * unchanged. At nprobe = cell count the candidate set is the full
    * corpus and results are bitwise the brute-force channel's
    * (BatchRecallIvfSpec pins this, the q_sim_ivf_topk doctrine).
    *
    * Contract: build the index over the SAME filtered corpus the recall
    * base scans ([[buildVectorIndex]]). Rows that left the corpus after
    * the last index build waste overfetch slots but cannot surface —
    * hydration inner-joins the live base (the standard ANN staleness
    * trade; Qdrant-side deletes behave the same way in the reference).
    */
  final case class IvfChannel(path: String, nprobe: Int)

  /** PQ-compressed option for [[batchRecall]]'s vector channel (r17,
    * VERDICT r16 item 5): at the 100 TB design point the fp32
    * assignments relation the [[IvfChannel]] scans is exactly what the
    * [[graft.operators.PqIndex]] tier exists to shrink (~32x: m
    * single-byte codes per vector instead of dim fp32s). Per query the
    * same driver-side quantizer contract probes `nprobe` cells, the
    * query's m x ksub ADC dot-product table is computed on the driver
    * and PLANTED on the request rows (a bounded parameter, like the
    * probed cells), candidates ADC-score inside the pruned cell
    * partitions with m array lookups per row, the top
    * `overfetch · refine` per query re-rank EXACTLY against the live
    * base's fp32 embeddings, and everything downstream of
    * (qid, id, channel_score) is the unchanged brute tail.
    *
    * Accuracy contract (the FAISS IVFPQ+refine shape): returned scores
    * are always FULL precision (the refine step computes exact cosine),
    * so ranking among returned ids is exact; recall depends on the ADC
    * candidate cut — at nprobe = all cells and
    * overfetch · refine >= corpus the channel is bitwise the brute one
    * (PqChannelSpec pins it), and on a clustered corpus a small nprobe
    * keeps recall@10 high while reading ~nprobe/cells of a much smaller
    * relation (raw 16-32x at dim 32-64; measured 5.8x ON DISK at dim 32
    * where per-row id overhead and parquet fp32 compression mute it —
    * IvfServeScaleProbe's bytes gauge).
    *
    * Failure mode to know (IvfServeScaleProbe, r17): a corpus of
    * REPEATED vector patterns with an undersized codebook (64 identical
    * clusters at ksub=16) collapses distinct clusters onto shared codes;
    * ADC scores then tie EXACTLY and the deterministic asc-id cut fills
    * the candidate set with wrong-cluster rows whose ids are globally
    * smaller (measured overlap@5 = 0.000). The cure is codebook
    * resolution, not the plan: ksub=32 + refine=16 restored the probe's
    * overlap. Real continuous embeddings rarely tie, but size ksub to
    * the corpus' pattern multiplicity — [[buildPqVectorIndex]]'s default
    * is ksub=32 since r18 (VERDICT r17) so the DEFAULT build stays out
    * of the measured trap, and `PqIndex.build` writes a
    * CODE_COLLISION_ADVISORY marker when a full code spans multiple
    * coarse cells (distinct directions colliding onto one code — the
    * exact-tie hazard, detected at build time).
    */
  final case class PqChannel(path: String, nprobe: Int, refine: Int = 4)

  /** Ceiling on the per-plan ADC LUT literal (see the chunk guard in
    * [[batchRecall]]'s PQ branch): query batches whose nq · m · ksub · 8
    * bytes exceed this are split into bounded sub-batches whose channel
    * outputs union — bitwise-invisible (the channel is per-qid) but it
    * keeps task binaries and the per-chunk refine broadcast a few MB at
    * ANY batch size. Var (not val) only so the spec can exercise the
    * chunked path at test scale without a 2,000-query fixture being the
    * minimum.
    */
  @volatile var PqLutChunkBytes: Long = 4L << 20

  /** Build the PQ twin of [[buildVectorIndex]]: the recall base projected
    * to (id, vec_id, embedding) — `vec_id` is the deterministic numeric
    * surrogate the sub-codebook k-means seeds from — encoded and
    * cell-partitioned by [[graft.operators.PqIndex.build]].
    *
    * Embeddings are L2-NORMALIZED before encoding: the channel's
    * candidate cut ranks by the ADC DOT product, but the brute channel
    * it stands in for ranks by COSINE — on a corpus whose clusters carry
    * different norms an unnormalized code table systematically promotes
    * large-norm wrong-cluster candidates over the query's own cluster
    * (the FAISS cosine doctrine: index normalized vectors, search with
    * inner product). Cosine is scale-invariant, so cell routing and the
    * exact fp32 refine (which reads the LIVE unnormalized base) are
    * unaffected.
    */
  def buildPqVectorIndex(memories: DataFrame, path: String, m: Int = 8,
      ksub: Int = 32, cellBits: Int = graft.operators.IvfIndex.DefaultCellBits,
      iters: Int = 4): Unit = {
    val norm = sqrt(aggregate(col("embedding"),
      lit(0.0), (acc, x) => acc + x * x))
    val base = Recall.baseFilter(memories, RecallRequest())
      .select(col("id"), xxhash64(col("id")).as("vec_id"),
        transform(col("embedding"),
          x => (x / greatest(norm, lit(1e-12))).cast("float"))
          .as("embedding"))
    graft.operators.PqIndex.build(base, path, cellBits, m, ksub, iters)
  }

  /** Build/refresh the vector-channel index for [[IvfChannel]]: the
    * recall BASE (archived/invalidated rows excluded, matching
    * [[buildIndex]]'s corpus) projected to (id, embedding). `kmeansK > 0`
    * trains a k-means coarse quantizer (the clustered-corpus choice);
    * otherwise the data-independent sign-bucket split.
    */
  def buildVectorIndex(memories: DataFrame, path: String, kmeansK: Int = 0,
      cellBits: Int = graft.operators.IvfIndex.DefaultCellBits,
      iters: Int = 5): Unit = {
    val base = Recall.baseFilter(memories, RecallRequest())
      .select(col("id"), col("embedding"))
    if (kmeansK > 0)
      // KMeans.fitCentroids seeds from the k lowest vec_id rows; memories
      // key on string ids, so derive a deterministic numeric surrogate
      // (hash order is as good as any for seeding). It rides into the
      // stored assignments — 8 bytes/row next to the embedding, noise
      graft.operators.IvfIndex.buildKMeans(
        base.withColumn("vec_id", xxhash64(col("id"))), path, kmeansK, iters)
    else graft.operators.IvfIndex.build(base, path, cellBits)
  }

  /** Column contract of a PLANTED vector-candidate relation — the
    * [[PreparedRecall]] IVF serving shape. The prepared template must stay
    * request-value-independent, so the probed cells cannot be baked into
    * its scan as literals; instead the handle runs the partition-pruned
    * candidate scan per call ([[ivfCandidateRows]], a bounded top-overfetch
    * job) and swaps the rows into this relation, exactly as it swaps the
    * request relation.
    */
  val VectorCandCols: Seq[String] = Seq("qid", "id", "channel_score")

  /** One request's IVF vector-channel candidates, computed eagerly: probe
    * cells driver-side against the collected quantizer, scan ONLY those
    * cells (static partition pruning), keep the top `overfetch` by the
    * channel's exact cut key (score desc, id asc — TakeOrderedAndProject,
    * no shuffle). Returns plantable (qid, id, channel_score) rows.
    */
  def ivfCandidateRows(spark: org.apache.spark.sql.SparkSession,
      iv: IvfChannel, qz: graft.operators.IvfIndex.Quantizer, qid: Any,
      qvec: Array[Float], overfetch: Int, roundScores: Boolean,
      assignments: Option[DataFrame] = None)
      : Seq[org.apache.spark.sql.Row] = {
    val cells = graft.operators.IvfIndex.probeCellsLocal(qz, qvec, iv.nprobe)
    val score = cosineSim(col("embedding"), typedlit(qvec))
    // `assignments`: the resolved index relation, held by the serving
    // handle next to the quantizer (r19, VERDICT r18 item 4) — re-reading
    // per call re-lists files and re-reads footers, a real per-request
    // RPC fan-out against a 100 TB cell-partitioned index. The per-call
    // cell `isin` filter below still prunes partitions statically either
    // way. Freshness contract: like the quantizer, the relation snapshots
    // the index at handle build — a rebuilt index requires a new handle
    // (the IvfIndex variant-tag cache precedent).
    assignments.getOrElse(spark.read.parquet(s"${iv.path}/assignments"))
      .filter(col("cell").isin(cells: _*))
      .select(col("id"),
        (if (roundScores) graft.functions.round4(score) else score)
          .as("channel_score"))
      .orderBy(desc("channel_score"), asc("id"))
      .limit(overfetch)
      .collect()
      .map(r => org.apache.spark.sql.Row(qid, r.get(0), r.getDouble(1)))
      .toSeq
  }

  /** One request's PQ vector-channel candidates (r18, VERDICT r17 item 1)
    * — the [[pqCandidateRows]] twin of [[ivfCandidateRows]] for the
    * [[PreparedRecall]] serving handle: probe cells driver-side, compute
    * the query's m × ksub ADC table on the driver (both bounded
    * parameters), ADC-score ONLY the probed cells' code partitions
    * (static partition pruning, m byte-sized lookups per row via the
    * codegen'd kernel), keep the top `overfetch · refine` by the
    * approximate cut key, then re-rank those EXACTLY against the live
    * base's fp32 embeddings — a bounded `IN` probe of the cached base —
    * and return the top `overfetch` plantable (qid, id, channel_score)
    * rows. At the 100 TB point the fp32 relation is what this avoids
    * scanning: per request the code scan reads ~nprobe/cells of a
    * 16-32× smaller relation and fp32 I/O is `overfetch · refine` rows.
    *
    * `codebooks` is the bounded build-time parameter ([[graft.operators.
    * PqIndex.readCodebooks]]) — the caller loads it once per handle, not
    * per request. `live` must be the SAME filtered corpus the brute
    * channel scans (the recall base) so nprobe = all cells + covering
    * refine is bitwise the brute channel (PreparedRecallSpec pins it).
    */
  def pqCandidateRows(spark: org.apache.spark.sql.SparkSession,
      pqc: PqChannel, qz: graft.operators.IvfIndex.Quantizer,
      codebooks: Seq[Seq[Seq[Double]]], live: DataFrame, qid: Any,
      qvec: Array[Float], overfetch: Int, roundScores: Boolean,
      assignments: Option[DataFrame] = None)
      : Seq[org.apache.spark.sql.Row] = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty &&
      codebooks.head.head.nonEmpty,
      s"no codebooks at ${pqc.path} — build the PQ index first")
    val m = codebooks.size
    val dsub = codebooks.head.head.size
    // routing/LUT view of the query: zero-pad/truncate to the index dim
    // (the CosineSimilarity zero-pad doctrine). A dim-mismatched query —
    // e.g. the prepared handle's placeholder-embedded template marker —
    // degrades the approximate cut's recall, never correctness: the
    // refine below is exact on the ORIGINAL vector.
    val rq = if (qvec.length == m * dsub) qvec
      else java.util.Arrays.copyOf(qvec, m * dsub)
    val cells = graft.operators.IvfIndex.probeCellsLocal(qz, rq, pqc.nprobe)
    val lut: Seq[Seq[Double]] = codebooks.zipWithIndex.map {
      case (book, j) => book.map { c =>
        var dot = 0.0
        var t = 0
        while (t < dsub) { dot += rq(j * dsub + t) * c(t); t += 1 }
        dot
      }
    }
    // resolved-once relation from the handle when supplied (see
    // ivfCandidateRows — same per-call listing-RPC rationale, same
    // rebuild-requires-new-handle freshness contract)
    val candidateIds = assignments
      .getOrElse(spark.read.parquet(s"${pqc.path}/assignments"))
      .filter(col("cell").isin(cells: _*))
      .withColumn("asim", graft.functions.VectorFunctions
        .adcScore(col("code"), typedlit(lut)))
      .orderBy(desc("asim"), asc("id"))
      .limit(overfetch * math.max(pqc.refine, 1))
      .select(col("id"))
      .collect().map(_.get(0)).toSeq
    val score = cosineSim(col("embedding"), typedlit(qvec))
    live.select(col("id"), col("embedding"))
      .filter(col("id").isin(candidateIds: _*))
      .select(col("id"),
        (if (roundScores) graft.functions.round4(score) else score)
          .as("channel_score"))
      .orderBy(desc("channel_score"), asc("id"))
      .limit(overfetch)
      .collect()
      .map(r => org.apache.spark.sql.Row(qid, r.get(0), r.getDouble(1)))
      .toSeq
  }

  def batchRecall(memories: DataFrame, edges: DataFrame, queries: DataFrame,
      limit: Int = 10, weights: Scoring.Weights = Scoring.Weights(),
      now: Timestamp = Timestamp.valueOf("2026-01-01 00:00:00"),
      roundScores: Boolean = false,
      index: Option[RecallIndex] = None,
      singleRequest: Boolean = false,
      ivf: Option[IvfChannel] = None,
      vectorCandidates: Option[DataFrame] = None,
      keywordForm: String = "auto",
      pq: Option[PqChannel] = None): DataFrame = {
    require(ivf.isEmpty || pq.isEmpty,
      "ivf and pq are alternative vector-channel indexes — supply one")
    val overfetch = math.min(limit * Recall.OverfetchFactor, Recall.OverfetchCap)
    val spark = memories.sparkSession
    val q = requestRelation(queries)
    val idx = index.getOrElse(buildIndex(memories))
    val base = idx.base

    // ---- vector channel: one corpus x queries similarity pass. Project to
    // (qid, id, score) BEFORE the per-qid window: the shuffle then moves
    // 3 narrow columns instead of the whole row (content + two embedding
    // arrays) — measured 3.3x faster; Catalyst does not prune through the
    // cached relation + broadcast-nested-loop + window combination.
    def rounded(c: Column): Column =
      if (roundScores) graft.functions.round4(c) else c
    // `singleRequest` (the PreparedRecall serving shape): the request
    // relation is ONE row, so every per-qid window cut is equivalent to a
    // global orderBy + limit — which Spark plans as TakeOrderedAndProject
    // (per-partition top-k, driver merge, NO exchange) instead of a
    // shuffle + sort + row_number stage. Worth ~1 stage boundary per
    // channel on the serving critical path; the windowed form stays the
    // batch default because it is the only shape that scales to many qids.
    def cutPerQid(df: DataFrame, keys: Seq[Column], n: Int): DataFrame =
      if (singleRequest) df.orderBy(keys: _*).limit(n)
      else {
        val w = Window.partitionBy(col("qid")).orderBy(keys: _*)
        df.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= n).drop("_rn")
      }
    // candidate generation: brute corpus x queries scan by default; the
    // IVF-prefiltered scan when an index is supplied (see [[IvfChannel]]).
    // Everything downstream of (qid, id, channel_score) is IDENTICAL —
    // same rounding, same cut keys — so the index changes I/O, not
    // semantics, and nprobe=all is bitwise the brute channel.
    val vecScored = (vectorCandidates, ivf, pq) match {
      case (Some(cand), _, _) =>
        // pre-computed (planted) candidates — already scored, rounded, and
        // generated under partition pruning by ivfCandidateRows; the
        // cut/select tail below re-applies the same keys idempotently
        cand.select(col("qid"), col("id"), col("channel_score"))
      case (None, None, None) =>
        base.crossJoin(broadcast(q))
          .select(col("qid"), col("id"),
            rounded(cosineSim(col("embedding"), col("qvec"))).as("channel_score"))
      case (None, None, Some(pqc)) =>
        // PQ-compressed candidates (see [[PqChannel]]): probe cells and
        // precompute each query's ADC table DRIVER-side (both bounded
        // parameters), ADC-score the pruned code partitions with m array
        // lookups per row, cut to overfetch x refine per qid by the
        // approximate score, then re-rank the survivors EXACTLY against
        // the live base's fp32 vectors. Only the (tiny) refined candidate
        // set ever touches an embedding array; the corpus-wide scan reads
        // m bytes of code per row instead of dim fp32s.
        import scala.jdk.CollectionConverters._
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val qz = graft.operators.IvfIndex.loadQuantizer(spark, pqc.path)
        val codebooks =
          graft.operators.PqIndex.readCodebooks(spark, pqc.path)
        // named errors before any .head dereference (ADVICE r17): an
        // empty/corrupt codebooks table dies here with the path, not with
        // a bare NoSuchElementException three lines down
        require(codebooks.nonEmpty && codebooks.head.nonEmpty &&
          codebooks.head.head.nonEmpty,
          s"no codebooks at ${pqc.path} — build the PQ index first")
        val m = codebooks.size
        val dsub = codebooks.head.head.size
        val ksub = codebooks.head.size
        val qRows = q.select(col("qid"), col("qvec")).collect()
        val emptyCand = spark.createDataFrame(Seq.empty[Row].asJava,
          StructType(Seq(
            StructField("qid", q.schema("qid").dataType),
            StructField("id", base.schema("id").dataType),
            StructField("channel_score", DoubleType))))
          .select(col("qid"), col("id"), col("channel_score"))
        // one chunk's candidate pipeline: everything downstream of the
        // ADC cut is per-qid, so chunking the query batch is semantically
        // invisible (PqChannelSpec pins a chunked batch bitwise-equal to
        // the single-chunk form)
        def pqChunk(chunk: Array[Row]): DataFrame = {
          val luts: Seq[Seq[Seq[Double]]] = chunk.toSeq.map { r =>
            val qv = r.getSeq[Float](1).toArray
            require(qv.length == m * dsub,
              s"query dim ${qv.length} != PQ index dim ${m * dsub}")
            // lut(j)(c) = <qvec's j-th subvector, codebook(j)(c)> — the
            // asymmetric-distance table (Jégou et al. 2011 §III.B)
            codebooks.zipWithIndex.map { case (book, j) =>
              book.map { c =>
                var dot = 0.0
                var t = 0
                while (t < dsub) { dot += qv(j * dsub + t) * c(t); t += 1 }
                dot
              }
            }
          }
          val probeRows = chunk.zipWithIndex.flatMap { case (r, qidx) =>
            graft.operators.IvfIndex
              .probeCellsLocal(qz, r.getSeq[Float](1).toArray, pqc.nprobe)
              .map(cell => Row(r.get(0), cell, qidx))
          }
          // zero-query request: nothing to probe — an empty candidate
          // relation short-circuits the code scan entirely (ADVICE r17)
          if (probeRows.isEmpty) emptyCand
          else {
          // the scanned row carries ONLY (qid, qidx): the per-query
          // m × ksub tables ride as ONE literal indexed by qidx inside
          // the codegen'd kernel (r18 — a per-row `lut` column
          // materialized ~2 KB onto every joined row, gigabytes through
          // the scoring stage and the per-qid cut's shuffle at 10⁶; see
          // AdcScoreAt), and the query vector joins back AFTER the cut
          // from a request-sized relation.
          val qcells = spark.createDataFrame(probeRows.toSeq.asJava,
            StructType(Seq(
              StructField("qid", q.schema("qid").dataType),
              StructField("cell", LongType),
              StructField("qidx", IntegerType))))
          val allCells = probeRows.map(_.getLong(1)).distinct.toSeq
          val adc = spark.read.parquet(s"${pqc.path}/assignments")
            // literal IN before the cast — static partition pruning, the
            // IvfChannel doctrine
            .filter(col("cell").isin(allCells: _*))
            .select(col("cell").cast("long").as("cell"), col("id"),
              col("code"))
            .join(broadcast(qcells), Seq("cell"))
            // codegen'd ADC kernel (r18, VERDICT r17 item 2) — m array
            // lookups + adds per row, bitwise-equal to the interpreted
            // zip_with fold it replaces (PqChannelSpec pins the swap)
            .withColumn("asim", graft.functions.VectorFunctions
              .adcScoreAt(col("code"), col("qidx"), typedlit(luts)))
          // the refine candidate set is bounded PER QUERY by parameters
          // (≤ overfetch · refine rows each); the broadcast total scales
          // with the batch's query count — which the LUT chunk guard
          // below also bounds (≤ PqLutChunkBytes of queries per plan), so
          // one chunk's broadcast stays a few MB at any corpus size and
          // the exact refine streams the cached base instead of shuffling
          // it into a sort-merge join (the one unbounded relation here)
          cutPerQid(adc, Seq(desc("asim"), asc("id")),
            overfetch * math.max(pqc.refine, 1))
            .select(col("qid"), col("id"))
            .join(broadcast(q.select(col("qid"), col("qvec"))), Seq("qid"))
            .hint("broadcast")
            .join(base.select(col("id"), col("embedding")), Seq("id"))
            .select(col("qid"), col("id"),
              rounded(cosineSim(col("embedding"), col("qvec")))
                .as("channel_score"))
          }
        }
        // LUT-literal growth guard (r19, VERDICT r18 wrong-item 1): the
        // per-plan literal is nq · m · ksub doubles — ~2 KB/query at the
        // bench point, fine at nq=100, but a 10⁴-query batch would embed
        // ~20 MB into every serialized task binary. Chunk the query batch
        // so each plan's literal stays under PqLutChunkBytes and union
        // the per-chunk outputs (a per-qid channel is chunk-invariant).
        val perQueryBytes = math.max(1L, m.toLong * ksub * 8L)
        val chunkQueries = math.max(1L,
          PqLutChunkBytes / perQueryBytes).toInt
        if (qRows.length <= chunkQueries) pqChunk(qRows)
        else qRows.grouped(chunkQueries).map(pqChunk)
          .reduce(_ union _)
      case (None, Some(iv), _) =>
        import scala.jdk.CollectionConverters._
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val qz = graft.operators.IvfIndex.loadQuantizer(spark, iv.path)
        // probe per query against the driver-held quantizer; plant the
        // (qid, cell, qvec) relation — nprobe rows per query — so ONE
        // broadcast equi-join on cell pairs each candidate with its
        // query's vector (a doc lives in exactly one cell, so (qid, id)
        // stays unique)
        val probeRows = q.select(col("qid"), col("qvec")).collect().flatMap { r =>
          val qv = r.getSeq[Float](1)
          graft.operators.IvfIndex.probeCellsLocal(qz, qv.toArray, iv.nprobe)
            .map(c => Row(r.get(0), c, qv))
        }
        val qcells = spark.createDataFrame(probeRows.toSeq.asJava,
          StructType(Seq(
            StructField("qid", q.schema("qid").dataType),
            StructField("cell", LongType),
            StructField("qvec", ArrayType(FloatType, containsNull = false)))))
        val allCells = probeRows.map(_.getLong(1)).distinct.toSeq
        spark.read.parquet(s"${iv.path}/assignments")
          // literal IN over the union of probed cells BEFORE any cast:
          // STATIC partition pruning — unprobed cell partitions are never
          // read (the cast below would otherwise wrap the partition column
          // and depend on UnwrapCastInBinaryComparison to recover it)
          .filter(col("cell").isin(allCells: _*))
          .select(col("cell").cast("long").as("cell"), col("id"), col("embedding"))
          .join(broadcast(qcells), Seq("cell"))
          .select(col("qid"), col("id"),
            rounded(cosineSim(col("embedding"), col("qvec"))).as("channel_score"))
    }
    val vec = cutPerQid(vecScored,
      Seq(desc("channel_score"), asc("id")), overfetch)
      .select(col("qid"), col("id"), lit("vector").as("match_type"),
        col("channel_score"))

    // ---- keyword channel via an INVERTED TOKEN INDEX (+2 per contained
    // token, +1 tag hit, phrase bonus, normalized by the per-qid max raw
    // score). Instead of a query x corpus cross product, the corpus is
    // exploded once into (doc, token) postings; the query tokens meet the
    // corpus only through (a) a vocabulary x query-token substring match
    // (vocab rows x ~|distinct query tokens|, broadcast nested loop — linear
    // in vocabulary size) and (b) equi-joins on the matched token. Substring
    // semantics are preserved exactly: a whitespace-free token is contained
    // in the content iff it is contained in some whitespace token of the
    // content. Total work is linear in postings — no corpus x queries stage.
    // Tag membership uses a NUL-separated concat (tokens never contain
    // NUL; the concat lives in idx.baseKw).
    val lc = lower(col("content"))
    // ONE driver-side read of the (bounded, LocalRelation) request tokens:
    // it feeds both the planted token relations below and the auto
    // keyword-form estimate — collecting from a LocalRelation is an
    // executeCollect, no Spark job either way
    val reqToks: Seq[(Any, Seq[String], Boolean)] =
      q.select(col("qid"), col("qtokens"), col("is_trend")).collect().toSeq
        .map(r => (r.get(0), r.getSeq[String](1).toSeq, r.getBoolean(2)))
    val (qtok, qtokDistinct) = requestTokenRelationsFromSeq(spark,
      q.schema("qid").dataType, reqToks.map(t => (t._1, t._2)))
    // SINGLE-REQUEST keyword shape: the inverted-index probe below costs
    // ~6 sequential Spark jobs per call (vocab NLJ -> postings join ->
    // distinct -> token join -> aggregate -> candidate broadcast) — the
    // right trade when N queries amortize one index pass, but pure
    // scheduling overhead when N = 1 (measured: ~60% of a served call's
    // wall clock is job round-trips). A single request instead scans the
    // cached narrow (id, _lc, _tags_str) projection ONCE with the SAME
    // per-token arithmetic as the single path (Recall.keywordChannel:
    // +2 per token in content, +1 per token in any tag, additive phrase
    // bonus, theoretical-max normalization): one LocalRelation broadcast,
    // zero extra jobs. Alnum query tokens cannot span the NUL tag
    // separator or non-alnum content chars, so contains() on the joined
    // projections is exactly the per-token/per-tag membership the index
    // computes. Token-less phrase-only queries fold in naturally (the
    // aggregate over an empty token array is 0; the phrase bonus still
    // fires), absorbing the emptyTokPairs fallback branch.
    val kwSingleRaw =
      aggregate(col("qtokens"), lit(0), (acc, t) => acc +
        when(col("_lc").contains(t), 2).otherwise(0) +
        when(col("_tags_str").contains(t), 1).otherwise(0)) +
      when(length(col("phrase")) >= 3,
        when(col("_lc").contains(col("phrase")), 2).otherwise(0) +
          when(col("_tags_str").contains(col("phrase")), 1).otherwise(0))
        .otherwise(0)
    val kwSingle = cutPerQid(
      idx.baseKw
        .crossJoin(broadcast(q.filter(!col("is_trend"))
          .select(col("qid"), col("qtokens"), col("phrase"), col("kw_max"))))
        .withColumn("raw", kwSingleRaw)
        .filter(col("raw") > 0)
        .withColumn("channel_score",
          rounded(least(lit(1.0), col("raw").cast("double") / col("kw_max")))),
      Seq(desc("channel_score"), desc("importance"), desc("timestamp"),
        asc("id")), overfetch)
      .select(col("qid"), col("id"), lit("keyword").as("match_type"),
        col("channel_score"))
    // vocabulary-first: the substring NLJ runs over distinct tokens (vocab),
    // not raw postings; the small (ctok, tok) match table then broadcasts
    // back onto the postings — postings are never shuffled. The vocab
    // relations carry an explicit repartition (buildIndex): AQE would
    // otherwise coalesce the distinct to ONE partition and serialize the
    // vocabulary x query-token contains-NLJ (the chain's heaviest compute)
    // onto a single task.
    val tokMatches = idx.vocab
      .join(broadcast(qtokDistinct), col("ptok").contains(col("tok")))
    val hits = idx.postings.join(broadcast(tokMatches), Seq("ptok"))
      .select(col("id"), col("tok"), col("w"))
    // a query token counts once per doc per KIND (content/tag), however
    // many corpus tokens contain it — a content hit (w=2) and a tag hit
    // (w=1) both survive and sum to 3; duplicates within a kind collapse.
    // The dedup and the sum fuse into ONE aggregation (collect_set of the
    // (tok, w) pairs, summed by a higher-order fold): collect_set
    // partial-aggregates map-side and the set is bounded by
    // 2 x |query tokens| per (qid, id), so this is one shuffle of
    // pre-deduped small sets where distinct() + groupBy was two full
    // shuffles of the raw hits relation (measured ~15% of batch-100q).
    val tokHits = hits
      .join(broadcast(qtok), Seq("tok"))
      .groupBy(col("qid"), col("id"))
      .agg(aggregate(collect_set(struct(col("tok"), col("w"))), lit(0L),
        (acc, x) => acc + x.getField("w")).as("tok_raw"))
    // Phrase-bonus candidates: a phrase hit implies every remaining query
    // token hits (each is a substring of the phrase), so any (qid, id) with
    // raw > 0 already appears in tokHits — except queries whose tokens were
    // ALL filtered out (short/stopword); those fall back to a (tiny) x corpus
    // scan.
    val emptyTokPairs = base.select(col("id"))
      .crossJoin(broadcast(q.filter(size(col("qtokens")) === 0 && !col("is_trend"))
        .select(col("qid"))))
      .withColumn("tok_raw", lit(0L))
    // phrase bonus is ADDITIVE (+2 content AND +1 tag can both fire,
    // `runtime_recall_helpers.py:671-674`), only for phrases >= 3 chars;
    // normalization is by the per-query THEORETICAL max (broadcast as a
    // column on the request relation), clamped — no per-qid max window, one
    // less shuffle than the observed-max variant and reference-faithful
    // In the PreparedRecall serving shape (singleRequest) the candidate
    // side is provably tiny (one query x its matched docs) — broadcast it
    // so the join streams the (cached) corpus projection. In BATCH mode
    // the same hint is unsafe at scale: tokHits is O(docs matching any
    // query token) and emptyTokPairs is the FULL corpus x every token-less
    // query, so forcing a broadcast would bypass Spark's size threshold
    // and OOM the driver at the 100 TB design point (ADVICE r7). Let the
    // optimizer (+AQE) pick the strategy there.
    val kwCand = tokHits.unionByName(emptyTokPairs)
    val kwAll = (if (singleRequest) kwCand.hint("broadcast") else kwCand)
      .join(idx.baseKw, Seq("id"))
      .join(broadcast(q.select(col("qid"), col("phrase"), col("kw_max"))), Seq("qid"))
      .withColumn("pb",
        when(length(col("phrase")) >= 3,
          when(col("_lc").contains(col("phrase")), 2).otherwise(0) +
            when(col("_tags_str").contains(col("phrase")), 1).otherwise(0))
          .otherwise(0))
      .select(col("qid"), col("id"), col("kw_max"),
        col("importance"), col("timestamp"),
        (col("tok_raw") + col("pb")).as("raw"))
      .filter(col("raw") > 0)
    // the keyword cut mirrors the SINGLE path's exact sort key
    // (Recall.keywordChannel: score desc, importance desc, timestamp desc,
    // id asc) — `wq`'s (score, id) key diverges on score ties, which
    // roundScores quantization makes common
    lazy val kwIndexed = cutPerQid(
      kwAll.withColumn("channel_score",
        rounded(least(lit(1.0), col("raw").cast("double") / col("kw_max")))),
      Seq(desc("channel_score"), desc("importance"), desc("timestamp"),
        asc("id")), overfetch)
      .select(col("qid"), col("id"), lit("keyword").as("match_type"),
        col("channel_score"))
    // mode split (see kwSingle's comment): the index amortizes over many
    // queries; a single request takes the one-scan expression form.
    // `keywordForm` (r16) overrides the split: the KeywordStageProbe
    // decomposition showed the index form's cost at corpus scale is the
    // COMMON-TOKEN FAN-OUT — `hits ⋈ qtok` materializes
    // O(sum_t df(t) x queries_sharing(t)) (qid, id) pairs through a
    // near-unique-key aggregate (10^8 pairs at 10^6 docs x 100 queries
    // sharing two corpus-wide tokens) — while the scan form is one
    // corpus pass with per-row token arithmetic and NO pair
    // materialization (both expressions are qid-generic and provably
    // compute the same raw score; spec-pinned bitwise-equal; measured
    // 61.7 -> 23.5 s end-to-end, 2.6x, on the million-row fan-out
    // corpus — tools.KeywordFormProbe). "auto" (r17, VERDICT r16 item 1)
    // now SELF-SELECTS when the index carries its build-time keyword
    // stats: [[chooseKeywordForm]] rates the estimated pair fan-out
    // against the scan's row count — pure driver arithmetic over the
    // already-collected request tokens, zero extra Spark jobs
    // (KeywordAutoFormSpec pins the job count). A stats-less ad-hoc
    // index keeps the measured small-corpus default (index form), so
    // the oracle path is plan-identical to r16.
    val kw = keywordForm match {
      case "scan" => kwSingle
      case "index" => kwIndexed
      case "auto" =>
        if (singleRequest) kwSingle
        else idx.kwStats match {
          case Some(st) if chooseKeywordForm(st,
              reqToks.map(t => (t._2, t._3))) == "scan" => kwSingle
          case _ => kwIndexed
        }
      case other => throw new IllegalArgumentException(
        s"keywordForm must be auto|index|scan, got '$other'")
    }

    // ---- Q5 metadata channel: batch twin of Recall.metadataChannel
    // (`runtime_recall_helpers.py:727-868`). Cheap contains-prefilter on the
    // raw JSON against the per-query VALUE terms (a broadcast nested loop —
    // same corpus x requests shape as the vector channel, streaming the
    // cached narrow (id, metadata) projection), deterministic per-qid scan
    // cap by asc id, then the full strong-evidence re-score UDF on the
    // capped survivors ONLY (<= scanCap x |queries| rows — the right
    // UDF-vs-expression boundary).
    val scanCap = math.max(200, math.min(limit * 25, 1000))
    val qMd = q.filter(size(col("md_terms")) > 0)
      .select(col("qid"), col("query").as("_mq"), col("md_terms"))
    val mdScoreUdf = udf((qq: String, json: String) =>
      MetadataScoring.matchScore(qq, json))
    val mdScanned = cutPerQid(
      idx.baseHydrate.select(col("id"), col("metadata"))
        .join(broadcast(qMd),
          exists(col("md_terms"), t => lower(col("metadata")).contains(t))),
      Seq(asc("id")), scanCap)
    val md = cutPerQid(
      mdScanned
        .withColumn("channel_score", rounded(mdScoreUdf(col("_mq"), col("metadata"))))
        .filter(col("channel_score") > 0.0),
      Seq(desc("channel_score"), asc("id")), overfetch)
      .select(col("qid"), col("id"), lit("metadata").as("match_type"),
        col("channel_score"))

    // ---- trending channel for empty/stopword-only queries: importance-
    // ordered browse rows, score := importance — the batch twin of
    // Recall.trendingChannel, cut with the single path's exact sort key
    val trend = cutPerQid(
      base.select(col("id"), col("importance"), col("timestamp"))
        .crossJoin(broadcast(q.filter(col("is_trend")).select(col("qid"))))
        .withColumn("channel_score", rounded(col("importance"))),
      Seq(desc("channel_score"), desc("timestamp"), asc("id")), overfetch)
      .select(col("qid"), col("id"), lit("trending").as("match_type"),
        col("channel_score"))

    // ---- overlap the channel jobs (r20, VERDICT r19 item 3, guide §2.6).
    // Each channel's cut is BOUNDED (≤ |queries| × overfetch rows), but the
    // kw-index chain is ~6 dependency-ordered jobs (vocab NLJ → postings
    // join → aggregate → ...) whose broadcast builds ran strictly after the
    // vector channel's scan inside the single collect — the r19 ProfileSql
    // attribution put ~half the batch wall clock in those sequential
    // builds, and the 8-vs-32-core scaling ratio of 1.8 corroborated the
    // serialization. Materializing the four bounded channel cuts from a
    // small driver thread pool lets the vector/metadata/trending scans
    // back-fill the cores the kw chain's tail leaves idle; the union tail
    // then runs over four tiny checkpointed relations. Rows are identical
    // (the checkpoint is a pass-through and every downstream op is keyed,
    // not order-sensitive). Batch mode only: a single request keeps the
    // lazy one-collect plan (its channels are each one tiny job, and the
    // serving path's TakeOrderedAndProject cuts must stay lazy).
    // GRAFT_BATCH_OVERLAP=0 restores the inline plan (debug/explain aid).
    val overlapChannels = !singleRequest &&
      !sys.env.get("GRAFT_BATCH_OVERLAP").contains("0")
    val Seq(vecC, kwC, mdC, trendC) =
      if (!overlapChannels) Seq(vec, kw, md, trend)
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        try {
          val futs = Seq(vec, kw, md, trend).map(c =>
            scala.concurrent.Future(c.localCheckpoint()))
          futs.map(scala.concurrent.Await
            .result(_, scala.concurrent.duration.Duration.Inf))
        } finally pool.shutdown()
      }

    // ---- union, best score per channel per (qid, id); match_type
    // precedence mirrors the single path (Recall.runSingleQuery):
    // vector > keyword > metadata > trending
    val perId = vecC.unionByName(kwC).unionByName(mdC).unionByName(trendC)
      .groupBy(col("qid"), col("id"))
      .agg(
        max(when(col("match_type") === "vector", col("channel_score"))).as("vector_score"),
        max(when(col("match_type") === "keyword", col("channel_score"))).as("keyword_score"),
        max(when(col("match_type") === "metadata", col("channel_score"))).as("metadata_score"),
        max(when(col("match_type") === "trending", col("channel_score"))).as("trending_score"))
      .withColumn("match_type",
        when(col("vector_score").isNotNull, "vector")
          .when(col("keyword_score").isNotNull, "keyword")
          .when(col("metadata_score").isNotNull, "metadata")
          .otherwise("trending"))

    // ---- hydrate + component scoring (same formulas as Recall.scoreCandidates).
    // Hydration joins only the columns scoring needs — no embedding arrays.
    val hydrated = perId
      .hint("broadcast")
      .join(idx.baseHydrate, Seq("id"))
      .join(broadcast(q), Seq("qid"))
    val ageDays = (unix_timestamp(lit(now)) - unix_timestamp(col("timestamp"))) / 86400.0
    val kwFallback = when(size(col("qtokens")) === 0, 0.0).otherwise(
      aggregate(col("qtokens"), lit(0), (acc, t) =>
        acc + when(lc.contains(t), 1).otherwise(0)).cast("double") / size(col("qtokens")))
    // term-set semantics, same as the single path (Recall.scoreCandidates):
    // the tag component counts query tokens in tags OR metadata terms
    // (`scoring.py:150-153`); exact is whole-query membership in the
    // metadata TERM SET (`scoring.py:155-158` — not a substring probe on
    // raw JSON, which fires on key names / across token boundaries). The
    // scalar term walk runs on the bounded hydrated candidate set only.
    val termsUdf = udf((json: String) => MetadataScoring.collectTerms(json).toSeq)
    val mdTerms = col("_md_terms")
    val termSet = array_union(col("tags"), mdTerms)
    val trendingComp = when(col("match_type") === "trending",
      least(lit(1.0), col("trending_score")))
    val tagScore = when(size(col("qtokens")) === 0, 0.0).otherwise(
      size(array_intersect(col("qtokens"), termSet)).cast("double") /
        size(col("qtokens")))
    val comps = Scoring.ComponentColumns(
      vector = coalesce(col("vector_score"), lit(0.0)),
      keyword = coalesce(col("keyword_score"), trendingComp, kwFallback),
      metadata = coalesce(col("metadata_score"), lit(0.0)),
      relation = lit(0.0),
      tag = tagScore,
      importance = coalesce(col("importance"), lit(0.0)),
      confidence = coalesce(col("confidence"), lit(0.0)),
      recency = Scoring.recency(ageDays),
      exact = when(length(col("qtrim")) > 0 &&
        array_contains(mdTerms, col("qtrim")), 1.0).otherwise(0.0),
      relevance = coalesce(col("relevance_score"), lit(0.0)),
      context = lit(0.0))
    val scored = hydrated
      .withColumn("_md_terms", termsUdf(col("metadata")))
      .withColumn("s_vector", rounded(comps.vector))
      .withColumn("s_keyword", rounded(comps.keyword))
      .withColumn("s_tag", rounded(comps.tag))
      .withColumn("final_score", rounded(Scoring.finalScore(comps, weights)))
      .drop("_md_terms")

    // ---- R1 fingerprint dedup per qid, R2 sort, per-qid top-k
    val fp = TextFunctions.fingerprint(col("content"), 320)
    val wDedup = Window.partitionBy(col("qid"), col("_fp"))
      .orderBy(desc("final_score"), desc("timestamp"), asc("id"))
    val rankKeys = Seq(
      desc("final_score"),
      when(col("match_type") === "vector", 0).otherwise(1).asc,
      desc("importance"), desc("timestamp"), asc("id"))
    // r19: one explicit qid exchange feeds BOTH final windows. The dedup
    // window clusters by (qid, _fp) and the rank window by (qid);
    // hashpartitioning(qid) satisfies both ClusteredDistributions, so the
    // planner inserts no further exchange — previously each window
    // re-shuffled the scored candidate set (2 exchanges -> 1, same rows;
    // the candidate set is bounded by requests x channels x overfetch, so
    // the pre-aggregation this bypasses is irrelevant). Batch mode only:
    // the single-request path cuts with TakeOrderedAndProject instead.
    val preDedup =
      if (singleRequest) scored else scored.repartition(col("qid"))
    val deduped = preDedup
      .withColumn("_fp", when(length(fp) > 0, fp).otherwise(col("id")))
      .withColumn("_dd", row_number().over(wDedup))
      .filter(col("_dd") === 1)
    // single-request: cut with TakeOrderedAndProject, then rank the <= limit
    // survivors with a window over that tiny frame (one 10-row exchange
    // instead of a full-candidate-set sort exchange)
    val ranked =
      if (singleRequest)
        deduped.orderBy(rankKeys: _*).limit(limit)
          .withColumn("rank",
            row_number().over(Window.partitionBy(col("qid")).orderBy(rankKeys: _*)))
      else
        deduped
          .withColumn("rank",
            row_number().over(Window.partitionBy(col("qid")).orderBy(rankKeys: _*)))
          .filter(col("rank") <= limit)
    ranked
      .withColumn("rank", col("rank").cast("long"))
      .select(col("qid"), col("rank"), col("id"), col("final_score"),
        col("match_type"), col("s_vector"), col("s_keyword"), col("s_tag"))
  }
}
