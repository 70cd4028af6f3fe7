package graft.jobs

import graft.operators.{TextAnalysis, TextPolicy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end training-corpus preparation as ONE spark-submit job: the
  * runnable composition of the hygiene operator family — per-document stage
  * attribution (language gate → quality floor → repetition cut →
  * fingerprint dedup), PII redaction of the survivors, optional URL
  * canonicalization + domain blocklist when a `url` column is present, and
  * token-budget shard packing when a `source` column is present. Writes
  * four relations under the output root:
  *
  *   kept/     survivors with redacted text (+ canonical_url/url_blocked)
  *   funnel/   per-stage drop accounting (counts sum to the input corpus)
  *   profile/  one-pass sketch corpus profile of the INPUT (per source)
  *   shards/   token-budget shard summary of the survivors
  *
  * Every stage is the same oracle-gated/spec-gated operator the library
  * exposes individually — the job adds only composition and I/O, so the
  * correctness gates carry over. Scale shape: one corpus scan feeds the
  * stage expressions, the fingerprint window is the single wide shuffle,
  * and the shard window parallelizes per source (see the operator docs).
  *
  * Usage: CorpusPipelineJob <documentsPath> <outRoot> [tokenBudget]
  */
object CorpusPipelineJob {

  /** The pipeline's four output frames plus the checkpoint-release hook:
    * `kept`/`funnel`/`shards` all read the internally checkpointed staged
    * frame, so callers MUST call [[release]] after their last action on
    * them — otherwise every invocation (each micro-batch, in the streaming
    * twin) strands checkpoint blocks in the block manager until JVM GC
    * happens to collect the frame.
    */
  final case class PipelineOutputs(kept: DataFrame, funnel: DataFrame,
      profile: DataFrame, shards: DataFrame, private val staged: DataFrame) {
    def release(): Unit = graft.functions.releaseCheckpoint(staged)
  }

  /** Run the pipeline; `shards` is empty when the input has no `source`
    * column. Call `.release()` on the result after the last action.
    */
  def run(documents: DataFrame, tokenBudget: Double = 500.0,
      priorFingerprints: Option[DataFrame] = None,
      benchmark: Option[DataFrame] = None,
      benchmarkKeys: Option[DataFrame] = None): PipelineOutputs = {
    val spark = documents.sparkSession
    // the staged frame feeds THREE outputs (kept, funnel, shards-of-kept):
    // checkpoint it once so the corpus scan + fingerprint window don't
    // re-execute per write action (on a cluster, write staged to parquet
    // and read it back — same trade, fault-tolerant). The cross-batch
    // dedup join (when priorFingerprints is given) happens BEFORE the
    // checkpoint so it too runs once.
    // r15: the signal frame (langId/quality/repetition/fingerprint per
    // row) is checkpointed so the keeper aggregate and the survivor join
    // both read materialized rows — the expression evaluation happens
    // once; the blocks release as soon as `staged` below is materialized.
    val (stagedBase, signalCk) =
      TextPolicy.hygieneStagedCheckpointed(documents, priorFingerprints)
    // opt-in benchmark decontamination (r14): a row that survived every
    // hygiene stage but shares word-5-grams with the eval benchmark drops
    // as `f_decontaminated` — attribution doctrine preserved (only `kept`
    // rows re-attribute; counts still sum to the corpus). The shingle
    // pass runs over the RAW input (linear; wasted work on pre-dropped
    // rows, but it avoids re-deriving the hygiene frame pre-checkpoint).
    // `benchmarkKeys` (r15) is the pre-shingled form: a stream computes
    // the static eval set's shingles ONCE and passes them through every
    // micro-batch instead of re-shingling per batch; when both are given
    // the keys win.
    val stagedAll = benchmarkKeys
      .orElse(benchmark.map(TextPolicy.benchmarkShingles(_))) match {
      case None => stagedBase
      case Some(keys) =>
        val contaminated = TextPolicy.decontaminateKeys(documents, keys)
          .filter(col("contaminated"))
          .select(col("doc_id"), lit(true).as("_cont"))
        stagedBase.join(contaminated, Seq("doc_id"), "left")
          .withColumn("stage",
            when(col("stage") === "kept" && col("_cont"),
              "f_decontaminated").otherwise(col("stage")))
          .drop("_cont")
    }
    val staged = stagedAll.localCheckpoint()
    // the eager checkpoint above fully materialized staged; the per-row
    // signal blocks are dead weight from here on
    graft.functions.releaseCheckpoint(signalCk)
    val funnel = TextPolicy.funnelOf(staged)
    val keptBase = staged.filter(col("stage") === "kept").drop("stage")
      .withColumn("text", TextPolicy.redactPii(col("text")))
    val kept =
      if (documents.schema.fieldNames.contains("url"))
        keptBase
          .withColumn("canonical_url",
            TextPolicy.canonicalizeUrl(col("url")))
          .withColumn("url_blocked", TextPolicy
            .urlDomain(col("canonical_url"))
            .isin(TextPolicy.BlockedDomains: _*))
      else keptBase
    val hasSource = documents.schema.fieldNames.contains("source")
    // the profile wants an n_chars column; derive it when the input
    // doesn't carry one (e.g. the streaming twin's bare JSON schema)
    val profile =
      if (hasSource) TextAnalysis.corpusProfile(
        if (documents.schema.fieldNames.contains("n_chars")) documents
        else documents.withColumn("n_chars", length(col("text"))))
      else spark.emptyDataFrame
    val shards =
      if (hasSource) TextAnalysis.shardPack(kept, tokenBudget)
      else spark.emptyDataFrame
    PipelineOutputs(kept, funnel, profile, shards, staged)
  }

  /** Knobs for the opt-in data-SELECTION stage that runs after hygiene:
    * GPT-3-style quality classifier keep (TextPolicy.qualityClassifier) →
    * SoftDedup reweighting of the survivors (Dedup.softDedupWeights) →
    * UniMax epoch-capped mixture allocation over the surviving sources
    * (TextAnalysis.unimaxMix).
    */
  final case class SelectionConfig(
      positiveSources: Seq[String],
      paretoAlpha: Double = 9.0,
      budgetTokens: Long = 20000L,
      maxEpochsMicro: Long = 800000L)

  /** [[PipelineOutputs]] plus the selection stage's three relations:
    * `selected` — classifier-kept survivors with (score, sd_weight);
    * `mixture` — the UniMax per-source allocation over them; `funnel` —
    * the hygiene funnel EXTENDED with the classifier drop (stage
    * `s_classifier_drop`), so the stage counts still sum to the input
    * corpus: hygiene's `kept` row is replaced by the classifier split.
    */
  final case class SelectionOutputs(base: PipelineOutputs,
      selected: DataFrame, mixture: DataFrame, funnel: DataFrame) {
    def release(): Unit = base.release()
  }

  /** The full LLM-data-prep path in one call (VERDICT r12 item 8):
    * hygiene→redact→URL→pack via [[run]], then the selection chain over
    * its survivors. Each stage is the same oracle-gated operator the
    * library exposes individually; this adds only composition and the
    * extended funnel. Input needs (doc_id, source, text).
    */
  def runWithSelection(documents: DataFrame, sel: SelectionConfig,
      tokenBudget: Double = 500.0,
      priorFingerprints: Option[DataFrame] = None,
      benchmark: Option[DataFrame] = None,
      benchmarkKeys: Option[DataFrame] = None): SelectionOutputs = {
    val base = run(documents, tokenBudget, priorFingerprints, benchmark,
      benchmarkKeys)
    // classify on the ORIGINAL kept text semantics: kept carries redacted
    // text, which is what ships downstream — score what ships
    val verdicts = graft.operators.TextPolicy
      .qualityClassifier(base.kept, sel.positiveSources, sel.paretoAlpha)
      .select(col("doc_id"), col("score"), col("keep"))
    val judged = base.kept.join(verdicts, Seq("doc_id"))
    val survivors = judged.filter(col("keep")).drop("keep")
    // softDedupWeights emits one row per input doc (shingle-less docs get
    // weight 1.0 internally), so the join is lossless
    val weights = graft.operators.Dedup
      .softDedupWeights(survivors, sharpness = 0.25)
      .select(col("doc_id"), col("norm_weight").as("sd_weight"))
    val selected = survivors.join(weights, Seq("doc_id"))
    val mixture = graft.operators.TextAnalysis
      .unimaxMix(selected, sel.budgetTokens, sel.maxEpochsMicro)
    // extended funnel: hygiene's `kept` row splits into the classifier
    // survivors (new `kept`) and `s_classifier_drop`; totals conserve
    val dropped = judged.filter(!col("keep"))
    val funnel = base.funnel.filter(col("stage") =!= "kept")
      .unionByName(survivors.agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("first_doc"))
        .select(lit("kept").as("stage"), col("n"), col("first_doc")))
      .unionByName(dropped.agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("first_doc"))
        .select(lit("s_classifier_drop").as("stage"), col("n"),
          col("first_doc")))
      .filter(col("n") > 0)
      .orderBy("stage")
    SelectionOutputs(base, selected, mixture, funnel)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CorpusPipelineJob <documentsPath> <outRoot> [tokenBudget] " +
        "[--select src0,src1,...] [--decontam <benchmarkParquet>]  " +
        "(--select: the sources the classifier treats as curated " +
        "positives, enables the selection stage; --decontam: drop kept " +
        "docs sharing 5-grams with the benchmark)")
    val Array(docsPath, outRoot) = args.take(2)
    val rest = args.drop(2)
    def flagValue(flag: String): Option[String] = {
      val i = rest.indexOf(flag)
      require(i < 0 || i + 1 < rest.length, s"$flag requires a value")
      if (i >= 0) Some(rest(i + 1)) else None
    }
    val positives = flagValue("--select").map(_.split(",").toSeq)
    val decontamPath = flagValue("--decontam")
    // drop flag pairs POSITIONALLY (value equality would also drop an
    // unrelated arg that happens to repeat a flag's value)
    val flagPos = Seq("--select", "--decontam")
      .flatMap { f => val i = rest.indexOf(f)
        if (i >= 0) Seq(i, i + 1) else Nil }.toSet
    val budget = rest.zipWithIndex
      .filterNot { case (_, i) => flagPos(i) }
      .map(_._1).filterNot(_.startsWith("--"))
      .headOption.map(_.toDouble).getOrElse(500.0)
    // only stop the session on exit if this main created it — under a test
    // or notebook harness getOrCreate returns the caller's shared session
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    // spark-submit supplies the master in production; GRAFT_MASTER lets
    // the CLI smoke-run standalone (e.g. GRAFT_MASTER=local[32] sbt run)
    val builder = SparkSession.builder()
      .appName("graft-corpus-pipeline")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.env.get("GRAFT_MASTER")
      .fold(builder)(builder.master).getOrCreate()
    try {
      val docs = spark.read.parquet(docsPath)
      val bench = decontamPath.map(spark.read.parquet(_))
      positives match {
        case Some(pos) =>
          val out = runWithSelection(docs, SelectionConfig(pos), budget,
            None, bench)
          try {
            out.base.kept.write.mode("overwrite").parquet(s"$outRoot/kept")
            out.funnel.write.mode("overwrite").parquet(s"$outRoot/funnel")
            out.selected.write.mode("overwrite")
              .parquet(s"$outRoot/selected")
            out.mixture.write.mode("overwrite").parquet(s"$outRoot/mixture")
            if (out.base.profile.schema.nonEmpty)
              out.base.profile.write.mode("overwrite")
                .parquet(s"$outRoot/profile")
            if (out.base.shards.schema.nonEmpty)
              out.base.shards.write.mode("overwrite")
                .parquet(s"$outRoot/shards")
          } finally out.release()
        case None =>
          val out = run(docs, budget, None, bench)
          try {
            out.kept.write.mode("overwrite").parquet(s"$outRoot/kept")
            out.funnel.write.mode("overwrite").parquet(s"$outRoot/funnel")
            if (out.profile.schema.nonEmpty)
              out.profile.write.mode("overwrite").parquet(s"$outRoot/profile")
            if (out.shards.schema.nonEmpty)
              out.shards.write.mode("overwrite").parquet(s"$outRoot/shards")
          } finally out.release()
      }
    } finally if (!preExisting) spark.stop()
  }
}
