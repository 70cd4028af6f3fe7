package graft.jobs

import graft.functions.TextFunctions.tokens
import graft.operators.{Dedup, TextAnalysis, TextPolicy}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The corpus-profile REPORT as one job (r13 VERDICT item 6; extended
  * r15): the per-source profiling relations a mixture recipe reads
  * together, PLUS the contamination and filter-quality relations the same
  * review actually covers —
  *
  *   zipf/        per-source Zipf head slope       [[TextAnalysis.zipfSlope]]
  *   heaps/       Heaps' vocabulary-growth beta    [[TextAnalysis.heapsLaw]]
  *   divergence/  pairwise source KL               [[TextAnalysis.sourceDivergence]]
  *   overlap/     cross-source shingle Jaccard     [[TextAnalysis.sourceOverlap]]
  *   duprate/     per-source duplication rate      [[Dedup.dupRateBySource]]
  *   contamination/ per-(train, bench) shared 5-grams [[TextPolicy.contamination]]
  *   decontam/    per-train-doc apply verdict      [[TextPolicy.decontaminate]]
  *   auc/         classifier Mann-Whitney ROC AUC  [[TextPolicy.classifierAuc]]
  *
  * Run standalone, each op rescans and RE-TOKENIZES the corpus — eight
  * full text passes for one report. This job tokenizes ONCE: a single
  * position-explode is checkpointed (the sourceOverlap pattern; at 100 TB
  * write it to parquet and read back — the containmentPairs
  * persisted-artifact note) and every relation derives from it through
  * the operators' own `FromTokens`/`FromCounts` composition points, so
  * each output is the SAME oracle-gated relation the standalone op
  * produces (equality spec in CorpusReportJobSpec; shared-scan win
  * measured in tools.CorpusReportProbe). The per-(source, token) count
  * table is additionally checkpointed once and feeds BOTH the Zipf head
  * fit and the KL grid; the per-doc shingle-key table is checkpointed
  * once and feeds BOTH contamination fronts.
  *
  * Usage: CorpusReportJob <documentsPath> <outRoot> [topN]
  */
object CorpusReportJob {

  /** The eight report frames plus the checkpoint-release hook: all eight
    * read the internally checkpointed token/count/shingle tables, so
    * callers MUST call [[release]] after their last action on them.
    */
  final case class Report(zipf: DataFrame, heaps: DataFrame,
      divergence: DataFrame, overlap: DataFrame, dupRate: DataFrame,
      contamination: DataFrame, decontam: DataFrame, auc: DataFrame,
      private val pinned: Seq[DataFrame]) {
    def release(): Unit = pinned.foreach(graft.functions.releaseCheckpoint)
  }

  /** Build all eight relations from one tokenize pass. `documents` needs
    * (doc_id, source, text). Call `.release()` after the last action.
    * `benchCut`/`positiveSources`/`alpha` default to the oracle-gated
    * stand-in conventions (doc_id < 20 is the benchmark; src0-2 are the
    * curated positives); production passes its real eval-set cut and
    * curated sources.
    */
  def run(documents: DataFrame, topN: Int = 50, dupN: Int = 8,
      shingleN: Int = 5, benchCut: Int = 20, minShared: Int = 1,
      positiveSources: Seq[String] = Seq("src0", "src1", "src2"),
      alpha: Double = 9.0): Report = {
    // THE tokenize pass: every relation below derives from this explode
    val docToks = documents.select(col("doc_id"), col("source"),
        posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .localCheckpoint()
    // per-(source, token) counts: shared by zipf + divergence
    val counts = docToks
      .select(col("source"), col("tok").as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // per-doc 5-gram shingle keys: shared by the contamination REPORT
    // (per-pair attribution) and the decontamination APPLY verdict
    val shingles = TextPolicy.docShingleKeysFromTokens(
        docToks.select(col("doc_id"), col("pos"), col("tok")), shingleN)
      .localCheckpoint()
    // per-doc token counts reproduce size(tokens(text)) exactly: tokens()
    // of empty/whitespace text is a one-element array (one explode row),
    // so every document appears in docToks
    val docLens = docToks.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"))
    val spans = Dedup.substringDupSpansFromTokens(
      docToks.select(col("doc_id"), col("pos"), col("tok")),
      docLens, dupN, hashed = false)
    Report(
      zipf = TextAnalysis.zipfSlopeFromCounts(counts, topN),
      heaps = TextAnalysis.heapsLawFromTokens(
        docToks.select(col("doc_id"), col("tok").as("w")), documents),
      divergence = TextAnalysis.sourceDivergenceFromCounts(counts),
      overlap = TextAnalysis.sourceOverlapFromTokens(docToks),
      dupRate = Dedup.dupRateBySource(spans, documents),
      contamination = TextPolicy.contaminationFromShingles(
        shingles, benchCut, minShared),
      decontam = TextPolicy.decontaminateFromShingles(
        documents.filter(col("doc_id") >= benchCut).select(col("doc_id")),
        shingles.filter(col("doc_id") >= benchCut),
        shingles.filter(col("doc_id") < benchCut)
          .select(col("shk")).distinct(),
        minShared),
      auc = TextPolicy.classifierAucFromTokens(
        docToks.select(col("doc_id"),
          col("source").isInCollection(positiveSources).as("pos"),
          col("tok")), alpha),
      pinned = Seq(docToks, counts, shingles))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CorpusReportJob <documentsPath> <outRoot> [topN] " +
        "[--bench-cut <id>] [--positives src0,src1,...] [--alpha <a>]")
    val Array(docsPath, outRoot) = args.take(2)
    val rest = args.drop(2)
    def flagValue(flag: String): Option[String] = {
      val i = rest.indexOf(flag)
      require(i < 0 || i + 1 < rest.length, s"$flag requires a value")
      if (i >= 0) Some(rest(i + 1)) else None
    }
    val knownFlags = Seq("--bench-cut", "--positives", "--alpha")
    val flagPos = knownFlags
      .flatMap { f => val i = rest.indexOf(f)
        if (i >= 0) Seq(i, i + 1) else Nil }.toSet
    // reject unknown --flags BEFORE positional extraction (ADVICE r15):
    // a typo'd flag's value would otherwise be consumed as the positional
    // topN (or crash on toInt) with no diagnostic
    val unknown = rest.zipWithIndex
      .filterNot { case (_, i) => flagPos(i) }
      .map(_._1).filter(_.startsWith("--"))
    require(unknown.isEmpty,
      s"unknown flag(s) ${unknown.mkString(", ")}; known: " +
        knownFlags.mkString(", "))
    val topN = rest.zipWithIndex
      .filterNot { case (_, i) => flagPos(i) }
      .map(_._1).filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(50)
    val benchCut = flagValue("--bench-cut").map(_.toInt).getOrElse(20)
    val positives = flagValue("--positives").map(_.split(",").toSeq)
      .getOrElse(Seq("src0", "src1", "src2"))
    val alpha = flagValue("--alpha").map(_.toDouble).getOrElse(9.0)
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    // spark-submit supplies the master in production; GRAFT_MASTER lets
    // the CLI smoke-run standalone (e.g. GRAFT_MASTER=local[32] sbt run)
    val builder = SparkSession.builder()
      .appName("graft-corpus-report")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.env.get("GRAFT_MASTER")
      .fold(builder)(builder.master).getOrCreate()
    try {
      val report = run(spark.read.parquet(docsPath), topN,
        benchCut = benchCut, positiveSources = positives, alpha = alpha)
      try {
        report.zipf.write.mode("overwrite").parquet(s"$outRoot/zipf")
        report.heaps.write.mode("overwrite").parquet(s"$outRoot/heaps")
        report.divergence.write.mode("overwrite")
          .parquet(s"$outRoot/divergence")
        report.overlap.write.mode("overwrite").parquet(s"$outRoot/overlap")
        report.dupRate.write.mode("overwrite").parquet(s"$outRoot/duprate")
        report.contamination.write.mode("overwrite")
          .parquet(s"$outRoot/contamination")
        report.decontam.write.mode("overwrite")
          .parquet(s"$outRoot/decontam")
        report.auc.write.mode("overwrite").parquet(s"$outRoot/auc")
      } finally report.release()
    } finally if (!preExisting) spark.stop()
  }
}
