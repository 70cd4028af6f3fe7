package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Measures the corpus-report shared-scan win (r13 VERDICT item 6): the
  * five profiling relations run standalone re-tokenize the corpus five
  * times; [[graft.jobs.CorpusReportJob]] tokenizes once and derives all
  * five from the checkpointed explode. Prints warm wall-clock for both
  * arms at each size — the report must come in under the standalone sum.
  *
  * Run: `sbt "runMain graft.tools.CorpusReportProbe [sizes...]"`
  */
object CorpusReportProbe {

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(50000L, 100000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    for (n <- sizes) {
      val docs = PipelineScaleProbe.syntheticDocs(spark, n)
        .withColumn("source",
          concat(lit("s"), (col("doc_id") % 5).cast("string")))
        .repartition(32).cache()
      docs.count()
      val positives = Seq("s0", "s1")
      def standaloneAll(): Unit = {
        graft.operators.TextAnalysis.zipfSlope(docs, 50).count()
        graft.operators.TextAnalysis.heapsLaw(docs).count()
        graft.operators.TextAnalysis.sourceDivergence(docs).count()
        graft.operators.TextAnalysis.sourceOverlap(docs).count()
        graft.operators.Dedup.dupRateBySource(
          graft.operators.Dedup.substringDupSpansDf(docs, 8, hashed = false),
          docs).count()
        // r15 additions: contamination report + decontam apply + AUC,
        // each re-tokenizing standalone
        graft.operators.TextPolicy.contamination(docs, 5, 20, 1).count()
        graft.operators.TextPolicy.decontaminate(
          docs.filter(col("doc_id") >= 20),
          docs.filter(col("doc_id") < 20)).count()
        graft.operators.TextPolicy.classifierAuc(docs, positives, 9.0)
          .count()
      }
      def reportAll(): Unit = {
        val r = graft.jobs.CorpusReportJob.run(docs,
          positiveSources = positives)
        try {
          r.zipf.count(); r.heaps.count(); r.divergence.count()
          r.overlap.count(); r.dupRate.count()
          r.contamination.count(); r.decontam.count(); r.auc.count()
        } finally r.release()
      }
      // warm both arms once (codegen), then measure interleaved
      standaloneAll(); reportAll()
      val tS1 = timed(standaloneAll()); val tR1 = timed(reportAll())
      val tS2 = timed(standaloneAll()); val tR2 = timed(reportAll())
      val tS = (tS1 + tS2) / 2; val tR = (tR1 + tR2) / 2
      println(f"[corpusreport] n=$n standalone_sum=$tS%6.2f s " +
        f"report=$tR%6.2f s win=${tS / tR}%4.2fx")
      docs.unpersist()
    }
    spark.stop()
  }
}
