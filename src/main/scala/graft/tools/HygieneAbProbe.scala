package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved A/B of the r14 hygiene keep-first change on the REAL
  * documents table: the shipped aggregate+join form (keeper = min(doc_id)
  * of survivors per fingerprint, joined back — scans the corpus twice,
  * immune to hot fingerprints) vs the pre-r14 running-sum window (one
  * scan + a corpus-wide sort partitioned by the fingerprint — one task
  * per hot key at 100 TB). Pins the small-scale price of the at-scale
  * fix honestly; the skew evidence lives in PipelineScaleProbe's
  * mega-fingerprint arm.
  *
  * Run: `sbt "runMain graft.tools.HygieneAbProbe [sfDir]"`
  */
object HygieneAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))

    // the pre-r14 form, full fidelity (the _pre stages + the window)
    def windowForm(documents: DataFrame): DataFrame = {
      import graft.functions.TextFunctions.{fingerprint, langId, qualityScore}
      import graft.functions.round4
      val ws = graft.functions.TextFunctions.tokens(col("text"))
      val dupfrac = when(size(ws) >= 2,
        round4((size(ws) - size(array_distinct(ws))).cast("double") / size(ws)))
        .otherwise(lit(0.0))
      documents
        .withColumn("_pre",
          when(langId(col("text")) =!= "en", "a_lang")
            .when(qualityScore(col("text")) < 0.5, "b_quality")
            .when(dupfrac > 0.65, "c_repetition"))
        .withColumn("_surv_rank",
          sum(when(col("_pre").isNull, 1).otherwise(0)).over(
            Window.partitionBy(coalesce(
                nullif(fingerprint(col("text")), lit("")),
                concat(lit("doc#"), col("doc_id"))))
              .orderBy(col("doc_id"))
              .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("stage", coalesce(col("_pre"),
          when(col("_surv_rank") > 1, "d_fingerprint_dup").otherwise("kept")))
        .drop("_pre", "_surv_rank")
    }

    def funnelCount(staged: DataFrame): Long =
      graft.operators.TextPolicy.funnelOf(staged)
        .agg(sum(col("n"))).collect().head.getLong(0)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // the r15 shipped form: signal frame checkpointed once, keeper
    // aggregate + survivor join both read the materialized rows, blocks
    // released before returning (the hygieneFunnel/CorpusPipelineJob path)
    def funnelCountCkpt(): Long = {
      val (staged, ck) = graft.operators.TextPolicy
        .hygieneStagedCheckpointed(docs, None)
      val n = graft.operators.TextPolicy.funnelOf(staged)
        .agg(sum(col("n"))).collect().head.getLong(0)
      graft.functions.releaseCheckpoint(ck)
      n
    }
    // equality first: all forms produce the identical funnel
    val a = graft.operators.TextPolicy.hygieneFunnel(docs).collect().toSeq
    val b = graft.operators.TextPolicy.funnelOf(windowForm(docs))
      .collect().toSeq
    val c = graft.operators.TextPolicy
      .funnelOf(graft.operators.TextPolicy.hygieneStaged(docs))
      .collect().toSeq
    println(s"[hygieneab] funnel_equal=${a == b && b == c} rows=${a.map(_.getLong(1)).sum}")
    // warm all three, then interleave
    funnelCount(graft.operators.TextPolicy.hygieneStaged(docs))
    funnelCountCkpt()
    funnelCount(windowForm(docs))
    for (_ <- 1 to 3) {
      val tAgg = time(funnelCount(graft.operators.TextPolicy.hygieneStaged(docs)))
      val tCk = time(funnelCountCkpt())
      val tWin = time(funnelCount(windowForm(docs)))
      println(f"[hygieneab] agg2scan=$tAgg%.2f s  aggckpt=$tCk%.2f s  window=$tWin%.2f s  dir=$dir")
    }
    spark.stop()
  }
}
