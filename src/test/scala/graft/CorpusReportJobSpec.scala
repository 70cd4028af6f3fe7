package graft

import org.scalatest.funsuite.AnyFunSuite

/** The corpus-report job must emit EXACTLY the standalone operators'
  * relations — the composition shares one tokenize pass but may not
  * change a single value of any oracle-gated output.
  */
class CorpusReportJobSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("corpus report: all eight relations are bitwise-equal to the " +
    "standalone operators on the driver corpus") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val report = graft.jobs.CorpusReportJob.run(docs)
    try {
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toString).toSeq
      assert(rows(report.zipf) ==
        rows(graft.operators.TextAnalysis.zipfSlope(docs, 50)))
      assert(rows(report.heaps) ==
        rows(graft.operators.TextAnalysis.heapsLaw(docs)))
      assert(rows(report.divergence) ==
        rows(graft.operators.TextAnalysis.sourceDivergence(docs)))
      assert(rows(report.overlap) ==
        rows(graft.operators.TextAnalysis.sourceOverlap(docs)))
      assert(rows(report.dupRate) ==
        rows(graft.operators.Dedup.dupRateBySource(spark, sf, n = 8)))
      // r15: the contamination/decontam/auc relations must equal the
      // ORACLE-GATED standalone compositions exactly
      assert(rows(report.contamination) ==
        rows(graft.operators.TextPolicy.contamination(spark, sf)))
      assert(rows(report.decontam) ==
        rows(graft.operators.TextPolicy.decontaminateScore(spark, sf)))
      assert(rows(report.auc) ==
        rows(graft.operators.TextPolicy.classifierAuc(spark, sf)))
      assert(rows(report.zipf).nonEmpty && rows(report.dupRate).nonEmpty)
      assert(rows(report.contamination).nonEmpty &&
        rows(report.decontam).nonEmpty && rows(report.auc).nonEmpty)
    } finally report.release()
  }

  test("report job main writes all eight relations and honors the " +
    "selection flags (r15)") {
    val sf = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft-report")
      .toString
    Tables.documents(spark, sf).write.mode("overwrite")
      .parquet(s"$root/docs")
    graft.jobs.CorpusReportJob.main(Array(s"$root/docs", s"$root/out",
      "25", "--positives", "src0,src3", "--alpha", "4.0"))
    val rels = Seq("zipf", "heaps", "divergence", "overlap", "duprate",
      "contamination", "decontam", "auc")
    rels.foreach { r =>
      assert(spark.read.parquet(s"$root/out/$r").count() > 0,
        s"relation $r must be non-empty")
    }
    // the CLI's positives reached the AUC stage: it must equal the
    // standalone form at the SAME knobs, and differ from the defaults
    val docs = Tables.documents(spark, sf)
    val custom = graft.operators.TextPolicy
      .classifierAuc(docs, Seq("src0", "src3"), 4.0).collect().head
    val got = spark.read.parquet(s"$root/out/auc").collect().head
    assert(got.toString == custom.toString, s"$got vs $custom")
    val default = graft.operators.TextPolicy
      .classifierAuc(docs, Seq("src0", "src1", "src2"), 9.0).collect().head
    assert(got.toString != default.toString,
      "flag plumbing must actually change the relation")
  }

  test("classifier AUC contract: a single-class corpus emits null auc " +
    "with counts populated (r15 ADVICE)") {
    import spark.implicits._
    val allPos = Seq((1L, "src0", "the cat sat"), (2L, "src0", "a dog ran"))
      .toDF("doc_id", "source", "text")
    val r = graft.operators.TextPolicy
      .classifierAuc(allPos, Seq("src0"), 9.0).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2),
      s"all-positive corpus must emit null auc: $r")
    val r2 = graft.operators.TextPolicy
      .classifierAuc(allPos, Seq("srcX"), 9.0).collect().head
    assert(r2.getLong(0) == 0L && r2.getLong(1) == 2L && r2.isNullAt(2),
      s"all-negative corpus must emit null auc: $r2")
  }
}
