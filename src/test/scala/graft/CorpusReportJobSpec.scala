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
