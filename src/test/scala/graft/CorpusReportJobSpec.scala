package graft

import org.scalatest.funsuite.AnyFunSuite

/** The corpus-report job must emit EXACTLY the standalone operators'
  * relations — the composition shares one tokenize pass but may not
  * change a single value of any oracle-gated output.
  */
class CorpusReportJobSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("corpus report: all five relations are bitwise-equal to the " +
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
      assert(rows(report.zipf).nonEmpty && rows(report.dupRate).nonEmpty)
    } finally report.release()
  }
}
