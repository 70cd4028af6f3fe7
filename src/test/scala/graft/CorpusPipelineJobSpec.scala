package graft

import graft.jobs.CorpusPipelineJob
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end smoke of the training-corpus pipeline job: the composed run
  * must conserve the corpus through the funnel, redact survivors, carry the
  * URL policy when the column exists, and pack shards that conserve the
  * kept set — each invariant owned by an operator-level gate, re-asserted
  * here across the composition boundary.
  */
class CorpusPipelineJobSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("pipeline job runs standalone on the driver documents + urls") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("url", concat(lit("https://WWW.Site"),
        (col("doc_id") % 7).cast("string"), lit(".com/p?utm_source=x")))
    val out = CorpusPipelineJob.run(docs)
    val (kept, funnel, profile, shards) =
      (out.kept, out.funnel, out.profile, out.shards)
    val total = docs.count()
    val funnelRows = funnel.collect()
    assert(funnelRows.map(_.getLong(1)).sum == total,
      "funnel stage counts must sum to the corpus")
    val keptRows = kept.collect()
    assert(keptRows.nonEmpty && keptRows.length ==
      funnelRows.find(_.getString(0) == "kept").map(_.getLong(1)).get)
    // survivors are redacted and policy-checked
    assert(kept.filter(col("text").rlike(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).count() == 0,
      "no live emails may survive the pipeline")
    assert(keptRows.forall(r =>
      !r.getAs[String]("canonical_url").contains("utm_")))
    // shard packing conserves the kept set
    val shardRows = shards.collect()
    assert(shardRows.map(_.getLong(2)).sum == keptRows.length)
    // profile covers every input source
    assert(profile.select("source").collect().map(_.getString(0)).toSet ==
      docs.select("source").distinct().collect().map(_.getString(0)).toSet)
    out.release()
  }

  test("streaming pipeline twin appends kept + batch-tagged funnel rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-pipes").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
      .coalesce(1).write.mode("overwrite").json(s"$tmp/in")
    val q = graft.streaming.StreamingIngest.pipelineStream(
      spark, s"$tmp/in", s"$tmp/out", s"$tmp/cp")
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(s"$tmp/out/kept")
    val funnel = spark.read.parquet(s"$tmp/out/funnel")
    val total = Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(funnel.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
      == total, "per-batch funnels must still conserve the corpus")
    val keptN = funnel.filter($"stage" === "kept")
      .agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    assert(kept.count() == keptN)
    assert(funnel.columns.contains("batch_id"))
  }

  test("pipeline job main writes all four relations") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(s"$tmp/in")
    // main() builds its own session via getOrCreate (shares the test one)
    CorpusPipelineJob.main(Array(s"$tmp/in", s"$tmp/out", "400"))
    val kept = SparkTestSession.spark.read.parquet(s"$tmp/out/kept")
    val funnel = SparkTestSession.spark.read.parquet(s"$tmp/out/funnel")
    val shards = SparkTestSession.spark.read.parquet(s"$tmp/out/shards")
    assert(kept.count() > 0 && funnel.count() > 0 && shards.count() > 0)
    assert(SparkTestSession.spark.read.parquet(s"$tmp/out/profile").count() > 0)
  }
}
