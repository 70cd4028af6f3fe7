package graft

import graft.domain.PlaceholderEmbedding
import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index: query answers must be identical to the ephemeral
  * probe path at equal nprobe, and the query PLAN must read the index —
  * partition-pruned assignments scan, no full-corpus centroid recompute
  * (the round-2 gap: centroids were rebuilt with a full embedding scan per
  * job).
  */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def corpus = {
    import spark.implicits._
    (0 until 400).map { i =>
      (i.toLong, s"label${i % 4}", PlaceholderEmbedding.embed(s"doc $i").toSeq)
    }.toDF("vec_id", "label", "embedding")
  }

  test("index answers are identical to the ephemeral IVF path at equal nprobe") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val qvec = PlaceholderEmbedding.embed("doc 7")
    IvfIndex.build(corpus, tmp)
    for (nprobe <- Seq(2, 8, 64)) {
      val fromIndex = IvfIndex.topK(spark, tmp, qvec, k = 10, nprobe = nprobe)
        .select("vec_id", "label", "sim").collect().map(_.toSeq).toSeq
      val ephemeral = Similarity.ivfTopK(corpus, qvec, k = 10, nprobe = nprobe)
        .collect().map(_.toSeq).toSeq
      assert(fromIndex == ephemeral, s"nprobe=$nprobe diverged")
    }
  }

  test("probing all cells equals brute-force top-k (index loses nothing)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val qvec = PlaceholderEmbedding.embed("doc 3")
    IvfIndex.build(corpus, tmp)
    val all = IvfIndex.topK(spark, tmp, qvec, k = 10, nprobe = 64)
      .select("vec_id", "sim").collect().map(_.toSeq).toSeq
    val brute = corpus
      .withColumn("sim", graft.functions.round4(
        graft.functions.VectorFunctions.cosineSim(col("embedding"),
          typedlit(qvec))))
      .orderBy(desc("sim"), asc("vec_id")).limit(10)
      .select("vec_id", "sim").collect().map(_.toSeq).toSeq
    assert(all == brute)
  }

  test("query plan prunes assignment partitions and never rescans for centroids") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val qvec = PlaceholderEmbedding.embed("doc 11")
    IvfIndex.build(corpus, tmp)
    val probed = IvfIndex.probeCells(spark, tmp, qvec, nprobe = 2)
    assert(probed.length == 2)
    val q = IvfIndex.topK(spark, tmp, qvec, k = 10, nprobe = 2)
    val plan = q.queryExecution.executedPlan.toString
    // static partition pruning on the probed cells
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[cell#\\d+ IN \\(".r.findFirstIn(plan).isDefined,
      s"expected cell partition pruning in:\n$plan")
    // exactly one file scan (assignments); the centroid lookup is a
    // collected parameter, not part of the candidate plan — and no
    // full-corpus scan computes centroids at query time
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 parquet scan in the query plan, got $scans:\n$plan")
    assert(!plan.contains("centroids"), s"centroid table must not be in the query plan")
    assert(q.count() > 0)
  }
}
