package graft

import java.sql.Timestamp

import graft.domain.{BatchRecall, Memory}
import graft.operators.IvfIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF-prefiltered vector channel for batched recall (r16, VERDICT r15
  * item 1): at nprobe = all cells it must be BITWISE the brute-force
  * channel (the q_sim_ivf_topk doctrine); at a small nprobe on a clustered
  * corpus it must keep recall@10 high while the candidate scan is
  * partition-pruned to the probed cells.
  */
class BatchRecallIvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val now = Timestamp.valueOf("2026-01-10 00:00:00")
  private val Dim = 16
  private val K = 8 // clusters

  // deterministic clustered corpus: K well-separated centers, members and
  // queries are center + small noise, so an nprobe=2 k-means probe should
  // recover nearly all true neighbors (they live in the query's cluster)
  private def center(c: Int): Array[Float] = {
    val r = new scala.util.Random(1000 + c)
    Array.fill(Dim)((r.nextDouble() * 2 - 1).toFloat)
  }
  private def jitter(c: Int, i: Int, eps: Double): Array[Float] = {
    val r = new scala.util.Random(c * 10007 + i)
    center(c).map(x => x + (r.nextDouble() * 2 - 1).toFloat * eps.toFloat)
  }

  private def mem(id: String, emb: Array[Float]): Memory = {
    val t = Timestamp.valueOf("2026-01-01 10:00:00")
    Memory(id, s"clustered corpus row $id", t, t, None, t, t, 0.5, 0.7,
      "Context", Seq("cluster"), Nil, "{}", None, enriched = false,
      processed = false, 1.0, archived = false, protected_flag = false, emb)
  }

  private lazy val memories = {
    import spark.implicits._
    val rows = for (c <- 0 until K; i <- 0 until 40)
      yield mem(f"m$c%02d_$i%03d", jitter(c, i, 0.05))
    rows.toDF().repartition(8).cache()
  }

  // queries carry explicit qvec so the vector channel dominates ranking
  private def queriesDf(eps: Double) = {
    import spark.implicits._
    (0 until K).flatMap(c => Seq(0, 1).map(j =>
      (c * 10 + j, s"clustered corpus row", jitter(c, 900 + j, eps).toSeq)))
      .toDF("qid", "query", "qvec")
  }

  private def topIds(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[String]] =
    df.select("qid", "rank", "id").collect()
      .groupBy(_.getInt(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq).toMap

  test("nprobe=all is bitwise the brute-force vector channel") {
    val path = java.nio.file.Files
      .createTempDirectory("ivf_batch_parity").toString
    BatchRecall.buildVectorIndex(memories, path) // sign quantizer, 64 cells
    val qs = queriesDf(0.05)
    val brute = BatchRecall
      .batchRecall(memories, spark.emptyDataFrame, qs, limit = 10, now = now)
      .collect().map(_.toString).sorted
    val ivf = BatchRecall
      .batchRecall(memories, spark.emptyDataFrame, qs, limit = 10, now = now,
        ivf = Some(BatchRecall.IvfChannel(path, nprobe = 64)))
      .collect().map(_.toString).sorted
    assert(ivf.length == brute.length && ivf.sameElements(brute),
      s"nprobe=all must be bitwise brute force: ${ivf.length} vs ${brute.length} rows")
  }

  test("recall@10 >= 0.9 at nprobe=2 on the clustered corpus (k-means quantizer)") {
    val path = java.nio.file.Files
      .createTempDirectory("ivf_batch_recall").toString
    BatchRecall.buildVectorIndex(memories, path, kmeansK = K)
    val qs = queriesDf(0.05)
    val brute = topIds(BatchRecall
      .batchRecall(memories, spark.emptyDataFrame, qs, limit = 10, now = now))
    val ivf = topIds(BatchRecall
      .batchRecall(memories, spark.emptyDataFrame, qs, limit = 10, now = now,
        ivf = Some(BatchRecall.IvfChannel(path, nprobe = 2))))
    val recalls = brute.keys.toSeq.map { qid =>
      val want = brute(qid).toSet
      val got = ivf.getOrElse(qid, Nil).toSet
      (want & got).size.toDouble / want.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.9,
      f"mean recall@10 at nprobe=2 must be >= 0.9, got $meanRecall%.3f")
  }

  test("the probed-cell scan is statically partition-pruned") {
    val path = java.nio.file.Files
      .createTempDirectory("ivf_batch_prune").toString
    BatchRecall.buildVectorIndex(memories, path, kmeansK = K)
    val qs = queriesDf(0.05).limit(2)
    val df = BatchRecall
      .batchRecall(memories, spark.emptyDataFrame, qs, limit = 10, now = now,
        ivf = Some(BatchRecall.IvfChannel(path, nprobe = 1)))
    val plan = df.queryExecution.executedPlan.toString
    // a NON-EMPTY partition filter referencing the cell column on the
    // assignments scan — the static pruning the IvfChannel promises
    val filters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(filters.nonEmpty,
      s"assignments scan must carry a partition filter; plan:\n${plan.take(4000)}")
    assert(filters.exists(f => f.contains("cell") && f.nonEmpty),
      s"expected a non-empty cell partition filter, got: $filters")
    assert(df.count() > 0)
  }

  test("PreparedRecall ivf option: nprobe=all matches the default handle " +
    "bitwise; serving is replanned by construction") {
    import graft.domain.PreparedRecall
    val path = java.nio.file.Files
      .createTempDirectory("ivf_prepared").toString
    BatchRecall.buildVectorIndex(memories, path, kmeansK = K)
    val plain = new PreparedRecall(memories, spark.emptyDataFrame,
      limit = 10, now = now, prebuildClasses = false)
    val ivfH = new PreparedRecall(memories, spark.emptyDataFrame,
      limit = 10, now = now, prebuildClasses = false,
      ivf = Some(BatchRecall.IvfChannel(path, nprobe = K)))
    // the candidate relation is per-call — the cached-physical fast path
    // must decline up front and every call serves replanned
    assert(!ivfH.fastPathEnabled)
    assert(ivfH.fastPathDiagnosis.contains("replanned"),
      s"got: ${ivfH.fastPathDiagnosis}")
    for (c <- Seq(0, 3, 7)) {
      val qv = jitter(c, 950, 0.05)
      val a = plain.recallReplanned("clustered corpus row", Some(qv))
        .collect().map(_.toString).toSeq
      val b = ivfH.recall("clustered corpus row", Some(qv))
        .collect().map(_.toString).toSeq
      assert(a == b, s"cluster $c: ivf-prepared $b != brute-prepared $a")
      assert(a.nonEmpty)
    }
    plain.close(); ivfH.close()
  }

  test("driver-side probe ranking matches the in-plan probeCells ranking") {
    val path = java.nio.file.Files
      .createTempDirectory("ivf_probe_parity").toString
    BatchRecall.buildVectorIndex(memories, path, kmeansK = K)
    val qz = IvfIndex.loadQuantizer(spark, path)
    assert(qz.metric == "l2", "k-means index must rank cells by L2")
    for (c <- 0 until K) {
      val qv = jitter(c, 991, 0.05)
      val local = IvfIndex.probeCellsLocal(qz, qv, 3)
      val inPlan = IvfIndex.probeCells(spark, path, qv, 3)
      assert(local == inPlan, s"cluster $c: local $local vs in-plan $inPlan")
    }
    // sign quantizer path too
    val path2 = java.nio.file.Files
      .createTempDirectory("ivf_probe_parity_sign").toString
    BatchRecall.buildVectorIndex(memories, path2)
    val qz2 = IvfIndex.loadQuantizer(spark, path2)
    assert(qz2.metric == "cosine")
    val qv = jitter(3, 992, 0.05)
    assert(IvfIndex.probeCellsLocal(qz2, qv, 4) ==
      IvfIndex.probeCells(spark, path2, qv, 4))
  }
}
