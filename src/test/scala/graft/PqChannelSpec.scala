package graft

import java.sql.Timestamp

import graft.domain.{BatchRecall, Memory}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PQ-compressed vector channel for batched recall (r17, VERDICT r16
  * item 5): the serving twin of the IVF channel over the 32x-smaller code
  * table. Contracts mirror BatchRecallIvfSpec:
  *  - nprobe = all cells with a corpus-covering refine is BITWISE the
  *    brute-force channel (the refine step re-ranks exactly, so once the
  *    candidate cut covers the corpus the whole result is exact);
  *  - a small nprobe on a clustered corpus keeps recall@10 high;
  *  - the code-table scan is statically partition-pruned to probed cells.
  */
class PqChannelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val now = Timestamp.valueOf("2026-01-10 00:00:00")
  private val Dim = 16
  private val K = 8 // clusters

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

  test("nprobe=all with corpus-covering refine is bitwise the brute channel") {
    val path = java.nio.file.Files
      .createTempDirectory("pq_batch_parity").toString
    // 320-row corpus: overfetch(=40 at limit 10) x refine 8 = 320 covers it
    BatchRecall.buildPqVectorIndex(memories, path, m = 8, ksub = 16)
    val qs = queriesDf(0.05)
    val brute = BatchRecall
      .batchRecall(memories, spark.emptyDataFrame, qs, limit = 10, now = now)
      .collect().map(_.toString).sorted
    val pq = BatchRecall
      .batchRecall(memories, spark.emptyDataFrame, qs, limit = 10, now = now,
        pq = Some(BatchRecall.PqChannel(path, nprobe = 64, refine = 8)))
      .collect().map(_.toString).sorted
    assert(pq.length == brute.length && pq.sameElements(brute),
      s"nprobe=all + covering refine must be bitwise brute: " +
        s"${pq.length} vs ${brute.length} rows")
  }

  test("recall@10 >= 0.9 at nprobe=2 on the clustered corpus") {
    val path = java.nio.file.Files
      .createTempDirectory("pq_batch_recall").toString
    BatchRecall.buildPqVectorIndex(memories, path, m = 8, ksub = 16)
    val qs = queriesDf(0.05)
    val brute = topIds(BatchRecall
      .batchRecall(memories, spark.emptyDataFrame, qs, limit = 10, now = now))
    val pq = topIds(BatchRecall
      .batchRecall(memories, spark.emptyDataFrame, qs, limit = 10, now = now,
        pq = Some(BatchRecall.PqChannel(path, nprobe = 2, refine = 8))))
    val recalls = brute.keys.toSeq.map { qid =>
      val want = brute(qid).toSet
      val got = pq.getOrElse(qid, Nil).toSet
      (want & got).size.toDouble / want.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.9,
      f"mean recall@10 at nprobe=2 must be >= 0.9, got $meanRecall%.3f")
  }

  test("the code-table scan is statically partition-pruned to probed cells") {
    val path = java.nio.file.Files
      .createTempDirectory("pq_batch_prune").toString
    BatchRecall.buildPqVectorIndex(memories, path, m = 8, ksub = 16)
    val qs = queriesDf(0.05).limit(2)
    val df = BatchRecall
      .batchRecall(memories, spark.emptyDataFrame, qs, limit = 10, now = now,
        pq = Some(BatchRecall.PqChannel(path, nprobe = 1)))
    val plan = df.queryExecution.executedPlan.toString
    val filters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(filters.exists(f => f.contains("cell") && f.nonEmpty),
      s"expected a non-empty cell partition filter, got: $filters")
    assert(df.count() > 0)
  }

  test("normalized encoding: a large-norm wrong cluster cannot crowd the " +
    "ADC candidate cut (the FAISS cosine doctrine, r17)") {
    import spark.implicits._
    // two clusters in nearly-orthogonal directions; the WRONG one carries
    // 10x the norm. Unnormalized ADC ranks by dot product and would fill
    // a tight candidate cut with the big-norm cluster; the channel
    // encodes L2-normalized codes, so ADC ranks as cosine and the
    // query's own (small-norm) cluster survives the cut.
    // off-component 0.3 on the big cluster makes its raw dot with the
    // query (~56) STRICTLY dominate the small cluster's (~16) while its
    // cosine (~0.34) stays far below (~1.0) — the two rankings disagree
    // decisively, so the assertion genuinely discriminates the encodings
    def vec(dir: Int, i: Int, scale: Float, off: Float): Array[Float] = {
      val r = new scala.util.Random(dir * 5003 + i)
      Array.tabulate(Dim)(d =>
        ((if (d % 2 == dir) 1.0f else off) +
          (r.nextDouble() * 0.02 - 0.01).toFloat) * scale)
    }
    val rows =
      (0 until 40).map(i => mem(f"small_$i%03d", vec(0, i, 1f, 0.05f))) ++
      (0 until 40).map(i => mem(f"big_$i%03d", vec(1, i, 10f, 0.3f)))
    val mems = rows.toDF().repartition(4).cache()
    val path = java.nio.file.Files
      .createTempDirectory("pq_batch_norm").toString
    BatchRecall.buildPqVectorIndex(mems, path, m = 8, ksub = 16)
    val qs = Seq((1, "clustered corpus row", vec(0, 99, 1f, 0.05f).toSeq))
      .toDF("qid", "query", "qvec")
    // refine=1: candidates = exactly the ADC top-overfetch — the cut an
    // unnormalized code table loses to the big-norm cluster
    val top = BatchRecall
      .batchRecall(mems, spark.emptyDataFrame, qs, limit = 10, now = now,
        pq = Some(BatchRecall.PqChannel(path, nprobe = 64, refine = 1)))
      .orderBy("rank").select("id").collect().map(_.getString(0))
    assert(top.nonEmpty && top.forall(_.startsWith("small_")),
      s"ADC cut must rank by cosine, not raw dot: ${top.toSeq}")
    mems.unpersist()
  }

  test("refined scores are full precision: a stored vector's own query " +
    "returns it at sim exactly 1.0 through the channel") {
    val path = java.nio.file.Files
      .createTempDirectory("pq_batch_exact").toString
    BatchRecall.buildPqVectorIndex(memories, path, m = 8, ksub = 16)
    import spark.implicits._
    val self = jitter(3, 7, 0.05) // m03_007's exact embedding
    val qs = Seq((1, "clustered corpus row", self.toSeq))
      .toDF("qid", "query", "qvec")
    val top = BatchRecall
      .batchRecall(memories, spark.emptyDataFrame, qs, limit = 3, now = now,
        pq = Some(BatchRecall.PqChannel(path, nprobe = 64, refine = 8)))
      .orderBy("rank").select("id", "s_vector").collect()
    assert(top.head.getString(0) == "m03_007", s"${top.toSeq}")
    assert(top.head.getDouble(1) == 1.0, s"${top.toSeq}")
  }
}
