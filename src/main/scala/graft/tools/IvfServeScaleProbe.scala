package graft.tools

import graft.domain.BatchRecall
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** END-TO-END batch recall at 10^6 memories, brute vs IVF-prefiltered
  * vector channel (r16 companion to `BatchRecallIvfProbe`): the oracle
  * corpus (2k vectors) is too small for the pre-filter to matter
  * end-to-end, so this probe synthesizes a clustered million-row corpus
  * (dim 32, 64 content clusters) — the regime the IvfChannel option
  * exists for — and runs the FULL three-channel batch plan both ways,
  * interleaved. The brute vector channel is a 10^8-pair cosine grid; the
  * IVF arm reads ~nprobe/64 of the corpus through static partition
  * pruning. Also reports top-5 id overlap vs brute, plus (r17) the PQ
  * channel arms over the same corpus with the on-disk bytes of both
  * index layouts — the ~32x code-table shrink is PQ's reason to exist.
  *
  * Run: `sbt "runMain graft.tools.IvfServeScaleProbe [nDocs] [nQueries]"`
  */
object IvfServeScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nq = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def clusteredVec(idCol: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(31)), d =>
        (sin((idCol % 64).cast("double") * 7.3 + d.cast("double") * 1.1) +
          ((abs(xxhash64(idCol * 33 + d)) % 1000).cast("double") / 1000.0
            - 0.5) * 0.1).cast("float"))
    val ts0 = to_timestamp(lit("2026-01-01 00:00:00"))
    val mems = spark.range(n).select(
      col("id").cast("string").as("id"),
      concat(lit("scale note number "), col("id").cast("string"),
        lit(" in group "), (col("id") % 64).cast("string")).as("content"),
      ts0.as("timestamp"), ts0.as("t_valid"),
      lit(null).cast("timestamp").as("t_invalid"),
      ts0.as("updated_at"), ts0.as("last_accessed"),
      lit(0.5).as("importance"), lit(0.7).as("confidence"),
      lit("Context").as("type"), array(lit("scale")).as("tags"),
      array(lit("scale")).as("tag_prefixes"), lit("{}").as("metadata"),
      lit(1.0).as("relevance_score"), lit(false).as("archived"),
      lit(false).as("protected_flag"), clusteredVec(col("id")).as("embedding"))
      .repartition(32).cache()
    println(s"corpus rows = ${mems.count()}")
    val queries = spark.range(nq).select(
      col("id").as("qid"),
      concat(lit("note number "), (col("id") * 9973 % n).cast("string"))
        .as("query"),
      clusteredVec(col("id") * 104729 + 17).as("qvec"))

    val t0 = System.nanoTime()
    val idx = BatchRecall.buildIndex(mems).cache().materialize()
    println(f"keyword index build+materialize: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val path = java.nio.file.Files
      .createTempDirectory("ivf_scale_probe").toString
    val t1 = System.nanoTime()
    BatchRecall.buildVectorIndex(mems, path, kmeansK = 64)
    println(f"ivf index build (kmeans k=64, dim 32, n=$n): ${(System.nanoTime() - t1) / 1e9}%.1f s")
    // the PQ tier over the SAME corpus (r17, VERDICT r16 item 5): the
    // serving channel the 32x-compressed code table exists for
    val pqPath = java.nio.file.Files
      .createTempDirectory("pq_scale_probe").toString
    val t2 = System.nanoTime()
    // ksub=32: at ksub=16 this corpus' 64 repeated cluster patterns
    // collide into shared codes, ADC scores tie exactly, and the
    // deterministic asc-id tie-break fills the candidate cut with
    // wrong-cluster rows whose ids are globally smaller — measured
    // overlap@5 = 0.000 at refine=4. Doubling the sub-codebooks breaks
    // the code collisions (the PqKnobProbe/r16-bench doctrine: PQ's
    // honest setting on hard corpora is ksub=32 + refine=16).
    BatchRecall.buildPqVectorIndex(mems, pqPath, m = 8, ksub = 32)
    println(f"pq index build (m=8 ksub=32, dim 32, n=$n): ${(System.nanoTime() - t2) / 1e9}%.1f s")
    val ivfBytes = graft.operators.PqIndex.assignBytes(path)
    val pqBytes = graft.operators.PqIndex.assignBytes(pqPath)
    println(f"assignments on disk: ivf fp32 ${ivfBytes / 1048576.0}%.1f MiB, " +
      f"pq codes ${pqBytes / 1048576.0}%.1f MiB " +
      f"(${ivfBytes.toDouble / pqBytes}%.1fx smaller)")

    val now = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
    // id overlap AND top-5 vector-score sums: this corpus' clusters are
    // 15k-row NEAR-TIE PLATEAUS (members differ by ~1e-3 noise), so the
    // exact top-5 ids are decided below any quantized index's resolution
    // — id overlap is the wrong ruler for the PQ arm (the IVF arms score
    // exactly inside probed cells and reproduce ids bitwise). The score
    // REGRET (1 - pq_top5_scores / brute_top5_scores) measures what a
    // user actually loses: near-zero means equivalently-good neighbors
    // under different ids.
    def run(ivf: Option[BatchRecall.IvfChannel],
        pq: Option[BatchRecall.PqChannel] = None)
        : (Double, Map[Long, Seq[String]], Map[Long, Double]) = {
      val t = System.nanoTime()
      val rows = BatchRecall.batchRecall(mems, spark.emptyDataFrame, queries,
        limit = 5, now = now, index = Some(idx), ivf = ivf, pq = pq).collect()
      val secs = (System.nanoTime() - t) / 1e9
      val byQid = rows.groupBy(_.getAs[Long]("qid"))
      (secs,
        byQid.view.mapValues(_.sortBy(_.getAs[Long]("rank"))
          .map(_.getAs[String]("id")).toSeq).toMap,
        byQid.view.mapValues(_.map(_.getAs[Double]("s_vector")).sum).toMap)
    }
    run(None); run(Some(BatchRecall.IvfChannel(path, 8))) // warm
    run(None, Some(BatchRecall.PqChannel(pqPath, 8, refine = 16)))
    val arms: Seq[(String, Option[BatchRecall.IvfChannel],
        Option[BatchRecall.PqChannel])] = Seq(
      ("brute", None, None),
      ("ivf_n4", Some(BatchRecall.IvfChannel(path, 4)), None),
      ("ivf_n8", Some(BatchRecall.IvfChannel(path, 8)), None),
      ("pq_n4", None, Some(BatchRecall.PqChannel(pqPath, 4, refine = 16))),
      ("pq_n8", None, Some(BatchRecall.PqChannel(pqPath, 8, refine = 16))))
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    var results = Map[String, Map[Long, Seq[String]]]()
    var scores = Map[String, Map[Long, Double]]()
    for (_ <- 1 to 2; (name, iv, pqc) <- arms) {
      val (secs, byQid, sc) = run(iv, pqc)
      times(name) = secs :: times(name)
      results += name -> byQid
      scores += name -> sc
    }
    val brute = results("brute")
    def overlap(m: Map[Long, Seq[String]]): Double = {
      val per = brute.keys.toSeq.map { qid =>
        val w = brute(qid).toSet
        if (w.isEmpty) 1.0
        else (w & m.getOrElse(qid, Nil).toSet).size.toDouble / w.size
      }
      per.sum / per.size
    }
    def regret(sc: Map[Long, Double]): Double = {
      val bs = scores("brute")
      val per = bs.keys.toSeq.map { qid =>
        val b = bs(qid)
        if (b <= 0) 0.0 else 1.0 - sc.getOrElse(qid, 0.0) / b
      }
      per.sum / per.size
    }
    println(f"${"arm"}%-8s ${"best s"}%8s ${"ms/q"}%8s ${"overlap@5"}%10s ${"score regret"}%13s")
    arms.foreach { case (name, _, _) =>
      val best = times(name).min
      println(f"$name%-8s $best%8.1f ${best * 1000 / nq}%8.1f " +
        f"${overlap(results(name))}%10.3f ${regret(scores(name))}%13.5f")
    }
    mems.unpersist(); idx.unpersist()
    spark.stop()
  }
}
