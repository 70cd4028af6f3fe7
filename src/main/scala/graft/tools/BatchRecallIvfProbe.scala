package graft.tools

import graft.domain.BatchRecall
import graft.operators.RecallPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the IVF-prefiltered vector channel (r16, VERDICT r15
  * item 1) on the oracle-gated batch-recall corpus: the brute corpus x
  * queries cosine scan vs the partition-pruned IVF candidate scan at
  * several nprobe settings, alternating runs so box drift cannot bias one
  * arm. Reports wall ms/query, result overlap@5 vs brute, and the
  * nprobe=all bitwise-parity check.
  *
  * Two suites: the natural sf corpus (sf0.1 = 2,000 vectors — small enough
  * that BOTH arms are compute-trivial and the probe pins parity + honest
  * overhead), and a replicated corpus (default x50 = 100k rows) where the
  * brute channel's queries x corpus cosine grid dominates and the pruned
  * scan's ~nprobe/cells candidate reduction shows as the per-query win the
  * at-scale claim rests on.
  *
  * Run: `sbt "runMain graft.tools.BatchRecallIvfProbe [sfDir] [scale]"`
  */
object BatchRecallIvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scale = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (mems0, queries) = RecallPipeline.batchRecall100Inputs(spark, dir)
    runSuite(spark, mems0, queries, s"natural ($dir)")
    if (scale > 1) {
      // replicate rows under fresh ids: same cluster structure, x`scale`
      // corpus — the regime where candidate-scan reduction dominates
      val scaled = mems0.crossJoin(spark.range(scale).toDF("_rep"))
        .withColumn("id", concat_ws("_", col("id"), col("_rep")))
        .drop("_rep")
        .repartition(32).cache()
      runSuite(spark, scaled, queries, s"replicated x$scale")
      vectorChannelSuite(spark, scaled, queries)
      scaled.unpersist()
    }
    mems0.unpersist()
    spark.stop()
  }

  /** The vector CHANNEL in isolation at a realistic embedding width (the
    * test corpus carries dim-8 vectors; the reference serves 768-1536-dim
    * OpenAI/fastembed vectors, where the cosine grid is the request's
    * dominant cost): both arms score candidates and cut per-qid
    * top-overfetch, brute over corpus x queries, IVF over the
    * partition-pruned probed cells. This is the component the IvfChannel
    * replaces — end-to-end times dilute it behind the shared keyword/
    * metadata channels.
    */
  private def vectorChannelSuite(spark: SparkSession, mems: DataFrame,
      queries: DataFrame): Unit = {
    import graft.functions.VectorFunctions.cosineSim
    import org.apache.spark.sql.expressions.Window
    val dimUp = (c: org.apache.spark.sql.Column) =>
      flatten(array_repeat(c, 32)) // dim 8 -> 256
    val base = mems.select(col("id"), dimUp(col("embedding")).as("embedding"))
      .repartition(32).cache()
    val nRows = base.count()
    val q = queries.select(col("qid"), dimUp(col("qvec")).as("qvec")).cache()
    val nq = q.count()
    println(s"== suite: vector channel only, dim=256 — corpus=$nRows rows, $nq queries")
    val path = java.nio.file.Files
      .createTempDirectory("ivf_vec_probe").toString
    val t0 = System.nanoTime()
    graft.operators.IvfIndex.buildKMeans(
      base.withColumn("vec_id", xxhash64(col("id"))), path, 64)
    println(f"index build (kmeans k=64, dim 256): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val overfetch = 20
    def cut(scored: DataFrame): Long = {
      val w = Window.partitionBy(col("qid"))
        .orderBy(desc("s"), asc("id"))
      scored.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= overfetch).count()
    }
    def brute(): Long = cut(
      base.crossJoin(broadcast(q))
        .select(col("qid"), col("id"),
          cosineSim(col("embedding"), col("qvec")).as("s")))
    def ivf(nprobe: Int): Long = {
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val qz = graft.operators.IvfIndex.loadQuantizer(spark, path)
      val probeRows = q.collect().flatMap { r =>
        val qv = r.getSeq[Float](1)
        graft.operators.IvfIndex.probeCellsLocal(qz, qv.toArray, nprobe)
          .map(c => Row(r.get(0), c, qv))
      }
      val qcells = spark.createDataFrame(probeRows.toSeq.asJava,
        StructType(Seq(StructField("qid", q.schema("qid").dataType),
          StructField("cell", LongType),
          StructField("qvec", ArrayType(FloatType, containsNull = false)))))
      val allCells = probeRows.map(_.getLong(1)).distinct.toSeq
      cut(spark.read.parquet(s"$path/assignments")
        .filter(col("cell").isin(allCells: _*))
        .join(broadcast(qcells), Seq("cell"))
        .select(col("qid"), col("id"),
          cosineSim(col("embedding"), col("qvec")).as("s")))
    }
    def time(f: => Long): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    brute(); ivf(8) // warm
    val arms: Seq[(String, () => Long)] = Seq(
      "brute" -> (() => brute()),
      "ivf_n2" -> (() => ivf(2)), "ivf_n4" -> (() => ivf(4)),
      "ivf_n8" -> (() => ivf(8)))
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to 3; (name, f) <- arms) times(name) = time(f()) :: times(name)
    println(f"${"arm"}%-8s ${"ms/q median"}%12s")
    arms.foreach { case (name, _) =>
      val ts = times(name).sorted
      println(f"$name%-8s ${ts(ts.length / 2) * 1000.0 / nq}%12.2f")
    }
    base.unpersist(); q.unpersist()
  }

  private def runSuite(spark: SparkSession, mems: DataFrame,
      queries: DataFrame, label: String): Unit = {
    val nq = queries.count()
    println(s"== suite: $label — corpus=${mems.count()} rows, $nq queries")
    val idx = BatchRecall.buildIndex(mems).cache().materialize()
    val path = java.nio.file.Files
      .createTempDirectory("ivf_ab_probe").toString
    val t0 = System.nanoTime()
    BatchRecall.buildVectorIndex(mems, path, kmeansK = 64)
    println(f"index build (kmeans k=64): ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val now = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    def run(ivf: Option[BatchRecall.IvfChannel])
        : (Double, Map[Long, Seq[String]]) = {
      val t = System.nanoTime()
      val rows = BatchRecall.batchRecall(mems, spark.emptyDataFrame, queries,
        limit = 5, now = now, roundScores = true, index = Some(idx),
        ivf = ivf).collect()
      val secs = (System.nanoTime() - t) / 1e9
      val byQid = rows.groupBy(_.getAs[Long]("qid")).view
        .mapValues(_.sortBy(_.getAs[Long]("rank"))
          .map(_.getAs[String]("id")).toSeq).toMap
      (secs, byQid)
    }

    // warm both arms once (cache fill, codegen)
    run(None); run(Some(BatchRecall.IvfChannel(path, 8)))

    val arms: Seq[(String, Option[BatchRecall.IvfChannel])] = Seq(
      "brute" -> None,
      "ivf_n2" -> Some(BatchRecall.IvfChannel(path, 2)),
      "ivf_n4" -> Some(BatchRecall.IvfChannel(path, 4)),
      "ivf_n8" -> Some(BatchRecall.IvfChannel(path, 8)),
      "ivf_n64" -> Some(BatchRecall.IvfChannel(path, 64)))
    val rounds = 3
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    var results = Map[String, Map[Long, Seq[String]]]()
    for (_ <- 1 to rounds; (name, iv) <- arms) {
      val (secs, byQid) = run(iv)
      times(name) = secs :: times(name)
      results += name -> byQid
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
    println(f"${"arm"}%-8s ${"ms/q median"}%12s ${"overlap@5"}%10s")
    arms.foreach { case (name, _) =>
      val ts = times(name).sorted
      val med = ts(ts.length / 2) * 1000.0 / nq
      println(f"$name%-8s $med%12.2f ${overlap(results(name))}%10.3f")
    }
    val parity = results("ivf_n64") == brute
    println(s"nprobe=64 bitwise id parity vs brute: $parity")
    require(parity, "nprobe=all must reproduce brute-force ids exactly")
    idx.unpersist()
  }
}
