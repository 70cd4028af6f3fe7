package graft.tools

import graft.domain.BatchRecall
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage decomposition of the BATCH keyword channel at 10^6 docs (r16):
  * `IvfServeScaleProbe` showed the full request costs ~51 s at a million
  * rows with the vector channel only ~6 s of it — this probe times the
  * keyword channel's stages separately to name the actual dominator.
  *
  * Hypothesis under test: not the vocabulary substring NLJ (pure compute,
  * embarrassingly parallel) but the COMMON-TOKEN HITS EXPLOSION — a query
  * token contained in most documents contributes |matching docs| rows per
  * query that shares it, so `hits ⋈ qtok` materializes
  * O(sum_t df(t) x queries_sharing(t)) rows into the per-(qid, id)
  * aggregate. The stages mirror `BatchRecall.batchRecall`'s kwIndexed
  * expressions verbatim (same relations, same shapes).
  *
  * Run: `sbt "runMain graft.tools.KeywordStageProbe [nDocs] [nQueries]"`
  */
object KeywordStageProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nq = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // the IvfServeScaleProbe corpus' text shape: two corpus-wide common
    // tokens ("note", "number") + one rare id token per doc
    val ts0 = to_timestamp(lit("2026-01-01 00:00:00"))
    val mems = spark.range(n).select(
      col("id").cast("string").as("id"),
      concat(lit("scale note number "), col("id").cast("string"),
        lit(" in group "), (col("id") % 64).cast("string")).as("content"),
      ts0.as("timestamp"), lit(null).cast("timestamp").as("t_invalid"),
      lit(0.5).as("importance"), lit(0.7).as("confidence"),
      lit("Context").as("type"), array(lit("scale")).as("tags"),
      lit("{}").as("metadata"), lit(1.0).as("relevance_score"),
      lit(false).as("archived"),
      array_repeat(lit(0.1f), 8).as("embedding"))
      .repartition(32).cache()
    mems.count()
    val idx = BatchRecall.buildIndex(mems).cache().materialize()
    import spark.implicits._
    val queries = (0 until nq).map(q =>
      (q.toLong, s"note number ${(q.toLong * 9973) % n}")).toDF("qid", "query")
    val q = BatchRecall.requestRelation(queries)
    val (qtok, qtokDistinct) = BatchRecall.requestTokenRelations(q)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[kwstage] $label ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // stage 1: vocabulary substring NLJ (the suspected-but-innocent part)
    val tokMatches = idx.vocab
      .join(broadcast(qtokDistinct), col("ptok").contains(col("tok")))
    val tmCount = time("1 vocab-NLJ (tokMatches)")(tokMatches.count())
    val tokMatchesC = tokMatches.cache(); tokMatchesC.count()
    // stage 2: postings join (hits per matched corpus token)
    val hits = idx.postings.join(broadcast(tokMatchesC), Seq("ptok"))
      .select(col("id"), col("tok"), col("w"))
    val hitsCount = time("2 postings-join (hits)")(hits.count())
    // stage 3: the qid fan-out + per-(qid,id) aggregate — the hypothesis
    val tokHits = hits
      .join(broadcast(qtok), Seq("tok"))
      .groupBy(col("qid"), col("id"))
      .agg(aggregate(collect_set(struct(col("tok"), col("w"))), lit(0L),
        (acc, x) => acc + x.getField("w")).as("tok_raw"))
    val thCount = time("3 qid-fanout + (qid,id) aggregate")(tokHits.count())
    // stage 4: the window cut that follows (per-qid top-overfetch)
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("tok_raw"), asc("id"))
    val cut = time("4 per-qid window cut")(
      tokHits.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 20).count())
    println(s"[kwstage] rows: tokMatches=$tmCount hits=$hitsCount " +
      s"tokHits(qid,id)=$thCount cut=$cut")
    println(f"[kwstage] fanout ratio hits->qid pairs = ${thCount.toDouble / hitsCount}%.1f x")
    mems.unpersist(); idx.unpersist(); tokMatchesC.unpersist()
    spark.stop()
  }
}
