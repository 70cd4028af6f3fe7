package graft.tools

import graft.domain.BatchRecall
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the batch keyword channel's two forms at a million rows (r16,
  * follow-up to `KeywordStageProbe`): the inverted-index form (pair
  * materialization — the measured common-token fan-out) vs the one-scan
  * expression form (`kwSingle`, qid-generic, no pairs), end-to-end through
  * the FULL batch plan, interleaved, with a bitwise result compare.
  *
  * Run: `sbt "runMain graft.tools.KeywordFormProbe [nDocs] [nQueries]"`
  */
object KeywordFormProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nq = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

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
      lit(false).as("protected_flag"),
      array_repeat(lit(0.1f), 8).as("embedding"))
      .repartition(32).cache()
    println(s"corpus rows = ${mems.count()}")
    import spark.implicits._
    val queries = (0 until nq).map(q =>
      (q.toLong, s"note number ${(q.toLong * 9973) % n}")).toDF("qid", "query")
    val idx = BatchRecall.buildIndex(mems).cache().materialize()
    val now = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")

    def run(form: String): (Double, Seq[String]) = {
      val t = System.nanoTime()
      val rows = BatchRecall.batchRecall(mems, spark.emptyDataFrame, queries,
        limit = 5, now = now, index = Some(idx), keywordForm = form)
        .collect()
      ((System.nanoTime() - t) / 1e9, rows.map(_.toString).sorted.toSeq)
    }
    run("index"); run("scan") // warm
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    var results = Map[String, Seq[String]]()
    for (_ <- 1 to 2; form <- Seq("index", "scan")) {
      val (secs, rows) = run(form)
      times(form) = secs :: times(form)
      results += form -> rows
    }
    Seq("index", "scan").foreach { f =>
      println(f"[kwform] $f%-6s best ${times(f).min}%6.1f s " +
        f"(${times(f).min * 1000 / nq}%6.1f ms/q)")
    }
    val same = results("index") == results("scan")
    println(s"[kwform] bitwise equal results: $same " +
      s"(${results("index").size} rows)")
    require(same, "the two keyword forms must produce identical results")
    mems.unpersist(); idx.unpersist()
    spark.stop()
  }
}
