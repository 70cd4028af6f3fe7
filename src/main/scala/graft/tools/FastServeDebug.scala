package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print fast vs replanned rows for one query (default: empty
  * string — the validation class that caught the r11 fast-path mismatch).
  */
object FastServeDebug {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val memories = LabCorpus.corpus(spark).repartition(4).cache()
    memories.count()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val prepared = new graft.domain.PreparedRecall(memories,
      spark.emptyDataFrame, limit = 10, now = LabCorpus.Now,
      vocabParallelism = 4)
    println(s"[gate] ${prepared.fastPathDiagnosis}")
    val slow = prepared.recallReplanned(q).collect().map(_.toString)
    println(s"--- replanned (${slow.length}):"); slow.foreach(println)
    prepared.fastRecallUnsafe(q) match {
      case Some(df) =>
        val fast = df.collect().map(_.toString)
        println(s"--- fast (${fast.length}):"); fast.foreach(println)
      case None => println("--- fast path declined")
    }
    spark.stop()
  }
}
