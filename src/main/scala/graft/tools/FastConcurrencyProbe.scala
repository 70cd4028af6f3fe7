package graft.tools

import java.sql.Timestamp

import graft.domain._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch: reproduce + bisect the r11 fast-path concurrency divergence.
  * GRAFT_FAST_LOCK: "none" (default), "build" (lock relationData+folds+
  * transform, execute concurrently), "all" (serialize everything).
  */
object FastConcurrencyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val now = ts("2026-01-10 00:00:00")
    def mem(id: String, content: String, t: String, tags: Seq[String],
        typ: String, importance: Double, metadata: String = "{}"): Memory = {
      val tstamp = ts(t)
      Memory(id, content, tstamp, tstamp, None, tstamp, tstamp, importance,
        0.7, typ, tags.map(_.toLowerCase), Nil, metadata, None,
        enriched = false, processed = false, 1.0, archived = false,
        protected_flag = false, PlaceholderEmbedding.embed(content))
    }
    val memories = Seq(
      mem("m1", "We decided to use postgres for the main database",
        "2026-01-01 10:00:00", Seq("database"), "Decision", 0.9,
        """{"project": "alpha"}"""),
      mem("m2", "postgres connection pooling pattern with pgbouncer",
        "2026-01-02 10:00:00", Seq("database"), "Pattern", 0.6),
      mem("m3", "I prefer dark mode editors", "2026-01-03 10:00:00",
        Seq("preferences"), "Preference", 0.4),
      mem("m4", "Sprint planning notes for project alpha",
        "2026-01-07 10:00:00", Seq("project:alpha"), "Context", 0.5),
      mem("m5", "Old decision: use mysql for storage", "2025-12-01 10:00:00",
        Seq("database"), "Decision", 0.7)).toDF()
    val prepared = new PreparedRecall(memories, Seq.empty[Edge].toDF(),
      limit = 5, now = now)
    println(s"[gate] ${prepared.fastPathDiagnosis}")
    if (sys.env.contains("GRAFT_FAST_PLAN"))
      println(prepared.fastPlanString())
    if (sys.env.contains("GRAFT_FAST_SHARE"))
      println("[mode] GRAFT_FAST_SHARE: per-call clone DISABLED (race repro)")
    val queries = Seq("postgres database", "dark mode editors",
      "project alpha", "connection pooling", "mysql storage",
      "sprint planning notes", "postgres pooling pattern", "*")
    def serve(q: String): Seq[String] =
      prepared.recall(q).orderBy(asc("rank")).select("id").collect()
        .map(_.getString(0)).toSeq
    val want = queries.map(q => q -> serve(q)).toMap // sequential truth
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val bad = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = for (q <- queries; r <- 1 to 5) yield pool.submit(
      new Runnable { override def run(): Unit = {
        val got = try serve(q) catch { case e: Throwable => Seq(s"threw $e") }
        if (got != want(q)) {
          bad.incrementAndGet()
          println(s"[diverge] '$q' r$r got $got want ${want(q)}")
        }
      }})
    tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdownNow()
    println(s"[result] ${bad.get()} divergent calls of ${tasks.size}")
    spark.stop()
  }
}
