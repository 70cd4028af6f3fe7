package graft

import java.sql.Timestamp

import graft.domain._
import graft.jobs.ConsolidationJob
import org.scalatest.funsuite.AnyFunSuite

/** C5 smoke spec (RUNBOOK.md): every scheduler-invoked consolidation mode
  * must run standalone against a parquet corpus — read, compute, write —
  * the way cron/Airflow invokes it, with a pinned `now` for reproducible
  * backfills.
  */
class ConsolidationJobSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  val now: Timestamp = ts("2026-01-10 00:00:00")

  def mem(id: String, content: String, t: String, tags: Seq[String],
      typ: String = "Context", importance: Double = 0.5): Memory = {
    val tstamp = ts(t)
    Memory(id, content, tstamp, tstamp, None, tstamp, tstamp, importance, 0.7,
      typ, tags, Nil, "{}", None, enriched = false, processed = false,
      1.0, archived = false, protected_flag = false,
      PlaceholderEmbedding.embed(content))
  }

  test("every mode runs standalone against a tmp parquet corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-c5").toString
    val memories = (1 to 12).map(i =>
      mem(s"m$i", s"note $i about topic ${i % 3}", s"2026-01-0${i % 9 + 1} 10:00:00",
        Seq("work", s"entity:people:person-${i % 2}"))).toDF()
    val edges = Seq(
      Edge("m1", "m2", "RELATES_TO", Some(0.8), None, None, None, None, None,
        None, now),
      Edge("m2", "m3", "SIMILAR_TO", Some(0.7), None, None, None, None, None,
        None, now)).toDF()
    memories.write.mode("overwrite").parquet(s"$tmp/memories")
    edges.write.mode("overwrite").parquet(s"$tmp/edges")
    val memIn = spark.read.parquet(s"$tmp/memories")
    val edgeIn = spark.read.parquet(s"$tmp/edges")
    ConsolidationJob.Modes.foreach { mode =>
      val out = ConsolidationJob.run(mode, memIn, edgeIn, now)
      out.write.mode("overwrite").parquet(s"$tmp/out-$mode")
      val back = spark.read.parquet(s"$tmp/out-$mode")
      mode match {
        case "decay" =>
          assert(back.count() == 12, "decay must rescore every memory")
          assert(back.columns.contains("relevance_score"))
        case "forget" =>
          assert(back.count() == 12, "forget must emit a fate per memory")
        case "identity" =>
          assert(back.count() == 2, "one profile per entity slug")
          assert(back.columns.contains("identity"))
        case "creative" | "cluster" =>
          // association/cluster yield depends on the corpus; the smoke
          // contract is: runs, writes, re-reads with a stable schema
          assert(back.columns.nonEmpty)
      }
    }
    val err = intercept[IllegalArgumentException] {
      ConsolidationJob.run("nope", memIn, edgeIn, now)
    }
    assert(err.getMessage.contains("unknown mode"))
  }
}
