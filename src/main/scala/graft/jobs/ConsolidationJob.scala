package graft.jobs

import java.sql.Timestamp

import graft.domain._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** C5 consolidation scheduling, re-expressed for Spark: the reference runs
  * an in-process `ConsolidationScheduler` (`/root/reference/consolidation.py:
  * 1118-1235`) ticking decay daily, creative weekly, cluster monthly,
  * forget quarterly, identity weekly (`config.py:30-55`). A Spark
  * deployment schedules BATCH JOBS externally (cron / Airflow / Dagster)
  * instead of keeping a resident scheduler thread — this main is the unit
  * those schedulers invoke: one mode per run, reading the memories/edges
  * parquet, writing the mode's output parquet. See RUNBOOK.md for the
  * cron/Airflow wiring at the reference's intervals.
  *
  * Usage:
  *   ConsolidationJob <mode> <memoriesPath> <edgesPath> <outPath> [nowIso]
  * mode in {decay, creative, cluster, forget, identity}; `nowIso`
  * (e.g. 2026-08-13T00:00:00) pins the decay clock for reproducible
  * backfills, defaulting to the current time.
  */
object ConsolidationJob {

  val Modes: Seq[String] = Seq("decay", "creative", "cluster", "forget", "identity")

  /** Dispatch one mode; returned frame is the job's output relation. */
  def run(mode: String, memories: DataFrame, edges: DataFrame,
      now: Timestamp): DataFrame = mode match {
    case "decay" => Consolidation.decay(memories, edges, now)
    case "creative" => Consolidation.creativeAssociations(memories, edges, now)
    // cluster returns (cluster summaries, MetaPattern memories); the
    // monthly job's write-back set is the MetaPattern rows, matching the
    // reference's cluster mode creating meta-memories
    case "cluster" => Consolidation.cluster(memories)._2
    case "forget" => Consolidation.forget(memories, edges, now)
    case "identity" =>
      IdentitySynthesis.synthesize(memories, new ExtractiveIdentityWriter)
    case other => throw new IllegalArgumentException(
      s"unknown mode '$other' (expected one of ${Modes.mkString(", ")})")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ConsolidationJob <mode> <memoriesPath> <edgesPath> <outPath> [nowIso]")
    val Array(mode, memPath, edgePath, outPath) = args.take(4)
    val now = args.lift(4)
      .map(s => Timestamp.valueOf(java.time.LocalDateTime.parse(s)))
      .getOrElse(new Timestamp(System.currentTimeMillis()))
    // spark-submit supplies the master in production; GRAFT_MASTER lets
    // the CLI smoke-run standalone (e.g. GRAFT_MASTER=local[32] sbt run)
    val builder = SparkSession.builder()
      .appName(s"graft-consolidation-$mode")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.env.get("GRAFT_MASTER")
      .fold(builder)(builder.master).getOrCreate()
    try {
      val memories = spark.read.parquet(memPath)
      val edges = spark.read.parquet(edgePath)
      run(mode, memories, edges, now)
        .write.mode("overwrite").parquet(outPath)
    } finally spark.stop()
  }
}
