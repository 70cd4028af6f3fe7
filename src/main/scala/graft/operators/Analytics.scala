package graft.operators

import graft.Tables
import graft.functions.round4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Analytics aggregations A1-A10 from SURVEY.md §2.6 (`/analyze`,
  * `/graph/stats` shapes, `automem/api/recall.py:2756-2887`,
  * `automem/api/graph.py:386-421`) over the driver test tables. All are
  * single hash-aggregate plans with map-side partial aggregation — the
  * shuffle carries only group keys, safe at any scale.
  */
object Analytics {

  /** A1: count + avg by type, ordered by count desc (`recall.py:2756-2768`). */
  def countByType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round4(avg(col("value"))).as("avg_value"))
      .orderBy(desc("n"), asc("event_type"))

  val countByTypeSql: String =
    """SELECT event_type, count(*) AS n, round((avg(value)) + 1e-9, 4) + 0.0 AS avg_value
       FROM events GROUP BY 1 ORDER BY n DESC, event_type"""

  /** A2: relationship counts by type (`automem/api/graph.py:386-392`):
    * `edges.groupBy(rel_type).count()` — here over the lineitem "edge list"
    * keyed by ship mode, with the distinct-endpoint variant alongside.
    */
  def edgeTypeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_edges"),
        countDistinct(col("l_orderkey")).as("n_src"))
      .orderBy("l_returnflag", "l_linestatus")

  val edgeTypeCountsSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_edges,
       count(DISTINCT l_orderkey) AS n_src
       FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""

  /** A3: importance-bucket distribution (`graph.py:395-406`). */
  def importanceDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        when(col("o_totalprice") >= 300000, "high")
          .when(col("o_totalprice") >= 100000, "medium")
          .otherwise("low").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  val importanceDistributionSql: String =
    """SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
              WHEN o_totalprice >= 100000 THEN 'medium'
              ELSE 'low' END AS bucket, count(*) AS n
       FROM orders GROUP BY 1 ORDER BY 1"""

  /** A4: confidence-bucket distribution (`analytics/runtime_helpers.py:208-223`). */
  def confidenceDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(
        when(col("l_discount") < 0.03, "low")
          .when(col("l_discount") < 0.07, "medium")
          .otherwise("high").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  val confidenceDistributionSql: String =
    """SELECT CASE WHEN l_discount < 0.03 THEN 'low'
              WHEN l_discount < 0.07 THEN 'medium'
              ELSE 'high' END AS bucket, count(*) AS n
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  /** A8: recent activity per day in the last week of the events range
    * (`graph.py:409-421`).
    */
  def recentByDay(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-24").cast("timestamp"))
      .groupBy(to_date(col("ts")).cast("string").as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day")

  val recentByDaySql: String =
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, count(*) AS n FROM events
       WHERE ts >= TIMESTAMP '2024-01-24' GROUP BY 1 ORDER BY 1"""

  /** A9: relationship count per source id — count distinct neighbors
    * (`consolidation.py:201-225`; the hourly cache disappears in batch).
    */
  def relCountPerKey(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        count(lit(1)).as("n_items"))
      .orderBy("l_orderkey")

  val relCountPerKeySql: String =
    """SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp, count(*) AS n_items
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  /** Rollup aggregation (grouping sets — absent in the reference, free in
    * Spark/Catalyst; SURVEY §2.6 note). Null grouping keys are coalesced to
    * a sentinel so cross-engine null ordering never matters.
    */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("gross_cents"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"),
        col("gross_cents"), col("n"))
      .orderBy("flag", "status")

  val revenueRollupSql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS flag,
       coalesce(l_linestatus, '(all)') AS status,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS gross_cents,
       count(*) AS n
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       ORDER BY 1, 2"""

  /** CUBE over (orderstatus, orderpriority) — completes the grouping-sets
    * family next to [[revenueRollup]] (SURVEY §2.6 notes these are Catalyst
    * freebies the reference lacks): all four grouping combinations in one
    * pass, one expanded shuffle.
    */
  def shipmodeCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("total_cents"))
      .orderBy("status", "priority")

  val shipmodeCubeSql: String =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       ORDER BY 1, 2"""

  /** Scalar date/time function family (SURVEY §2.9): trunc, day-of-week,
    * calendar parts, day difference to an anchor.
    */
  def dateParts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        to_date(date_trunc("day", col("ts"))).cast("string").as("day"),
        dayofweek(col("ts")).as("dw"),
        hour(col("ts")).as("hr"),
        dayofmonth(col("ts")).as("dom"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("age_days"))
      .orderBy("event_id")

  val datePartsSql: String =
    """SELECT event_id, CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
       CAST(date_part('dow', ts) + 1 AS INT) AS dw,
       CAST(hour(ts) AS INT) AS hr,
       CAST(day(ts) AS INT) AS dom,
       CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS age_days
       FROM events ORDER BY event_id"""

  /** A7: top-k preference edges by EFFECTIVE strength (`recall.py:2770-2807`)
    * — the reference coalesces strength/score/confidence per edge, so an
    * edge carrying only a confidence-like metric ranks by it instead of
    * sorting as null. Orders rows stand in as PREFERS_OVER edges; which
    * metric column is populated rotates by key so every coalesce branch is
    * exercised, and the effective strength is rounded engine-stably BEFORE
    * ranking (TakeOrderedAndProject — per-partition top-k, no global sort).
    */
  def topPreferences(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_custkey").as("src"), col("o_orderkey").as("dst"),
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") / 600000.0)
          .as("strength"),
        when(col("o_orderkey") % 3 === 1, col("o_totalprice") / 800000.0)
          .as("score"),
        when(col("o_orderkey") % 3 === 2, col("o_totalprice") / 1000000.0)
          .as("confidence"))
      .withColumn("effective",
        round4(coalesce(col("strength"), col("score"), col("confidence"), lit(0.0))))
      .withColumn("basis",
        when(col("strength").isNotNull, "strength")
          .when(col("score").isNotNull, "score")
          .otherwise("confidence"))
      .select(col("src"), col("dst"), col("effective"), col("basis"))
      .orderBy(desc("effective"), asc("src"), asc("dst"))
      .limit(k)

  val topPreferencesSql: String =
    """WITH e AS (SELECT o_custkey AS src, o_orderkey AS dst,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice / 600000.0 END AS strength,
         CASE WHEN o_orderkey % 3 = 1 THEN o_totalprice / 800000.0 END AS score,
         CASE WHEN o_orderkey % 3 = 2 THEN o_totalprice / 1000000.0 END AS confidence
         FROM orders)
       SELECT src, dst,
         round(coalesce(strength, score, confidence, 0.0) + 1e-9, 4) + 0.0 AS effective,
         CASE WHEN strength IS NOT NULL THEN 'strength'
              WHEN score IS NOT NULL THEN 'score'
              ELSE 'confidence' END AS basis
       FROM e ORDER BY effective DESC, src ASC, dst ASC LIMIT 10"""
}
