package graft.operators

import graft.Tables
import graft.functions.round4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic relational operator shapes from SURVEY.md §2 (scans, filters,
  * joins, aggregations, windows, set ops) expressed over the driver test
  * tables. Each method is a self-contained, Catalyst-optimizable plan:
  * filters/projections push to the parquet scan, small dimension sides are
  * broadcast, per-group top-k is a window (no self-join), and money aggregates
  * are integerized per row (exact cents) so results are bit-stable across
  * engines and partition orders — which also makes them safe for AQE
  * re-planning at cluster scale.
  */
object Relational {

  /** Exact money sum: per-row round to cents -> bigint, sum in int64. */
  private def cents(c: org.apache.spark.sql.Column) =
    sum(round(c * 100).cast("long"))

  /** A1-style pricing summary over lineitem (reference count-by-type + avg
    * aggregate, `automem/api/recall.py:2756-2768`).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue_cents"),
        round4(avg(col("l_quantity"))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** F1: time-window filter + aggregate over the events table
    * (`runtime_recall_helpers.py:408-418`).
    */
  def timeWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-08").cast("timestamp") &&
        col("ts") < lit("2024-01-15").cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), cents(col("value")).as("value_cents"))
      .orderBy("event_type")

  /** S3: point lookup by id (`automem/api/memory.py:756-787`). */
  def pointLookup(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).filter(col("c_custkey") === 1)

  /** S4: filtered page with deterministic sort + offset/limit pagination
    * (`automem/api/memory.py:285-323`).
    */
  def page(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .offset(20).limit(50)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Broadcast dimension join + aggregate: revenue by part brand. */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue_cents"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")

  /** Semi/anti join: customers with vs without orders, counted by segment
    * (seen-id semantics, SURVEY §2.8).
    */
  def semiAntiCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .withColumn("has_orders", lit(true))
    val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .withColumn("has_orders", lit(false))
    withO.unionByName(withoutO).orderBy("c_mktsegment", "has_orders")
  }

  /** J1 shape: per-key top-k by rank — window row_number, then broadcast-join
    * the dimension after the cut (join-after-limit plan shape,
    * `automem/search/runtime_relations.py:21-76`).
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val top = Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    top.join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** A5: hour-of-day histogram (`automem/api/recall.py:2809-2833`). */
  def hourHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(hour(col("ts")).cast("int").as("hr"))
      .agg(count(lit(1)).as("n"), round4(avg(col("value"))).as("avg_value"))
      .orderBy("hr")

  /** A6: token frequency top-50 (`automem/api/recall.py:2837-2865`). */
  def wordFrequency(spark: SparkSession, dir: String, topN: Int = 50): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .filter(length(col("token")) >= 3)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(topN)

  /** E1: temporal-link counting — events by the same user in the trailing 7
    * days, as a range-frame window (no self-join; the reference's one
    * non-equi join, `enrichment/runtime_helpers.py:15-71`).
    */
  def trailingWindowCount(spark: SparkSession, dir: String): DataFrame = {
    val sevenDaysMs = 7L * 24 * 3600 * 1000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
      .rangeBetween(-sevenDaysMs, -1)
    Tables.events(spark, dir)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("n_prior_7d", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("n_prior_7d"))
      .orderBy("event_id")
  }

  /** Batch sessionization (gaps-and-islands): events of one user belong to
    * the same session while gaps stay under 30 minutes; lag + running sum
    * assigns session ids, then per-user session stats. The batch counterpart
    * of the streaming `mapGroupsWithState` sessionizer.
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val gapMs = 30L * 60 * 1000
    val sessions = Tables.events(spark, dir)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("new_session",
        when(lag(col("ts_ms"), 1).over(byUser).isNull ||
          col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) > gapMs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    sessions.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("total_events"),
        max(col("n_events")).as("max_session_events"))
      .orderBy("user_id")
  }

  val sessionStatsSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events),
       flagged AS (SELECT user_id, event_id, ts_ms,
           CASE WHEN lag(ts_ms, 1) OVER w IS NULL
                  OR ts_ms - lag(ts_ms, 1) OVER w > 1800000 THEN 1
                ELSE 0 END AS new_session
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
       sess AS (SELECT user_id, event_id,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
             ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged),
       per_session AS (SELECT user_id, session_id, count(*) AS n_events
         FROM sess GROUP BY 1, 2)
       SELECT user_id, count(*) AS n_sessions,
         CAST(sum(n_events) AS BIGINT) AS total_events,
         max(n_events) AS max_session_events
       FROM per_session GROUP BY 1 ORDER BY 1"""

  /** As-of join (trades/quotes shape): each purchase event picks up the
    * user's most recent STRICTLY-PRIOR click (order (ts, event_id), so
    * same-timestamp ties resolve deterministically). Implemented as the
    * scalable union-window as-of: both event kinds ride ONE stream
    * partitioned by user, and `last(click_field, ignoreNulls)` over
    * rows-unbounded-preceding..-1 carries the latest click forward — no
    * range join, no per-row probe, one shuffle on the join key, O(1) window
    * state per row. The naive alternative (theta-join click.ts <= purchase
    * .ts + per-pair max) explodes quadratically per hot user at 100 TB;
    * this plan is linear and is also the shape that ports to a watermarked
    * stream.
    */
  def asofClickForPurchase(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the id and value ride ONE struct through a single last(): two
    // independent ignoreNulls windows would pair the latest click's id
    // with an OLDER click's value whenever the latest click has a null
    // value — a silent mismatched-pair bug
    Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .withColumn("click",
        when(col("event_type") === "click",
          struct(col("event_id").as("id"), col("value").as("v"))))
      .withColumn("asof", last(col("click"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("asof.id").as("asof_click_id"),
        col("asof.v").as("asof_click_value"))
      .orderBy("event_id")
  }

  val asofClickForPurchaseSql: String =
    """WITH ev AS (SELECT event_id, user_id, event_type, ts, value
         FROM events WHERE event_type IN ('purchase', 'click')),
       t AS (SELECT event_id, user_id, event_type,
           last_value(CASE WHEN event_type = 'click'
               THEN struct_pack(id := event_id, v := value) END IGNORE NULLS)
             OVER w AS pc
         FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       SELECT event_id, user_id, pc.id AS asof_click_id,
         pc.v AS asof_click_value
       FROM t WHERE event_type = 'purchase' ORDER BY event_id"""

  /** Sequential conversion funnel over the event stream: users reaching
    * signup -> a click AFTER their first signup -> a purchase AFTER that
    * first qualifying click. The ORDER constraint is what distinguishes a
    * funnel from three existence counts (a purchase before signup does not
    * convert), and it composes as two chained per-user window minima —
    * each stage's anchor timestamp is a window over the previous stage's
    * column, no self-joins, one shuffle on user_id. At 100 TB this is the
    * same single-pass shape; the windows stay narrow per user.
    */
  def conversionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .withColumn("t1",
        min(when(col("event_type") === "signup", col("ts"))).over(byUser))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts") > col("t1"), col("ts"))).over(byUser))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts") > col("t2"), col("ts"))).over(byUser))
      .agg(
        countDistinct(when(col("t1").isNotNull, col("user_id")))
          .as("n_signup"),
        countDistinct(when(col("t2").isNotNull, col("user_id")))
          .as("n_click_after"),
        countDistinct(when(col("t3").isNotNull, col("user_id")))
          .as("n_purchase_after"))
  }

  val conversionFunnelSql: String =
    """WITH s1 AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id) AS t1 FROM events),
       s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
           THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM s1),
       s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
           THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM s2)
       SELECT count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END)
           AS n_signup,
         count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END)
           AS n_click_after,
         count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END)
           AS n_purchase_after
       FROM s3"""

  /** Set ops: customers with 'O' orders EXCEPT customers with 'F' orders
    * (sync-diff shape, `automem/sync/accounting.py:44-111`).
    */
  def setDiffCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val openC = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val fullC = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    openC.except(fullC).orderBy("o_custkey")
  }

  /** J6 shape: bounded multi-hop traversal customer -> orders -> lineitem ->
    * part, aggregated (equi-join chain; Catalyst reorders + broadcasts).
    */
  def multiHopRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("c_mktsegment"), col("p_brand"))
      .agg(cents(col("l_extendedprice")).as("gross_cents"), count(lit(1)).as("n"))
      .orderBy("c_mktsegment", "p_brand")

  /** R8 access bookkeeping as a batch MERGE (`recall.py:2601-2609`, worker
    * `app.py:324-345`): recalled ids get `last_accessed = now`, everyone
    * else keeps theirs — via [[graft.domain.GraphOps.touchLastAccessed]]
    * (left join + conditional overwrite, the deterministic batch rewrite of
    * the reference's per-row async updates). Orders stand in as memories; a
    * modulus picks the "recalled" id set deterministically in both engines.
    */
  def touchAccess(spark: SparkSession, dir: String): DataFrame = {
    val mems = Tables.orders(spark, dir).select(col("o_orderkey").as("id"),
      col("o_orderdate").cast("timestamp").as("last_accessed"))
    val matched = mems.filter(col("id") % 97 === 0).select(col("id"))
    graft.domain.GraphOps.touchLastAccessed(mems, matched,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      .select(col("id"), col("last_accessed").cast("string").as("last_accessed"))
      .orderBy("id")
  }

  val touchAccessSql: String =
    """SELECT o_orderkey AS id,
       CAST(CASE WHEN o_orderkey % 97 = 0 THEN TIMESTAMP '2026-01-01 00:00:00'
            ELSE CAST(o_orderdate AS TIMESTAMP) END AS VARCHAR) AS last_accessed
       FROM orders ORDER BY id"""
}
