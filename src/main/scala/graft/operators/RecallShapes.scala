package graft.operators

import graft.Tables
import graft.functions.round4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Recall-pipeline operator shapes from SURVEY.md §2.4/§2.5 (trending,
  * metadata sidecar search, re-ranking, adaptive floor, scope fallback,
  * supersession, graph expansion, tag predicates) expressed over the driver
  * test tables. The full automem-semantic pipeline over memories/edges lives
  * in `graft.domain`; these exercise the same plan shapes under the DuckDB
  * oracle.
  */
object RecallShapes {

  /** The documents-table importance mapping used by every recall shape
    * (length-derived, capped at 1): ONE definition so the three shapes that
    * fold it into scores cannot drift apart. `rawDocImportance` is the
    * unrounded form for shapes that add a bonus BEFORE rounding.
    */
  private def rawDocImportance = least(lit(1.0), col("n_chars") / 500.0)
  private def docImportance = round4(rawDocImportance)

  /** Q4 trending: no-query recall = top-k by importance desc, time desc
    * (`runtime_recall_helpers.py:524-592`). Raw stored doubles — no
    * arithmetic, so values are bit-identical across engines.
    */
  def trending(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("value"))
      .orderBy(desc("value"), asc("event_id"))
      .limit(20)

  val trendingSql: String =
    "SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 20"

  /** Q5 metadata sidecar search: cheap contains-prefilter on the raw JSON
    * string, then typed re-score on the parsed field
    * (`runtime_recall_helpers.py:727-868`); score formula shape mirrors
    * `0.15 + 0.45*value_ratio + 0.20*exact` capped at 1.0.
    */
  def metadataSearch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("props").contains("\"k\""))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k").isNotNull)
      .withColumn("score", round4(
        least(lit(1.0),
          lit(0.15) + lit(0.45) * least(lit(1.0), col("k") / 100.0) +
            lit(0.20) * when(col("k") % 7 === 0, 1.0).otherwise(0.0))))
      .filter(col("score") >= 0.5)
      .select(col("event_id"), col("k"), col("score"))
      .orderBy(desc("score"), asc("event_id"))
      .limit(100)

  val metadataSearchSql: String =
    """SELECT event_id, k, score FROM (
       SELECT event_id, k, round((least(1.0,
           0.15 + 0.45 * least(1.0, k / 100.0) +
           0.20 * (CASE WHEN k % 7 = 0 THEN 1.0 ELSE 0.0 END))) + 1e-9, 4) + 0.0 AS score
       FROM (SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
         FROM events WHERE contains(props, '"k"')) t
       WHERE k IS NOT NULL) s
       WHERE score >= 0.5 ORDER BY score DESC, event_id LIMIT 100"""

  /** R5 priority guarantee (`recall.py:1094-1312`): ids requested as
    * priorities that are absent from the channel results are fetched
    * directly, unioned in, and the final top-k is ordered priority-first —
    * injected priority rows displace the channel tail. The set membership of
    * the final page (channel top-20 vs priority-injected) is what the oracle
    * checks.
    */
  def priorityGuarantee(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"), col("value"))
    val chan = ev.orderBy(desc("value"), asc("event_id")).limit(20)
    val inj = ev.filter(col("event_id").isin(7L, 77L, 777L))
      .join(chan.select("event_id"), Seq("event_id"), "left_anti")
    val pr = when(col("event_id") === 7, 1).when(col("event_id") === 77, 2)
      .when(col("event_id") === 777, 3).otherwise(1000000)
    chan.unionByName(inj)
      .withColumn("pr", pr)
      .orderBy(asc("pr"), desc("value"), asc("event_id"))
      .limit(20)
      .select(col("event_id"), col("value"), (col("pr") < 1000000).as("is_priority"))
  }

  val priorityGuaranteeSql: String =
    """WITH chan AS (SELECT event_id, value FROM events
         ORDER BY value DESC, event_id LIMIT 20),
       u AS (SELECT * FROM chan
         UNION ALL
         SELECT event_id, value FROM events
         WHERE event_id IN (7, 77, 777)
           AND event_id NOT IN (SELECT event_id FROM chan)),
       r AS (SELECT event_id, value,
         CASE event_id WHEN 7 THEN 1 WHEN 77 THEN 2 WHEN 777 THEN 3
           ELSE 1000000 END AS pr FROM u)
       SELECT event_id, value, (pr < 1000000) AS is_priority
       FROM r ORDER BY pr, value DESC, event_id LIMIT 20"""

  /** Q2 tag-only scroll (`runtime_recall_helpers.py:871-937`): no query —
    * a pure tag-membership filter with score := importance, ranked by
    * (importance desc, time desc). Documents' (lang, source) stand in for
    * the tag array; importance derives from length as in the recall
    * pipeline mapping.
    */
  def tagOnlyScroll(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("tags", array(col("lang"), col("source")))
      .filter(arrays_overlap(col("tags"), array(lit("en"), lit("news"))))
      .withColumn("score", docImportance)
      .select(col("doc_id"), col("lang"), col("source"), col("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(50)

  val tagOnlyScrollSql: String =
    """SELECT doc_id, lang, source,
         round((least(1.0, n_chars / 500.0)) + 1e-9, 4) + 0.0 AS score
       FROM documents
       WHERE list_has_any([lang, source], ['en', 'news'])
       ORDER BY score DESC, doc_id LIMIT 50"""

  /** S7 graph snapshot (`automem/api/graph.py:51-208`): nodes filtered and
    * top-N by importance, edges restricted to both-endpoints-visible (J5
    * broadcast semi-join), plus computed visual columns (size from
    * importance, color bucket from type).
    */
  def graphSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val visible = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 0)
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
      .limit(50)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val edges = Tables.orders(spark, dir)
      .join(broadcast(visible.select(col("c_custkey").as("o_custkey"))),
        Seq("o_custkey"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_edges"))
    visible.join(edges, visible("c_custkey") === edges("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        (lit(10) + floor(least(lit(40.0), col("c_acctbal") / 250.0)).cast("int")).as("size"),
        col("c_mktsegment").as("color"))
      .orderBy("c_custkey")
  }

  val graphSnapshotSql: String =
    """WITH visible AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
         WHERE c_acctbal > 0 ORDER BY c_acctbal DESC, c_custkey LIMIT 50),
       e AS (SELECT o_custkey, count(*) AS n_edges FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM visible) GROUP BY 1)
       SELECT c_custkey, coalesce(n_edges, 0) AS n_edges,
         10 + CAST(floor(least(40.0, c_acctbal / 250.0)) AS INT) AS size,
         c_mktsegment AS color
       FROM visible LEFT JOIN e ON c_custkey = o_custkey
       ORDER BY c_custkey"""

  /** S8 health / sync accounting (`automem/sync/accounting.py:28-111`): diff
    * the id sets of the two stores both directions (anti-joins) and report
    * counts — one row, no data movement beyond the two set differences.
    */
  def syncDiff(spark: SparkSession, dir: String): DataFrame = {
    val graphIds = Tables.customer(spark, dir).select(col("c_custkey").as("id"))
    val vectorIds = Tables.orders(spark, dir).select(col("o_custkey").as("id")).distinct()
    val graphOnly = graphIds.join(vectorIds, Seq("id"), "left_anti").count()
    val vectorOnly = vectorIds.join(graphIds, Seq("id"), "left_anti").count()
    import spark.implicits._
    Seq((graphOnly, vectorOnly)).toDF("graph_only", "vector_only")
  }

  val syncDiffSql: String =
    """SELECT
       (SELECT count(*) FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS graph_only,
       (SELECT count(DISTINCT o_custkey) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS vector_only"""

  /** Q6 multi-query union (`recall.py:2201-2223`): two parameterized keyword
    * channels run independently, union, dedup per doc keeping the best score
    * (and counting contributing queries), re-sort.
    */
  def multiQueryUnion(spark: SparkSession, dir: String): DataFrame = {
    def channel(kw: String): DataFrame =
      Tables.documents(spark, dir)
        .filter(lower(col("text")).contains(kw))
        .select(col("doc_id"), docImportance.as("score"))
    channel("spark").unionByName(channel("window"))
      .groupBy(col("doc_id"))
      .agg(max(col("score")).as("best_score"), count(lit(1)).as("n_queries"))
      .orderBy(desc("best_score"), asc("doc_id"))
      .limit(50)
  }

  val multiQueryUnionSql: String =
    """WITH u AS (
         SELECT doc_id, round((least(1.0, n_chars / 500.0)) + 1e-9, 4) + 0.0 AS score
         FROM documents WHERE contains(lower(text), 'spark')
         UNION ALL
         SELECT doc_id, round((least(1.0, n_chars / 500.0)) + 1e-9, 4) + 0.0 AS score
         FROM documents WHERE contains(lower(text), 'window'))
       SELECT doc_id, max(score) AS best_score, count(*) AS n_queries
       FROM u GROUP BY 1 ORDER BY best_score DESC, doc_id LIMIT 50"""

  /** J3 entity-expansion shape (`recall.py:1337-1495`): a bounded seed set
    * yields <= 5 "entities" (here: the seeds' source values); memories
    * sharing an entity join in (prefix-tag join in the domain library),
    * excluding the seeds themselves, each scored with the flat 0.15 boost on
    * top of its base score and capped at an expansion limit.
    */
  def entityExpansion(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val seeds = docs.orderBy(desc("n_chars"), asc("doc_id")).limit(5)
    val entities = seeds.select(col("source")).distinct()
      .orderBy(asc("source")).limit(5)
    docs.join(broadcast(entities), Seq("source"))
      .join(seeds.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("score",
        round4(rawDocImportance + lit(0.15)))
      .select(col("doc_id"), col("source"), col("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(20)
  }

  val entityExpansionSql: String =
    """WITH seeds AS (SELECT doc_id, source FROM documents
         ORDER BY n_chars DESC, doc_id LIMIT 5),
       entities AS (SELECT DISTINCT source FROM seeds ORDER BY source LIMIT 5)
       SELECT doc_id, source,
         round((least(1.0, n_chars / 500.0) + 0.15) + 1e-9, 4) + 0.0 AS score
       FROM documents
       WHERE source IN (SELECT source FROM entities)
         AND doc_id NOT IN (SELECT doc_id FROM seeds)
       ORDER BY score DESC, doc_id LIMIT 20"""

  /** R3 recency-bias style min-max normalization over the candidate set
    * (`recall.py:2315-2349`): norm = (value - min) / (max - min).
    */
  def minMaxRerank(spark: SparkSession, dir: String): DataFrame = {
    // min/max as a scalar aggregate broadcast-joined back: same values as a
    // global window, but no single-partition WindowExec over the corpus
    val events = Tables.events(spark, dir)
    val bounds = events.agg(min(col("value")).as("_min_v"),
      max(col("value")).as("_max_v"))
    events.crossJoin(broadcast(bounds))
      .withColumn("norm", round4(
        (col("value") - col("_min_v")) / (col("_max_v") - col("_min_v"))))
      .select(col("event_id"), col("norm"))
      .orderBy(desc("norm"), asc("event_id"))
      .limit(50)
  }

  val minMaxRerankSql: String =
    """SELECT event_id, norm FROM (
       SELECT event_id, round(((value - min(value) OVER ()) /
         (max(value) OVER () - min(value) OVER ())) + 1e-9, 4) + 0.0 AS norm
       FROM events) t ORDER BY norm DESC, event_id LIMIT 50"""

  /** R4 adaptive-floor gap detection (`recall.py:2351-2375`): within each
    * segment, the largest score gap between consecutive ranked candidates in
    * the top half.
    */
  def largestGap(spark: SparkSession, dir: String): DataFrame =
    largestGap(Tables.customer(spark, dir))

  /** DataFrame-parametric form — needs
    * (c_mktsegment, c_custkey, c_acctbal).
    */
  def largestGap(customers: DataFrame): DataFrame = {
    // Salted exact ranking (r14): c_mktsegment has ~5 values, so a
    // row_number/lag window partitioned by it puts 1/5 OF ALL CUSTOMERS
    // on one task at 100 TB. The rank is instead computed per
    // (segment, integer-dollar bucket of the sort key) — floor(acctbal)
    // is monotone in the (acctbal desc) order, so per-bucket ranks stitch
    // exactly: global rn = count of rows in higher buckets (a one-row-
    // per-bucket prefix, the sequenceChunks integer doctrine) + the
    // within-bucket rank. The consecutive-pair gap needs one value across
    // each bucket boundary — the previous bucket's LAST (= minimum)
    // acctbal, carried on the same tiny per-bucket summary. The final
    // best-gap pick per segment is a max_by aggregate, not a window.
    // (Degenerate bound: all-identical balances collapse into one bucket
    // — value-contiguity is what makes the stitch exact, so an identical-
    // value mass is one group, the same residual the oracle form has.)
    val cust = customers
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("_b", floor(col("c_acctbal")).cast("long"))
    val wb = Window.partitionBy(col("c_mktsegment")).orderBy(desc("_b"))
    val buckets = cust.groupBy(col("c_mktsegment"), col("_b"))
      .agg(count(lit(1)).as("_bn"), min(col("c_acctbal")).as("_blast"))
      .withColumn("_off", coalesce(sum(col("_bn")).over(
        wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_prev_last", lag(col("_blast"), 1).over(wb))
      .withColumn("_n", sum(col("_bn")).over(
        Window.partitionBy(col("c_mktsegment"))))
      .drop("_blast")
    val win = Window.partitionBy(col("c_mktsegment"), col("_b"))
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    val ranked = cust
      .join(buckets, Seq("c_mktsegment", "_b"))
      .withColumn("rn", (col("_off") + row_number().over(win)).cast("int"))
      .withColumn("gap", round4(
        coalesce(lag(col("c_acctbal"), 1).over(win), col("_prev_last")) -
          col("c_acctbal")))
      .filter(col("rn") > 1 && col("rn") <= col("_n") / 2)
    ranked.groupBy(col("c_mktsegment"))
      .agg(max_by(struct(col("c_custkey"), col("gap"), col("rn")),
        struct(col("gap"), -col("rn"))).as("best"))
      .select(col("c_mktsegment"), col("best.c_custkey").as("c_custkey"),
        col("best.gap").as("gap"), col("best.rn").as("rn"))
      .orderBy("c_mktsegment")
  }

  val largestGapSql: String =
    """WITH ranked AS (SELECT c_mktsegment, c_custkey, c_acctbal,
         CAST(row_number() OVER (PARTITION BY c_mktsegment
           ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n,
         round((lag(c_acctbal, 1) OVER (PARTITION BY c_mktsegment
           ORDER BY c_acctbal DESC, c_custkey ASC) - c_acctbal) + 1e-9, 4) + 0.0 AS gap
       FROM customer),
       half AS (SELECT * FROM ranked WHERE rn > 1 AND rn <= n / 2),
       best AS (SELECT *, CAST(row_number() OVER (PARTITION BY c_mktsegment
           ORDER BY gap DESC, rn ASC) AS INT) AS pick FROM half)
       SELECT c_mktsegment, c_custkey, gap, rn FROM best WHERE pick = 1
       ORDER BY c_mktsegment"""

  /** R6 scope fallback (`recall.py:772-914`): scoped results first; if fewer
    * than `limit`, top up from outside the scope (never in-scope rows),
    * flagged `outside_scope`, appended after scoped results.
    */
  def scopeFallback(spark: SparkSession, dir: String, limit: Int = 30): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scoped = docs.filter(col("source") === "src0")
      .orderBy(desc("n_chars"), asc("doc_id")).limit(limit)
      .withColumn("outside_scope", lit(false))
    val nScoped = scoped.count().toInt // bounded by `limit`; parameter fetch
    val fallback = docs.filter(col("source") =!= "src0")
      .orderBy(desc("n_chars"), asc("doc_id")).limit(limit - nScoped)
      .withColumn("outside_scope", lit(true))
    scoped.select(col("doc_id"), col("n_chars"), col("outside_scope"))
      .unionByName(fallback.select(col("doc_id"), col("n_chars"), col("outside_scope")))
      .orderBy(asc("outside_scope"), desc("n_chars"), asc("doc_id"))
  }

  val scopeFallbackSql: String =
    """WITH ranked AS (SELECT doc_id, n_chars, source <> 'src0' AS outside_scope,
         CAST(row_number() OVER (PARTITION BY (source <> 'src0')
           ORDER BY n_chars DESC, doc_id ASC) AS INT) AS rn
       FROM documents),
       n_scoped AS (SELECT count(*) AS n FROM ranked
         WHERE NOT outside_scope AND rn <= 30)
       SELECT doc_id, n_chars, outside_scope FROM ranked
       WHERE (NOT outside_scope AND rn <= 30)
          OR (outside_scope AND rn <= 30 - (SELECT n FROM n_scoped))
       ORDER BY outside_scope ASC, n_chars DESC, doc_id ASC"""

  /** J4-lite supersession head resolution: each event resolves to the newest
    * event of its (user, type) chain (`recall.py:524-593`; the bounded
    * chain-walk with provenance lives in graft.domain.Supersession).
    */
  def supersessionHeads(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(desc("ts"), desc("event_id"))
    Tables.events(spark, dir)
      .withColumn("head_id", first(col("event_id")).over(w))
      .select(col("event_id"), col("head_id"))
      .orderBy("event_id")
  }

  val supersessionHeadsSql: String =
    """SELECT event_id, first_value(event_id) OVER (
         PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS head_id
       FROM events ORDER BY event_id"""

  /** J2 graph expansion: seed set (top-10 by score) expanded 1-hop with
    * score = strength + 0.25 * seed_score, global expansion cap
    * (`recall.py:1498-1700`). Seeds are tiny -> broadcast join.
    */
  def seedExpansion(spark: SparkSession, dir: String): DataFrame = {
    val seeds = Tables.customer(spark, dir)
      .orderBy(desc("c_acctbal"), asc("c_custkey")).limit(10)
      .select(col("c_custkey"), col("c_acctbal"))
    Tables.orders(spark, dir)
      .join(broadcast(seeds), col("o_custkey") === col("c_custkey"))
      .withColumn("score", round4(col("o_totalprice") + lit(0.25) * col("c_acctbal")))
      .select(col("o_orderkey"), col("c_custkey"), col("score"))
      .orderBy(desc("score"), asc("o_orderkey"))
      .limit(25)
  }

  val seedExpansionSql: String =
    """WITH seeds AS (SELECT c_custkey, c_acctbal FROM customer
         ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10)
       SELECT o_orderkey, c_custkey,
         round((o_totalprice + 0.25 * c_acctbal) + 1e-9, 4) + 0.0 AS score
       FROM orders JOIN seeds ON o_custkey = c_custkey
       ORDER BY score DESC, o_orderkey ASC LIMIT 25"""

  /** F2/F3 tag predicates (any / all / prefix / exclude) over a constructed
    * tag array, using the same array predicates the memories table uses
    * (`runtime_recall_helpers.py:420-487`).
    */
  def tagFilters(spark: SparkSession, dir: String): DataFrame = {
    val tags = array(col("lang"), col("source"))
    Tables.documents(spark, dir)
      .withColumn("any_match", arrays_overlap(tags, array(lit("de"), lit("src1"))))
      .withColumn("all_match", forall(array(lit("de"), lit("src2")),
        t => array_contains(tags, t)))
      .withColumn("prefix_match", exists(tags, t => t.startsWith("src1")))
      .withColumn("excluded", exists(tags, t => t.startsWith("zh")))
      .filter(col("any_match") || col("prefix_match"))
      .filter(!col("excluded"))
      .select(col("doc_id"), col("any_match"), col("all_match"), col("prefix_match"))
      .orderBy("doc_id")
  }

  val tagFiltersSql: String =
    """SELECT doc_id, any_match, all_match, prefix_match FROM (
       SELECT doc_id,
         list_has_any([lang, source], ['de', 'src1']) AS any_match,
         list_has_all([lang, source], ['de', 'src2']) AS all_match,
         len(list_filter([lang, source], t -> t LIKE 'src1%')) > 0 AS prefix_match,
         len(list_filter([lang, source], t -> t LIKE 'zh%')) > 0 AS excluded
       FROM documents) t
       WHERE (any_match OR prefix_match) AND NOT excluded ORDER BY doc_id"""

  /** `/startup-recall` preset (r16; `automem/api/recall.py:2683-2740`):
    * two canned tag-membership scans served as one frame — the
    * critical/lesson/ai-assistant top-10 by importance (desc, id-asc
    * tie-break; the reference orders by importance only, so the explicit
    * tie-break is the engine-stability addition) and the
    * system/memory-recall 5-row scan (the reference leaves it unordered;
    * asc id is the deterministic stand-in). Tag vocabularies map onto the
    * documents table's [lang, source] pair; the reference's
    * lesson_count/has_critical/summary fields are response formatting over
    * these rows, not query shape. Each arm is a pushed-down tag filter +
    * TakeOrderedAndProject — no shuffle, no window.
    */
  def startupRecall(spark: SparkSession, dir: String): DataFrame = {
    val tags = array(col("lang"), col("source"))
    val docs = Tables.documents(spark, dir)
    val lessons = docs
      .filter(arrays_overlap(tags, array(lit("de"), lit("es"), lit("src1"))))
      .select(lit("critical_lesson").as("section"), col("doc_id"),
        col("text").as("content"),
        array_join(array_sort(tags), ",").as("tags"),
        docImportance.as("importance"))
      .orderBy(desc("importance"), asc("doc_id")).limit(10)
    val system = docs
      .filter(arrays_overlap(tags, array(lit("fr"), lit("src2"))))
      .select(lit("system_rule").as("section"), col("doc_id"),
        col("text").as("content"),
        array_join(array_sort(tags), ",").as("tags"),
        lit(null).cast("double").as("importance"))
      .orderBy(asc("doc_id")).limit(5)
    lessons.unionByName(system).orderBy("section", "doc_id")
  }

  val startupRecallSql: String =
    """WITH l AS (
         SELECT 'critical_lesson' AS section, doc_id, text AS content,
           array_to_string(list_sort([lang, source]), ',') AS tags,
           round(least(1.0, n_chars / 500.0) + 1e-9, 4) + 0.0 AS importance
         FROM documents
         WHERE list_has_any([lang, source], ['de', 'es', 'src1'])
         ORDER BY importance DESC, doc_id LIMIT 10),
       s AS (
         SELECT 'system_rule' AS section, doc_id, text AS content,
           array_to_string(list_sort([lang, source]), ',') AS tags,
           CAST(NULL AS DOUBLE) AS importance
         FROM documents
         WHERE list_has_any([lang, source], ['fr', 'src2'])
         ORDER BY doc_id LIMIT 5)
       SELECT * FROM (SELECT * FROM l UNION ALL SELECT * FROM s)
       ORDER BY section, doc_id"""

  /** Set intersect: ids present in both arms (`automem/api/entity.py:97-124`). */
  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  val setIntersectSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       ORDER BY o_custkey"""

  /** U5/F8 snippet: word-boundary truncation to 160 chars with trailing
    * partial word removed (`automem/utils/graph.py:30-35`,
    * `entity_extraction.py:127-148`).
    */
  def snippets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(length(col("text")) <= 160, col("text"))
          .otherwise(regexp_replace(substring(col("text"), 1, 160), "\\s+\\S*\\z", ""))
          .as("snippet"))
      .orderBy("doc_id")

  val snippetsSql: String =
    raw"""SELECT doc_id, CASE WHEN length(text) <= 160 THEN text
       ELSE regexp_replace(substr(text, 1, 160), '\s+\S*$$', '') END AS snippet
       FROM documents ORDER BY doc_id"""
}
