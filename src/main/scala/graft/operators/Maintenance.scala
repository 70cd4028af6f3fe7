package graft.operators

import graft.Tables
import graft.functions.VectorFunctions.cosineSim
import graft.functions.round4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Consolidation dataflows C1-C4 from SURVEY.md §2.11
  * (`/root/reference/consolidation.py`), re-expressed as batch plans over the
  * driver test tables. The decay/forget formulas keep the reference's shape
  * (exp-decay x importance x confidence factors, floored by importance;
  * when-chain fate assignment) with the test tables' columns standing in for
  * memory properties. All scores are rounded engine-stably before any
  * threshold comparison so fates are deterministic.
  */
object Maintenance {

  private val anchor = "'1999-01-01'"

  /** Shared relevance-decay expression (C1, `consolidation.py:227-282`):
    * relevance = max(imp * 0.3, min(1, exp(-0.01 * age_days) * (0.5 + imp))),
    * with imp = min(1, o_totalprice / 500000).
    */
  private def relevance: Column = {
    val imp = least(lit(1.0), col("o_totalprice") / 500000.0)
    val ageDays = datediff(lit("1999-01-01").cast("date"), to_date(col("o_orderdate")))
    round4(greatest(imp * 0.3,
      least(lit(1.0), exp(ageDays.cast("double") * -0.01) * (lit(0.5) + imp))))
  }

  private val relevanceSql: String =
    s"""round((greatest(least(1.0, o_totalprice / 500000.0) * 0.3,
       least(1.0, exp(CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE $anchor) AS DOUBLE) * -0.01)
         * (0.5 + least(1.0, o_totalprice / 500000.0))))) + 1e-9, 4) + 0.0"""

  /** C1 decay: per-row relevance score (`consolidation.py:1023-1115`). */
  def decayScores(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), relevance.as("relevance"))
      .orderBy("o_orderkey")

  val decayScoresSql: String =
    s"SELECT o_orderkey, $relevanceSql AS relevance FROM orders ORDER BY o_orderkey"

  /** C4 forgetting: protection rules then archive/delete fate when-chain
    * (`consolidation.py:619-818`; protections `:284-332`).
    */
  def forgetFates(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), relevance.as("relevance"),
        (col("o_totalprice") >= 400000 ||
          col("o_orderdate") >= lit("2001-01-01").cast("timestamp")).as("protected"))
      .withColumn("fate",
        when(col("protected"), "keep")
          .when(col("relevance") < 0.15, "delete")
          .when(col("relevance") < 0.3, "archive")
          .otherwise("keep"))
      .select(col("o_orderkey"), col("relevance"), col("fate"))
      .orderBy("o_orderkey")

  val forgetFatesSql: String =
    s"""SELECT o_orderkey, relevance,
       CASE WHEN protected THEN 'keep'
            WHEN relevance < 0.15 THEN 'delete'
            WHEN relevance < 0.3 THEN 'archive'
            ELSE 'keep' END AS fate
       FROM (SELECT o_orderkey, $relevanceSql AS relevance,
         (o_totalprice >= 400000 OR o_orderdate >= TIMESTAMP '2001-01-01') AS protected
         FROM orders) t ORDER BY o_orderkey"""

  /** C2 creative associations (`consolidation.py:334-455`): deterministic
    * FIXED-SIZE sample (the 30 vec_ids with the smallest multiplicative
    * hash — a Knuth LCG both Spark and DuckDB compute identically in BIGINT
    * arithmetic), all-pairs cosine within the tiny sample, rule table: same
    * label + low sim -> contradicts; cross-label high sim -> shares_theme;
    * near ids + low sim -> parallel_context. The reference samples a
    * CONSTANT 20-30 rows (`consolidation.py:348`); a proportional sample
    * (vec_id % k) would grow with the corpus and turn the self-cross-join
    * quadratic at scale. orderBy+limit plans as TakeOrderedAndProject, and
    * the 30-row side broadcasts into the pair join — scale-independent.
    */
  val CreativeSampleSize = 30

  def creativePairs(spark: SparkSession, dir: String): DataFrame = {
    val sample = Tables.embeddings(spark, dir)
      .orderBy(pmod(col("vec_id") * lit(1103515245L) + lit(12345L),
        lit(2147483648L)), col("vec_id"))
      .limit(CreativeSampleSize)
      .select(col("vec_id"), col("label"), col("embedding"))
    val a = sample.select(col("vec_id").as("a_id"), col("label").as("a_label"),
      col("embedding").as("a_emb"))
    val b = sample.select(col("vec_id").as("b_id"), col("label").as("b_label"),
      col("embedding").as("b_emb"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("sim", round4(cosineSim(col("a_emb"), col("b_emb"))))
      .withColumn("kind",
        when(col("a_label") === col("b_label") && col("sim") < 0.3, "contradicts")
          .when(col("a_label") =!= col("b_label") && col("sim") > 0.7, "shares_theme")
          .when(abs(col("a_id") - col("b_id")) < 50 && col("sim") < 0.4, "parallel_context"))
      .filter(col("kind").isNotNull)
      .select(col("a_id"), col("b_id"), col("sim"), col("kind"))
      .orderBy("a_id", "b_id")
  }

  val creativePairsSql: String =
    """WITH s AS (SELECT vec_id, label, embedding FROM embeddings
         ORDER BY (vec_id * 1103515245 + 12345) % 2147483648, vec_id LIMIT 30),
       pairs AS (SELECT a.vec_id AS a_id, a.label AS a_label, a.embedding AS ae,
           b.vec_id AS b_id, b.label AS b_label, b.embedding AS be
         FROM s a JOIN s b ON a.vec_id < b.vec_id),
       px AS (SELECT a_id, a_label, b_id, b_label,
           unnest(ae)::DOUBLE AS x, unnest(be)::DOUBLE AS y FROM pairs),
       sums AS (SELECT a_id, a_label, b_id, b_label,
           sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny
         FROM px GROUP BY 1, 2, 3, 4),
       scored AS (SELECT a_id, a_label, b_id, b_label,
           round((CASE WHEN nx = 0 OR ny = 0 THEN 0
             ELSE dot / (sqrt(nx) * sqrt(ny)) END) + 1e-9, 4) + 0.0 AS sim FROM sums),
       kinds AS (SELECT a_id, b_id, sim,
           CASE WHEN a_label = b_label AND sim < 0.3 THEN 'contradicts'
                WHEN a_label <> b_label AND sim > 0.7 THEN 'shares_theme'
                WHEN abs(a_id - b_id) < 50 AND sim < 0.4 THEN 'parallel_context'
                END AS kind FROM scored)
       SELECT a_id, b_id, sim, kind FROM kinds WHERE kind IS NOT NULL
       ORDER BY a_id, b_id"""

  /** C3 clustering end-to-end (`consolidation.py:457-617`): exact similarity
    * graph at the threshold -> iterative min-label connected components ->
    * per-cluster rollup (size, dominant type, time span, exemplar) for
    * clusters >= minSize, with the >= metaSize MetaMemory-spawn flag. The
    * embeddings table stands in for memories (label -> type, vec_id-derived
    * date -> timestamp); sims are rounded engine-stably BEFORE the threshold
    * compare so the edge set — and therefore the component structure — is
    * identical in DuckDB, whose recursive-CTE transitive closure is the
    * oracle for the iterative join loop. Exact pair generation here is the
    * reference-parity path over a BOUNDED working set (vec_id < 500 stands
    * in for the relevance > 0.3 decay filter — the reference likewise
    * clusters only its decayed-relevance subset in memory,
    * `consolidation.py:494-524`), so the O(n^2) pass is constant in corpus
    * size; the band-OR blocked variant that scales to the full corpus is
    * spec-gated (DomainSpec clustering + blocked-recall >= 95%).
    */

  /** Shared C3 working set: the bounded reference-parity slice of the
    * embeddings table projected into the memories shape cluster() expects.
    */
  private def clusterWorkingSet(spark: SparkSession, dir: String) =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 500)
      .select(
        col("vec_id").as("id"),
        col("embedding"),
        concat(lit("L"), col("label")).as("type"),
        date_add(lit("1995-01-01").cast("date"), col("vec_id").cast("int"))
          .as("timestamp"),
        lit(1.0).as("relevance_score"))

  /** Shared C3 rollup projection (ONE definition for both the exact and
    * banded variants — with the metaSize bound threaded, not re-hardcoded).
    */
  private def clusterRollup(clusters: DataFrame, metaSize: Int): DataFrame =
    clusters.select(col("component"), col("cluster_size"), col("dominant_type"),
        col("span_start").cast("string").as("span_start"),
        col("span_end").cast("string").as("span_end"),
        col("exemplar_id"),
        (col("cluster_size") >= metaSize).as("spawns_meta"))
      .orderBy("component")

  /** Shared C3 oracle tail: transitive closure + rollup over an `edges`
    * CTE the caller provides (exact pair set or banded candidates).
    */
  private def clusterOracleTail(minSize: Int, metaSize: Int): String =
    s"""edges AS (SELECT a_id AS src, b_id AS dst FROM sims
         UNION ALL SELECT b_id, a_id FROM sims),
       reach AS (
         WITH RECURSIVE r(a, b) AS (
           SELECT DISTINCT src, src FROM edges
           UNION
           SELECT r.a, e.dst FROM r JOIN edges e ON e.src = r.b)
         SELECT a AS id, min(b) AS component FROM r GROUP BY a),
       members AS (SELECT e.vec_id AS id, r.component,
           'L' || e.label AS type,
           DATE '1995-01-01' + CAST(e.vec_id AS INT) AS ts
         FROM emb e JOIN reach r ON r.id = e.vec_id),
       tc AS (SELECT component, type, count(*) AS n_type
         FROM members GROUP BY 1, 2),
       dom AS (SELECT component, type AS dominant_type FROM (
           SELECT component, type, row_number() OVER (PARTITION BY component
             ORDER BY n_type DESC, type ASC) AS rn FROM tc) d WHERE rn = 1),
       cl AS (SELECT component, count(*) AS cluster_size,
           CAST(min(ts) AS VARCHAR) AS span_start,
           CAST(max(ts) AS VARCHAR) AS span_end, min(id) AS exemplar_id
         FROM members GROUP BY 1 HAVING count(*) >= $minSize)
       SELECT cl.component, cl.cluster_size, dom.dominant_type,
         cl.span_start, cl.span_end, cl.exemplar_id,
         cl.cluster_size >= $metaSize AS spawns_meta
       FROM cl JOIN dom USING (component) ORDER BY cl.component"""

  def clusterSummary(spark: SparkSession, dir: String): DataFrame = {
    val (clusters, _) = graft.domain.Consolidation.cluster(
      clusterWorkingSet(spark, dir),
      threshold = 0.4, minSize = 3, metaSize = 5, exact = true,
      roundSims = true)
    clusterRollup(clusters, metaSize = 5)
  }

  val clusterSummarySql: String =
    s"""WITH emb AS (SELECT * FROM embeddings WHERE vec_id < 500),
       px AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
         FROM emb a JOIN emb b ON a.vec_id < b.vec_id),
       s AS (SELECT a_id, b_id, sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny
         FROM px GROUP BY 1, 2),
       sims AS (SELECT a_id, b_id FROM (
           SELECT a_id, b_id, round((CASE WHEN nx = 0 OR ny = 0 THEN 0
             ELSE dot / (sqrt(nx) * sqrt(ny)) END) + 1e-9, 4) + 0.0 AS sim FROM s) t
         WHERE sim >= 0.4),
       ${clusterOracleTail(minSize = 3, metaSize = 5)}"""

  /** C3 clustering via the 100 TB path: the BAND-OR blocked similarity graph
    * (`Consolidation.similarityEdges(exact = false)` — four offset 10-bit
    * sign bucketings, candidates only where some band agrees, deduped, then
    * the threshold) feeding the same pointer-jumping connected components and
    * rollup as [[clusterSummary]]. The DuckDB oracle mirrors the band
    * bucketing — NOT the exact pair set — so the blocked candidate
    * generation, max-over-bands dedup, threshold, and transitive closure are
    * all exercised end-to-end on real rows (threshold 0.25 yields 46 banded
    * edges / 6 clusters on the driver's isotropic embeddings; the exact-path
    * parity threshold 0.4 yields no banded cluster at all).
    */
  def clusterSummaryBanded(spark: SparkSession, dir: String): DataFrame = {
    val (clusters, _) = graft.domain.Consolidation.cluster(
      clusterWorkingSet(spark, dir),
      threshold = 0.25, minSize = 3, metaSize = 5, exact = false,
      roundSims = true)
    clusterRollup(clusters, metaSize = 5)
  }

  val clusterSummaryBandedSql: String = {
    def bucketExpr(off: Int): String =
      (0 until 10).map(i =>
        s"(CASE WHEN embedding[${off + i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
    val bands = Seq(0, 10, 20, 30).map(off =>
      s"SELECT vec_id, embedding, '$off:' || (${bucketExpr(off)}) AS b FROM emb")
      .mkString("\n         UNION ALL\n         ")
    s"""WITH emb AS (SELECT * FROM embeddings WHERE vec_id < 500),
       keyed AS ($bands),
       cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
           a.embedding AS ae, b.embedding AS be
         FROM keyed a JOIN keyed b ON a.b = b.b AND a.vec_id < b.vec_id),
       px AS (SELECT a_id, b_id, unnest(ae)::DOUBLE AS x, unnest(be)::DOUBLE AS y
         FROM cand),
       s AS (SELECT a_id, b_id, sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny
         FROM px GROUP BY 1, 2),
       sims AS (SELECT a_id, b_id FROM (
           SELECT a_id, b_id, round((CASE WHEN nx = 0 OR ny = 0 THEN 0
             ELSE dot / (sqrt(nx) * sqrt(ny)) END) + 1e-9, 4) + 0.0 AS sim FROM s) t
         WHERE sim >= 0.25),
       ${clusterOracleTail(minSize = 3, metaSize = 5)}"""
  }
}
