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
         * (0.5 + least(1.0, o_totalprice / 500000.0))))) + 1e-9, 4)"""

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
             ELSE dot / (sqrt(nx) * sqrt(ny)) END) + 1e-9, 4) AS sim FROM sums),
       kinds AS (SELECT a_id, b_id, sim,
           CASE WHEN a_label = b_label AND sim < 0.3 THEN 'contradicts'
                WHEN a_label <> b_label AND sim > 0.7 THEN 'shares_theme'
                WHEN abs(a_id - b_id) < 50 AND sim < 0.4 THEN 'parallel_context'
                END AS kind FROM scored)
       SELECT a_id, b_id, sim, kind FROM kinds WHERE kind IS NOT NULL
       ORDER BY a_id, b_id"""
}
