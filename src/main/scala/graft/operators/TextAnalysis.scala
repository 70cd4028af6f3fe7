package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.round4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID, keyword search (graph keyword channel Q3,
  * `automem/search/runtime_recall_helpers.py:595-724`). Pure narrow
  * projections — whole-stage codegen, no shuffle except the final sort.
  * Each operator carries its mirrored DuckDB oracle SQL.
  */
object TextAnalysis {

  private val toks = raw"regexp_split_to_array(lower(trim(text)), '\s+')"

  /** Per-doc token counts, punctuation/stopword stats, quality score. */
  def docStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tok"),
        bpeTokenCount(col("text")).as("n_bpe"),
        punctCount(col("text")).as("n_punct"),
        stopwordCount(col("text")).as("n_stop"),
        qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val docStatsSql: String =
    s"""SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(len($toks) AS INT) END AS n_tok,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe,
       CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INT) AS n_punct,
       CAST(len(list_filter($toks,
         t -> list_contains(['the','a','of','and','to','in','is'], t))) AS INT) AS n_stop,
       round(
         least(1.0, (CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len($toks) END) / 200.0) * 0.4 +
         least(1.0, (CASE WHEN length(trim(text)) = 0 THEN 0.0
             ELSE len(list_filter($toks,
               t -> list_contains(['the','a','of','and','to','in','is'], t))) * 1.0
               / len($toks) END) * 5.0) * 0.3 +
         (1.0 - least(1.0, (CASE WHEN length(text) = 0 THEN 0.0
             ELSE len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
               / length(text) END) * 10.0)) * 0.3
         + 1e-9, 4) AS quality
       FROM documents ORDER BY doc_id"""

  /** Language-ID heuristic vs the labeled lang column. */
  def langPrediction(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), langId(col("text")).as("predicted"))
      .orderBy("doc_id")

  val langPredictionSql: String =
    s"""WITH h AS (SELECT doc_id, lang,
         CAST(len(list_intersect(list_distinct($toks), ['the','and','of','is'])) AS INT) AS h_en,
         CAST(len(list_intersect(list_distinct($toks), ['el','la','de','que'])) AS INT) AS h_es,
         CAST(len(list_intersect(list_distinct($toks), ['der','die','und','das'])) AS INT) AS h_de,
         CAST(len(list_intersect(list_distinct($toks), ['le','les','et','une'])) AS INT) AS h_fr
       FROM documents)
       SELECT doc_id, lang,
         CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'unknown'
              WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
              WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
              WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
              ELSE 'fr' END AS predicted
       FROM h ORDER BY doc_id"""

  private val Keywords = Seq("spark", "join", "window")
  private val Phrase = "hash join"

  /** Q3 keyword channel: raw contains-score, normalized by the max raw score
    * over the candidate set (window over the filtered set), top-100.
    */
  def keywordSearch(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.documents(spark, dir)
      .select(col("doc_id"),
        keywordRawScore(col("text"), Keywords, Phrase).as("raw"))
      .filter(col("raw") > 0)
    raw.withColumn("kw_score",
        round4(col("raw") / max(col("raw")).over(Window.partitionBy())))
      .select(col("doc_id"), col("kw_score"))
      .orderBy(desc("kw_score"), asc("doc_id"))
      .limit(100)
  }

  val keywordSearchSql: String =
    """WITH s AS (SELECT doc_id,
         (CASE WHEN contains(lower(text), 'spark') THEN 2 ELSE 0 END +
          CASE WHEN contains(lower(text), 'join') THEN 2 ELSE 0 END +
          CASE WHEN contains(lower(text), 'window') THEN 2 ELSE 0 END +
          CASE WHEN contains(lower(text), 'hash join') THEN 2 ELSE 0 END) AS raw
       FROM documents),
       f AS (SELECT * FROM s WHERE raw > 0)
       SELECT doc_id, round((raw / max(raw) OVER ()) + 1e-9, 4) AS kw_score
       FROM f ORDER BY kw_score DESC, doc_id ASC LIMIT 100"""
}
