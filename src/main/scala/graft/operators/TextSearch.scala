package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import graft.functions.round4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ranked full-text retrieval over a document corpus — the classic search
  * shape a training-data pipeline needs next to substring recall (corpus
  * triage, "find the docs about X" over billions of rows). The reference's
  * keyword channel is substring/containment scoring against a bounded
  * memory store (`runtime_recall_helpers.py:630-717`); BM25 is the
  * engine-extension twin for open-corpus scale, built postings-first so
  * nothing ever materializes a corpus x query product.
  */
object TextSearch {

  /** Okapi BM25 top-k (k1 = 1.2, b = 0.75 — the standard Robertson/Walker
    * parameterization; idf = ln(1 + (N - df + 0.5)/(df + 0.5)), the
    * Lucene-style always-positive form).
    *
    * Plan shape, scan-to-cut:
    *   - per-doc length from one projection (no explode);
    *   - corpus stats (N, avgdl) as a 1-row aggregate, broadcast;
    *   - postings EXPLODE is filtered to the query's terms BEFORE any
    *     aggregation — the shuffled relation is O(docs containing a query
    *     term), not O(total tokens);
    *   - document frequencies aggregate off that same filtered tf relation
    *     (tiny: one row per query term) and broadcast back;
    *   - the dl join is left to the optimizer/AQE: the tf side is usually
    *     small enough to broadcast, but on a 100 TB corpus a common term
    *     can match most documents, so the plan must survive as a shuffle
    *     join — no forced hint;
    *   - final cut is orderBy + limit (TakeOrderedAndProject: per-partition
    *     top-k, driver merge, no full sort).
    *
    * Scores are quantized (round4) before ranking with an asc-id tie-break
    * so rank order is engine-stable (the DuckDB oracle reproduces it
    * exactly — determinism contract, ARCHITECTURE.md).
    */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = queryTerms.map(_.toLowerCase).distinct
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(qt: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf is already one row per (doc, term), so df is a plain count
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round4(sum(col("contrib"))).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Oracle-gated BM25 query over the documents table: a fixed three-term
    * query drawn from the synthetic vocabulary, top-20.
    */
  def bm25Query(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.documents(spark, dir), "text", "doc_id",
      Seq("spark", "join", "fast"), k = 20)

  /** DuckDB mirror of [[bm25Query]] — same tokenizer
    * (whitespace split of lower(trim(text))), same stats, same formula,
    * same round4(+1e-9) quantization before ranking.
    */
  val bm25Sql: String =
    raw"""WITH toks AS (
         SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
         FROM documents),
       dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
       stats AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl),
       tf AS (
         SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
         WHERE term IN ('spark', 'join', 'fast')
         GROUP BY 1, 2),
       dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       scored AS (
         SELECT tf.doc_id,
           sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
               (tf.tf * 2.2) /
               (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS s
         FROM tf
         JOIN dfreq ON dfreq.term = tf.term
         JOIN dl ON dl.doc_id = tf.doc_id
         CROSS JOIN stats
         GROUP BY 1)
       SELECT doc_id, round(s + 1e-9, 4) + 0.0 AS score FROM scored
       ORDER BY score DESC, doc_id ASC LIMIT 20"""
}
