package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Document deduplication family for training-data pipelines: exact,
  * fingerprint keep-best (reference R1 dedup, `automem/api/recall.py:310-389`),
  * MinHash, and word-n-gram Jaccard. All scale paths avoid O(n^2): exact and
  * fingerprint are hash groupBys; MinHash groups by signature; Jaccard blocks
  * candidate pairs by (lang, source) before the pair join, so the shuffle key
  * bounds the quadratic term to within-block sizes.
  */
object Dedup {

  /** Exact duplicate groups by md5 of the raw text. */
  def exactDupGroups(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_dup"), min(col("doc_id")).as("keep_id"))
      .orderBy("text_hash")

  /** R1-style fingerprint dedup keep-best: normalize -> first 64 chars, keep
    * the longest doc (tie: smallest id). Emits one row per surviving doc.
    */
  def fingerprintDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("fp"))
      .orderBy(desc("n_chars"), asc("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("fp", fingerprint(col("text"), 64))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("fp"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** MinHash bucket dedup: docs sharing a full k-component signature are
    * near-dup candidates. Signature is a groupBy key — linear, no pair join.
    */
  def minhashGroups(spark: SparkSession, dir: String, k: Int = 4): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("sig", minhashSignature(col("text"), k))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_docs") > 1)
      .orderBy("sig")

  /** Word-3-gram Jaccard near-dup pairs within (lang, source) blocks.
    * Jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|) over distinct shingles;
    * pairs with jaccard >= threshold, a < b.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        wordShingles(col("text"), 3).as("shingles"))
      .withColumn("n_sh", size(col("shingles")))
      .filter(col("n_sh") > 0)
    val exploded = docs.select(col("doc_id"), col("lang"), col("source"),
      col("n_sh"), explode(col("shingles")).as("sh"))
    val a = exploded.select(col("lang"), col("source"), col("sh"),
      col("doc_id").as("a_id"), col("n_sh").as("a_n"))
    val b = exploded.select(col("lang"), col("source"), col("sh"),
      col("doc_id").as("b_id"), col("n_sh").as("b_n"))
    a.join(b, Seq("lang", "source", "sh"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"), first(col("a_n")).as("a_n"),
        first(col("b_n")).as("b_n"))
      .withColumn("jaccard",
        graft.functions.round4(col("inter").cast("double") /
          (col("a_n") + col("b_n") - col("inter"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy("a_id", "b_id")
  }
}
