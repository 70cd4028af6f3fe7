package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for hot join keys (ARCHITECTURE.md): the fact side gets a
  * deterministic salt (hash of the whole row mod k) appended to the join
  * key; the dimension side replicates k ways. The shuffle then spreads one
  * hot key over k partitions. AQE's skew-join split handles moderate skew
  * automatically; explicit salting is the deterministic fallback for extreme
  * single-key skew (e.g. one entity tag on 10% of all memories).
  */
object Skew {

  /** Inner-join `fact` with `dim` on fact(factKey) == dim(dimKey), salted
    * k ways. `saltSource` columns make the fact salt deterministic (default:
    * all fact columns).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, k: Int, saltSource: Seq[String] = Nil): DataFrame = {
    val srcCols: Seq[Column] =
      (if (saltSource.nonEmpty) saltSource else fact.columns.toSeq).map(col)
    val saltedFact = fact.withColumn("_salt", pmod(hash(srcCols: _*), lit(k)))
    val saltedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(k - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }

  /** Oracle query: salted brand revenue — the SAME aggregate as a plain
    * lineitem x part join, executed through the salted join (salt 8 ways
    * on the part key). The DuckDB oracle is the UNSALTED join: salting is
    * a physical rewrite and must be result-invisible, so the oracle gate
    * IS the invariance proof at corpus scale (the spec proves it on a
    * planted-hot-key frame).
    */
  def saltedBrandRevenue(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val part = graft.Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"))
    saltedJoin(li, part, "l_partkey", "p_partkey", k = 8)
      .groupBy(col("p_brand"))
      .agg(sum(col("cents")).as("revenue_cents"), count(lit(1)).as("n"))
      .orderBy("p_brand")
  }

  val saltedBrandRevenueSql: String =
    """SELECT p_brand,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       count(*) AS n
       FROM lineitem JOIN part ON p_partkey = l_partkey
       GROUP BY 1 ORDER BY 1"""

  /** Two-phase skew-safe distinct-ish aggregation: count per (key, salt)
    * partials, then combine — bounds any single reducer's input to
    * n(key)/k rows.
    */
  def saltedCount(df: DataFrame, key: String, k: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(col(key), monotonically_increasing_id()), lit(k)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("partial"))
      .groupBy(col(key)).agg(sum(col("partial")).as("n"))
}
