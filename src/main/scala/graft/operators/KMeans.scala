package graft.operators

import graft.Tables
import graft.functions.round4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Fixed-iteration Lloyd's k-means over an embedding column — the
  * clustering primitive of a training-data pipeline (SemDeDup's cluster
  * stage, stratified curation, IVF coarse quantizers all start here;
  * reference anchor: the consolidation clustering family,
  * `/root/reference/consolidation.py` C3, which this generalizes from
  * similarity-threshold grouping to centroid partitioning).
  *
  * Deterministic by construction, so a DuckDB oracle can mirror it:
  *  - init = the k lowest-`vec_id` vectors (no RNG);
  *  - FIXED iteration count (the convergence-test variant would be
  *    float-order-sensitive near the stop threshold);
  *  - distances and centroids are ROUNDED to 6 decimals before any
  *    comparison (argmin ties break toward the lower cluster index on both
  *    engines), the same boundary-escape doctrine as round4/DSIR —
  *    cross-engine ulp noise cannot flip an assignment;
  *  - empty clusters keep their previous centroid.
  *
  * Scale shape: the centroid set is k×dim doubles — a bounded driver
  * parameter (same class as the IVF centroid lookups), broadcast into a
  * single whole-stage-codegen projection per iteration: distances via
  * `transform`+`aggregate` over a LITERAL centroid array, argmin via
  * `array_position(dists, array_min(dists))`. NO join, NO shuffle for
  * assignment; the only shuffle per iteration is the (cluster, pos)
  * mean aggregate — combiner-friendly, ≤ k·dim rows out. At 100 TB this
  * is exactly mini-batch-free distributed Lloyd's: one scan + one tiny
  * aggregate per iteration, linear in the corpus.
  */
object KMeans {

  /** Round a centroid/distance to 6 decimals — the cross-engine stability
    * quantum (see class doc). Half-away-from-zero, matching BOTH Spark
    * SQL's round (HALF_UP) and DuckDB's round; `math.rint` would be
    * half-to-even and could disagree at an exact tie.
    */
  private def round6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6

  /** Assignment projection against a literal centroid set: adds `cluster`
    * (argmin of rounded squared-L2, ties to the lower index) and `dist`.
    */
  def assign(vectors: DataFrame, centroids: Seq[Seq[Double]]): DataFrame = {
    val cents = typedlit(centroids)
    // cast hoisted into a real column: a cast referenced inside the HOF
    // lambdas re-evaluates per centroid (k x per row) — see the same
    // finding in Pca.covariance
    val dists = transform(cents, c =>
      round(aggregate(zip_with(col("_e"), c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v), 6))
    vectors
      .withColumn("_e", col("embedding").cast("array<double>"))
      .withColumn("_dists", dists)
      .withColumn("dist", array_min(col("_dists")))
      .withColumn("cluster",
        (array_position(col("_dists"), col("dist")) - 1).cast("int"))
      .drop("_dists", "_e")
  }

  /** Lloyd's iterations; returns the final centroid set (k × dim, rounded
    * to 6 decimals). `iters` counts CENTROID UPDATES — each loop round is
    * assign-then-update, and the caller's final assignment runs against
    * the post-update centroids (the SQL mirror chains the same number of
    * update CTEs). `vectors` needs (vec_id, embedding).
    */
  def fitCentroids(vectors: DataFrame, k: Int, iters: Int): Seq[Seq[Double]] = {
    // deterministic init: the k lowest-id vectors (k·dim doubles — a
    // bounded driver read, not a corpus collect)
    var cents: Seq[Seq[Double]] = vectors.orderBy("vec_id").limit(k)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).map(round6).toSeq).toSeq
    for (_ <- 1 to iters) {
      val means = assign(vectors, cents)
        .select(col("cluster"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos")).agg(avg(col("x")).as("cx"))
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(rs =>
          rs.sortBy(_.getInt(1)).map(r => round6(r.getDouble(2))).toSeq)
        .toMap
      // empty clusters keep their previous centroid (mirrored in the SQL
      // via the LEFT-JOIN coalesce)
      cents = cents.indices.map(c => means.getOrElse(c, cents(c)))
    }
    cents
  }

  /** Fit + final assignment: (vec_id, cluster, dist) with `dist` rounded
    * for cross-engine hashing.
    */
  def fit(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    val cents = fitCentroids(vectors, k, iters)
    assign(vectors, cents)
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        round4(col("dist")).as("dist"))
      .orderBy("vec_id")
  }

  /** Oracle query: k=8, 2 Lloyd's iterations over the embeddings table. */
  def kmeansClusters(spark: SparkSession, dir: String, k: Int = 8,
      iters: Int = 2): DataFrame =
    fit(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
      k, iters)

  /** DuckDB mirror: long-form centroids (c, pos, v), the same rounded-
    * distance argmin with lower-index tie-break, the same rounded means
    * with empty-cluster carry-over, 2 chained iterations. The lockstep
    * multi-unnest (range + embedding in one SELECT) is the established
    * pairing idiom from the embedding near-dup oracle.
    */
  val kmeansClustersSql: String =
    raw"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       el AS (SELECT vec_id, unnest(range(len(embedding))) AS pos,
           unnest(embedding)::DOUBLE AS x
         FROM e),
       init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
           embedding FROM e ORDER BY vec_id LIMIT 8),
       c0 AS (SELECT c, unnest(range(len(embedding))) AS pos,
           round(unnest(embedding)::DOUBLE, 6) AS v
         FROM init),
       d0 AS (SELECT el.vec_id, c0.c,
           round(sum((el.x - c0.v) * (el.x - c0.v)), 6) AS dist
         FROM el JOIN c0 USING (pos) GROUP BY 1, 2),
       s0 AS (SELECT vec_id, c, dist FROM (
           SELECT vec_id, c, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
           FROM d0) t WHERE rn = 1),
       m1 AS (SELECT s0.c, el.pos, round(avg(el.x), 6) AS v
         FROM s0 JOIN el USING (vec_id) GROUP BY 1, 2),
       c1 AS (SELECT c0.c, c0.pos, coalesce(m1.v, c0.v) AS v
         FROM c0 LEFT JOIN m1 ON m1.c = c0.c AND m1.pos = c0.pos),
       d1 AS (SELECT el.vec_id, c1.c,
           round(sum((el.x - c1.v) * (el.x - c1.v)), 6) AS dist
         FROM el JOIN c1 USING (pos) GROUP BY 1, 2),
       s1 AS (SELECT vec_id, c, dist FROM (
           SELECT vec_id, c, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
           FROM d1) t WHERE rn = 1),
       m2 AS (SELECT s1.c, el.pos, round(avg(el.x), 6) AS v
         FROM s1 JOIN el USING (vec_id) GROUP BY 1, 2),
       c2 AS (SELECT c1.c, c1.pos, coalesce(m2.v, c1.v) AS v
         FROM c1 LEFT JOIN m2 ON m2.c = c1.c AND m2.pos = c1.pos),
       d2 AS (SELECT el.vec_id, c2.c,
           round(sum((el.x - c2.v) * (el.x - c2.v)), 6) AS dist
         FROM el JOIN c2 USING (pos) GROUP BY 1, 2),
       s2 AS (SELECT vec_id, c, dist FROM (
           SELECT vec_id, c, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
           FROM d2) t WHERE rn = 1)
       SELECT vec_id, CAST(c AS BIGINT) AS cluster,
         round(dist + 1e-9, 4) + 0.0 AS dist
       FROM s2 ORDER BY vec_id"""
}
