package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measured quantizer-staleness evidence for the streaming IVF ingest
  * (VERDICT r12 item 7): the frozen-quantizer contract is correct (FAISS's
  * — moving centroids would orphan existing assignments), but a quantizer
  * trained on batch 0 routes DRIFTED later batches through centroids that
  * no longer describe them, so reduced-nprobe recall on drifted content
  * degrades relative to a fresh rebuild. This probe quantifies that and
  * the cheap ground-truth-free signal that predicts it:
  *
  *  1. build a k-means IVF index on clustered set A (8 tight clusters);
  *  2. append a DRIFTED set B (8 clusters around different bases) over 5
  *     frozen-quantizer batches;
  *  3. measure recall@10 at nprobe 4/16 for queries from B's distribution
  *     against (a) the frozen-quantizer index and (b) a fresh rebuild on
  *     A∪B — full-probe results are exact on both, so the reduced-probe
  *     overlap isolates ROUTING quality;
  *  4. report the assignment-fit ratio `avg dist(B -> frozen centroids) /
  *     avg dist(A -> frozen centroids)` — computable per appended batch
  *     with no ground truth, the rebuild-trigger signal.
  *
  * Run: `sbt "runMain graft.tools.IvfDriftProbe"`
  */
object IvfDriftProbe {

  private def mix(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    abs(xxhash64(c))

  /** n deterministic vectors in `clusters` tight clusters whose base
    * directions are keyed by `seed` — different seeds give disjoint
    * cluster structure (drift).
    */
  def clusteredVecs(spark: SparkSession, n: Long, idOffset: Long, seed: Int,
      dim: Int = 64, clusters: Int = 8, spread: Float = 10f): DataFrame =
    spark.range(n).select(
      (col("id") + idOffset).as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val base = (mix(col("id") % clusters * 131 + i * 17 + seed * 7919)
          % 2000 - 1000).cast("float") / 1000f
        val noise = (mix(col("id") * 257 + i + seed) % 2000 - 1000)
          .cast("float") / 1000f
        (base + noise / lit(spread)).cast("float")
      }).as("embedding"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{IvfIndex, KMeans}

    val nA = 20000L; val nB = 20000L; val k = 16

    // two drift regimes: TIGHT (8 new tight clusters — far from the frozen
    // centroids but internally coherent, so routing stays consistent) and
    // STRADDLE (32 looser clusters — drifted neighborhoods straddle frozen
    // cell boundaries, the regime where stale routing actually loses
    // neighbors)
    for ((label, bClusters, bSpread) <- Seq(
        ("drift_tight   ", 8, 10f), ("drift_straddle", 32, 3f))) {
      val setA = clusteredVecs(spark, nA, 0L, seed = 1).localCheckpoint()
      val frozen = java.nio.file.Files
        .createTempDirectory("ivf-frozen").toString
      IvfIndex.buildKMeans(setA, frozen, k = k, iters = 5)
      val batches = (0 until 5).map(b =>
        clusteredVecs(spark, nB / 5, 100000L + b * (nB / 5), seed = 2,
          clusters = bClusters, spread = bSpread).localCheckpoint())
      batches.zipWithIndex.foreach { case (b, i) =>
        graft.streaming.StreamingIngest.ivfBatch(
          b, (i + 1).toLong, frozen, kMeansK = Some(k))
      }
      val setB = batches.reduce(_ unionByName _)
      val rebuilt = java.nio.file.Files
        .createTempDirectory("ivf-rebuilt").toString
      IvfIndex.buildKMeans(setA.unionByName(setB), rebuilt, k = k, iters = 5)

      // queries FROM B's distribution (new content is what users search
      // for after drift) — fresh ids, same cluster bases
      val qvecs = clusteredVecs(spark, 16, 900000L, seed = 2,
          clusters = bClusters, spread = bSpread)
        .select("embedding").collect()
        .map(_.getSeq[Float](0).toArray)

      def recallAtReduced(path: String): Double = {
        val rs = qvecs.map { q =>
          val exact = IvfIndex.topK(spark, path, q, k = 10, nprobe = k)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          val red = IvfIndex.topK(spark, path, q, k = 10, nprobe = 4)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          (exact & red).size.toDouble / exact.size
        }
        rs.sum / rs.size
      }
      val recFrozen = recallAtReduced(frozen)
      val recRebuilt = recallAtReduced(rebuilt)

      // ground-truth-free staleness signal: how well do the FROZEN
      // centroids fit each set (mean assigned squared distance)
      val cents = spark.read.parquet(s"$frozen/centroids")
        .orderBy("cell").select(col("centroid").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      def fit(df: DataFrame): Double =
        KMeans.assign(df, cents).agg(avg(col("dist"))).head.getDouble(0)
      val fitA = fit(setA); val fitB = fit(setB)

      println(f"[ivfdrift] $label recall@10(nprobe 4/$k) " +
        f"frozen=$recFrozen%.3f rebuilt=$recRebuilt%.3f " +
        f"delta=${recRebuilt - recFrozen}%.3f " +
        f"fitA=$fitA%.3f fitB=$fitB%.3f fit_ratio=${fitB / fitA}%.2f " +
        f"(appended ${nB * 100 / (nA + nB)}%% of corpus)")
    }
    spark.stop()
  }
}
