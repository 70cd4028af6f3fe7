package graft.operators

import graft.functions.VectorFunctions._
import graft.functions.round4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** PERSISTED IVF index: the missing piece of the ANN story — centroids and
  * cell assignments are materialized ONCE at index-build time, so a query
  * job reads a 2^cellBits-row centroid table plus only the probed cells'
  * parquet partitions, instead of recomputing centroids with a full
  * embedding scan per job (the round-2 ivfTopK shape).
  *
  * Layout (Layout.scala conventions): `<path>/centroids` is a tiny parquet
  * relation (cell, centroid); `<path>/assignments` is the vector relation
  * written `partitionBy("cell")` — probing n of 2^cellBits cells becomes
  * STATIC PARTITION PRUNING (`PartitionFilters: cell IN (...)`), so the
  * candidate scan's I/O shrinks by probed/total at any corpus size. The
  * quantizer is the deterministic sign-bucket hyperplane split shared with
  * the ephemeral path (`Similarity.ivfTopK`), so index answers are
  * bit-identical to it at equal nprobe.
  *
  * Reference semantics anchor: Qdrant-side ANN over the memory collection
  * (`/root/reference/automem/search/runtime_recall_helpers.py:940-1030`);
  * Qdrant owns its persisted index — this is the Spark-native equivalent.
  */
object IvfIndex {

  val DefaultCellBits = 6

  /** Per-cell mean centroids of an assignments relation (cell, embedding). */
  private[operators] def cellCentroids(cells: DataFrame): DataFrame =
    cells
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("cx"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pairs"))
      .select(col("cell"),
        transform(col("pairs"), p => p.getField("cx").cast("float")).as("centroid"))

  /** Build the index: one pass assigns cells and writes assignments
    * cell-partitioned; the centroid aggregate is tiny (<= 2^cellBits rows).
    */
  def build(vectors: DataFrame, path: String,
      cellBits: Int = DefaultCellBits): Unit = {
    val cells = vectors.withColumn("cell", signBucket(col("embedding"), cellBits))
    // cluster rows by cell before the partitioned write: each task then owns
    // whole cells and writes one file per cell instead of every task
    // spraying a sliver into all 2^cellBits directories (tasks x cells tiny
    // files — the classic partitioned-write mistake at any scale)
    cells.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assignments")
    cellCentroids(cells).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** True when `path` already holds a completed index (both relations have
    * their _SUCCESS markers).
    */
  def exists(path: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path, "assignments", "_SUCCESS")) &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(path, "centroids", "_SUCCESS"))

  /** The cells a query would probe: score the persisted centroids (tiny
    * scan), keep the top `nprobe`. Collected to literals — this is a
    * parameter lookup (<= 2^cellBits rows), not a data-path collect — so
    * the candidate filter prunes parquet partitions statically.
    */
  def probeCells(spark: SparkSession, path: String, qvec: Array[Float],
      nprobe: Int): Seq[Long] =
    spark.read.parquet(s"$path/centroids")
      .withColumn("csim", cosineSim(col("centroid"), typedlit(qvec)))
      .orderBy(desc("csim"), asc("cell"))
      .limit(nprobe)
      .select(col("cell"))
      .collect().map(_.getLong(0)).toSeq

  /** Query the persisted index: centroid lookup + partition-pruned exact
    * search over probed cells only. Same TakeOrderedAndProject tail as
    * brute force; `round4` before ranking keeps ordering engine-stable.
    */
  def topK(spark: SparkSession, path: String, qvec: Array[Float], k: Int,
      nprobe: Int): DataFrame = {
    val cells = probeCells(spark, path, qvec, nprobe)
    val assignments = spark.read.parquet(s"$path/assignments")
      .filter(col("cell").isin(cells: _*))
    val passThrough = assignments.columns
      .filter(c => c != "embedding" && c != "cell").toSeq.map(col)
    assignments
      .withColumn("sim", round4(cosineSim(col("embedding"), typedlit(qvec))))
      .select(passThrough :+ col("sim"): _*)
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }
}
