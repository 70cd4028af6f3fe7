package graft.domain

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cluster storage layout (ARCHITECTURE.md "Data model at scale"), as tested
  * code rather than prose: memories are date-partitioned on the event day so
  * F1 time-window filters become partition pruning; edges are bucketed by
  * `src` so 1-hop joins (J1/J2/J4) co-locate and repeated traversals skip
  * the shuffle.
  */
object Layout {

  /** The date partition column [[writeMemories]] derives; Recall.baseFilter
    * restates time windows as bounds on this column so partition pruning
    * engages (a plain `timestamp` filter cannot prune).
    */
  val DayColumn = "day"

  /** Write memories date-partitioned by event day. */
  def writeMemories(memories: DataFrame, path: String): Unit =
    memories
      .withColumn(DayColumn, date_format(col("timestamp"), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .partitionBy(DayColumn)
      .parquet(path)

  /** Read back; time filters on `timestamp`/`day` prune partitions. */
  def readMemories(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Register edges as a bucketed table (bucket count chosen per cluster;
    * bucketBy requires the table catalog). Joins keyed on `src` between
    * co-bucketed relations then skip the exchange.
    */
  def writeEdgesBucketed(edges: DataFrame, table: String,
      buckets: Int = 8): Unit =
    edges.write.mode("overwrite")
      .bucketBy(buckets, "src")
      .sortBy("src")
      .format("parquet")
      .saveAsTable(table)

  /** Strength coalesce shared by the traversal operators
    * (`runtime_relations.py:50-60`).
    */
  private def strengthCol =
    coalesce(col("strength"), col("score"), col("confidence"),
      col("similarity"), col("count").cast("double"), lit(0.0))

  /** Materialize the UNDIRECTED edge view, bucketed by `src`: graph
    * expansion (J2) and variable-depth traversal (J6) probe edges in both
    * directions, which otherwise unions a reversed copy of the edge scan on
    * every query — twice the read. Written once at layout time, every
    * undirected traversal does ONE bucketed scan and seed joins co-locate.
    */
  def writeUndirectedEdges(edges: DataFrame, table: String,
      buckets: Int = 8): Unit = {
    val forward = edges.select(col("src"), col("dst"), col("rel_type"),
      strengthCol.as("strength"))
    val reversed = edges.select(col("dst").as("src"), col("src").as("dst"),
      col("rel_type"), strengthCol.as("strength"))
    forward.unionByName(reversed)
      .write.mode("overwrite")
      .bucketBy(buckets, "src")
      .sortBy("src")
      .format("parquet")
      .saveAsTable(table)
  }
}
