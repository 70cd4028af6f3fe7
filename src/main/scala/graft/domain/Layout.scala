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

  /** Month-granularity partition column ([[writeMemories]] with
    * `granularity = "month"`). A partition should comfortably exceed one
    * parquet row group; when a corpus averages few rows per day, daily
    * partitions degenerate into many tiny files whose open/footer cost
    * exceeds what pruning saves — month granularity keeps the pruning
    * mechanism with ~30x fewer files.
    */
  val MonthColumn = "month"

  /** Rows-per-day threshold below which [[writeMemoriesAuto]] picks month
    * granularity: a ~1 KB row corpus needs ~100k rows/day before a day
    * partition fills a 128 MB parquet row group.
    */
  val AutoGranularityRowsPerDay = 100000L

  /** Write memories date-partitioned by event day ("day", the 100 TB
    * default) or month ("month", for sparse corpora).
    */
  def writeMemories(memories: DataFrame, path: String,
      granularity: String = "day"): Unit = {
    val (column, fmt) = granularity match {
      case "day" => (DayColumn, "yyyy-MM-dd")
      case "month" => (MonthColumn, "yyyy-MM")
      case g => throw new IllegalArgumentException(
        s"unsupported layout granularity '$g' (day|month)")
    }
    memories
      .withColumn(column, date_format(col("timestamp"), fmt))
      .write.mode("overwrite")
      .partitionBy(column)
      .parquet(path)
  }

  /** [[writeMemories]] with granularity chosen from the data: day when the
    * corpus averages >= [[AutoGranularityRowsPerDay]] rows per day of span,
    * month otherwise. Returns the chosen granularity.
    */
  def writeMemoriesAuto(memories: DataFrame, path: String): String = {
    val stats = memories.agg(
      count(lit(1)).as("n"),
      min(col("timestamp")).as("lo"),
      max(col("timestamp")).as("hi")).head()
    val n = stats.getLong(0)
    val spanDays = (Option(stats.getTimestamp(2)), Option(stats.getTimestamp(1))) match {
      case (Some(hi), Some(lo)) =>
        math.max(1L, (hi.getTime - lo.getTime) / 86400000L + 1)
      case _ => 1L
    }
    val granularity =
      if (n / spanDays >= AutoGranularityRowsPerDay) "day" else "month"
    writeMemories(memories, path, granularity)
    granularity
  }

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
