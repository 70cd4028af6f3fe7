package graft.operators

import graft.Tables
import graft.functions.round4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-graph analytics over the edge table — importance propagation for
  * the memory graph (the global complement of the reference's per-node
  * relationship counts, `consolidation.py:201-225`, and importance-ordered
  * snapshots, `automem/api/graph.py:51-208`: PageRank surfaces the memories
  * everything else points AT, not just the ones with many edges).
  *
  * Expressed as the classic iterative-DataFrame loop: each iteration is one
  * join (ranks onto out-edges) + one aggregation (inflow per destination) —
  * the Pregel pattern in pure Catalyst. A FIXED iteration count keeps the
  * whole computation a single deterministic plan the DuckDB oracle can
  * mirror with chained CTEs.
  */
object GraphAnalytics {

  /** PageRank with damping 0.85 over a directed edge list, `iters` fixed
    * iterations from a uniform rank of 1.0. Nodes without in-edges settle at
    * `1 - damping`; dangling mass is NOT redistributed (sinks absorb it) —
    * the common simplified form, deterministic and oracle-mirrorable.
    *
    * Scale shape: per iteration, one equi-join of the rank table onto the
    * edge list (both partitioned by src — at scale, bucket both tables on
    * the node key and the join is exchange-free) and one combiner-friendly
    * groupBy(dst) sum. State per iteration is one row per node — never
    * materialized on the driver. The loop-invariant edge+degree and node
    * frames CACHE (a fully composed 3-iteration plan re-derived them per
    * round: 15 parquet scans, 33 exchanges — measured), and each round's
    * rank frame LOCAL-CHECKPOINTS so lineage never compounds (the NOTES.md
    * cached self-join hazard: canonicalization does not reliably serve both
    * sides of an iterated join from cache). The final top-K is checkpointed
    * so every intermediate can be released before returning.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double,
      topK: Int, dedup: Boolean = true): DataFrame = {
    // callers that already deduplicated (ideally on narrower pre-formatted
    // keys — see supplierPartRank) skip the extra shuffle
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (dedup) e0.distinct() else e0
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src").cache()
    var ranks = nodes.withColumn("rank", lit(1.0))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val inflow = withDeg.join(ranks, withDeg("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("inflow"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"), (lit(1 - damping) +
          lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint()
      prev.foreach(graft.functions.releaseCheckpoint)
      prev = Some(ranks)
    }
    val result = ranks
      .select(col("node"), round4(col("rank")).as("rank"))
      .orderBy(desc("rank"), asc("node")).limit(topK)
      .localCheckpoint()
    prev.foreach(graft.functions.releaseCheckpoint)
    nodes.unpersist()
    withDeg.unpersist()
    result
  }

  /** Oracle query: PageRank over the supplier->part bipartite graph derived
    * from lineitem (distinct (s<suppkey>, p<partkey>) edges), 3 iterations,
    * top 30. Suppliers are pure sources (rank 0.15 after round 1); parts
    * rank by how much supplier mass flows in.
    */
  def supplierPartRank(spark: SparkSession, dir: String): DataFrame = {
    // dedup on the NUMERIC key pair (8 bytes each) before formatting node
    // ids — shuffling pre-concat strings would move ~2x the bytes through
    // the distinct for no semantic difference
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
    val edges = pairs.select(concat(lit("s"), col("sk")).as("src"),
      concat(lit("p"), col("pk")).as("dst"))
    pageRank(edges, iters = 3, damping = 0.85, topK = 30, dedup = false)
  }

  val supplierPartRankSql: String = {
    def iter(prev: String, cur: String): String =
      s"""$cur AS (SELECT n.node,
           0.15 + 0.85 * coalesce(s.inflow, 0) AS rank
         FROM n LEFT JOIN (
           SELECT e.dst AS node, sum($prev.rank / d.deg) AS inflow
           FROM e JOIN d ON d.src = e.src JOIN $prev ON $prev.node = e.src
           GROUP BY 1) s ON s.node = n.node)"""
    s"""WITH e AS (SELECT DISTINCT 's' || l_suppkey AS src,
           'p' || l_partkey AS dst FROM lineitem),
       n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       r0 AS (SELECT node, 1.0 AS rank FROM n),
       ${iter("r0", "r1")},
       ${iter("r1", "r2")},
       ${iter("r2", "r3")}
       SELECT node, round(rank + 1e-9, 4) AS rank FROM r3
       ORDER BY rank DESC, node LIMIT 30"""
  }
}
