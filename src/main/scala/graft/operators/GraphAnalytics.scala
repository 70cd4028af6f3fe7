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
    * the common simplified form, deterministic and oracle-mirrorable. The
    * full-option overload below adds textbook dangling-mass redistribution
    * and an optional convergence-delta stop for production graphs.
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
      topK: Int, dedup: Boolean = true): DataFrame =
    pageRank(edges, iters, damping, topK, dedup,
      redistributeDangling = false, tol = None)

  /** Persist edges BUCKETED by `src` for the iterative graph jobs — the
    * at-scale layout ARCHITECTURE documents for PageRank/LPA, now measured
    * (tools.PageRankLayoutProbe, 1M edges / 100k nodes, 3 iterations,
    * broadcast joins disabled): the bucketed table cuts per-run shuffle
    * bytes 162 -> 49 MB (-70%) and wall time 3.9 -> 2.5 s vs the cached
    * unbucketed form, for a one-time ~2 s layout write. The win is the
    * per-round rank join: a bucketed scan reports hashpartitioning(src),
    * so the src-side exchange disappears every iteration and only the
    * irreducible inflow groupBy(dst) (+ node join) still moves data. Feed
    * `spark.table(table)` to [[pageRank]]/[[labelPropagation]] with
    * `dedup = false` (the write deduplicates).
    */
  def writeBucketedEdges(edges: DataFrame, table: String,
      buckets: Int = 32): Unit =
    edges.select(col("src"), col("dst")).distinct()
      .write.mode("overwrite")
      .bucketBy(buckets, "src").sortBy("src").saveAsTable(table)

  /** Full-option PageRank. Two orthogonal extensions over the oracle mode
    * (VERDICT r9 item 7), each with a clear "when to use":
    *
    *  - `redistributeDangling`: spread each round's dangling mass (rank
    *    held by nodes with no out-edges) uniformly over all nodes — the
    *    textbook formulation, under which total rank is CONSERVED at N.
    *    Use it when ranks must be comparable across graphs or rounds (the
    *    absolute values mean something); leave it off for the oracle mode,
    *    where sinks absorbing mass keeps the computation a pure chained-CTE
    *    plan an external SQL engine mirrors exactly.
    *  - `tol`: stop when no node's rank moved more than `tol` since the
    *    previous round (L-inf). Use it on real graphs where the iteration
    *    count needed is unknown — typically converges long before a
    *    conservative fixed bound; keep fixed-iteration for oracles and
    *    cross-engine determinism (a convergence test is itself
    *    float-order-sensitive near the threshold).
    *
    * Both extensions add only SCALAR per-round driver reads (the dangling
    * mass sum and the max delta — one row each, never corpus-sized), so the
    * scale shape is unchanged: one join + one combiner-friendly aggregate
    * per round over bucketable node keys.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double,
      topK: Int, dedup: Boolean,
      redistributeDangling: Boolean, tol: Option[Double]): DataFrame = {
    // callers that already deduplicated (ideally on narrower pre-formatted
    // keys — see supplierPartRank) skip the extra shuffle
    val e0 = edges.select(col("src"), col("dst"))
    // materialize the edge list ONCE (r19): nodes, the degree join and the
    // optional dangling anti-join are 3-4 separate consumers, and each one
    // re-derived the full upstream scan + distinct before this (the same
    // multi-consumer lesson as triangleCounts' edge checkpoint — guide
    // §2.4: the recomputed exchange is a shuffle you can simply delete).
    // At cluster scale this is the persisted/bucketed edge table
    // ([[writeBucketedEdges]]); localCheckpoint is the single-job analog.
    val e = (if (dedup) e0.distinct() else e0).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src").cache()
    // dangling = nodes with no out-edge; their count and per-round mass are
    // scalar aggregates (bounded driver reads, like the IVF centroid
    // lookups). Only materialized when redistribution is on.
    val dangling =
      if (redistributeDangling)
        Some(nodes.join(e.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti").cache())
      else None
    val nNodes = if (redistributeDangling) nodes.count().toDouble else 0.0
    var ranks = nodes.withColumn("rank", lit(1.0))
    var prev: Option[DataFrame] = None
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val dangShare = dangling.map { d =>
        val mass = Option(ranks.join(d, "node")
          .agg(sum(col("rank"))).head.get(0))
          .fold(0.0)(_.asInstanceOf[Double])
        damping * mass / nNodes
      }.getOrElse(0.0)
      val inflow = withDeg.join(ranks, withDeg("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("inflow"))
      val next = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"), (lit(1 - damping) + lit(dangShare) +
          lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint()
      tol.foreach { t =>
        val delta = next.select(col("node"), col("rank").as("r_new"))
          .join(ranks.select(col("node"), col("rank").as("r_old")), "node")
          .agg(max(abs(col("r_new") - col("r_old")))).head.getDouble(0)
        if (delta <= t) converged = true
      }
      prev.foreach(graft.functions.releaseCheckpoint)
      ranks = next
      prev = Some(ranks)
    }
    val result = ranks
      .select(col("node"), round4(col("rank")).as("rank"))
      .orderBy(desc("rank"), asc("node")).limit(topK)
      .localCheckpoint()
    prev.foreach(graft.functions.releaseCheckpoint)
    graft.functions.releaseCheckpoint(e)
    nodes.unpersist()
    withDeg.unpersist()
    dangling.foreach(_.unpersist())
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

  /** Per-node triangle participation via the ordered-edge wedge join (the
    * standard distributed triangle algorithm): with every edge stored once
    * as (u < v), wedges come from one self-join on the lower endpoint and
    * close with one semi-probe back into the edge list — no node ever
    * enumerates its full neighborhood twice. Here nodes order by id (the
    * oracle's determinism); at 100 TB order by DEGREE instead — directing
    * edges low-degree -> high-degree bounds per-node wedge fan-out by the
    * graph's arboricity (the classic skew fix for social-graph hubs).
    */
  def triangleCounts(edges: DataFrame, topK: Int): DataFrame = {
    // normalize to canonical u < v INSIDE the operator (one narrow
    // projection): a caller passing undirected or reversed orientations
    // would otherwise over-count (both orientations survive distinct() and
    // re-close the same triangle) or miss triangles whose edge only
    // appears reversed. The deduped edge list is then referenced three
    // times (both wedge sides + the closing probe): materialize it once —
    // without this the whole upstream edge derivation re-executes per
    // reference. On a cluster this is the natural persisted edge table.
    val e = edges
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct().localCheckpoint()
    // both joins broadcast the (small) edge list so the ~50M-row wedge
    // stream is never sorted or shuffled: the wedge join streams e against
    // a broadcast of itself, and the closing probe hashes into the same
    // broadcast. (A HOF combinations-explode variant was measured SLOWER —
    // lambda struct-building interprets per element while the join stays
    // in whole-stage codegen.) When the edge list outgrows broadcast at
    // true graph scale, degree-order the edges first — that shrinks the
    // wedge stream itself — and bucket both sides on the join keys.
    val wedges = e.as("x").join(broadcast(e).as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.u").as("a"), col("x.v").as("b"), col("y.v").as("c"))
    val tris = wedges.join(broadcast(e),
      col("u") === col("b") && col("v") === col("c"))
    // one 3-element array explode per triangle — NOT a 3-way unionAll of
    // tris, which would place the wedge+closing joins into three union
    // branches and replay the streamed join work per branch (only the
    // broadcast is reused across branches)
    val result = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
      .orderBy(desc("n_tri"), asc("node")).limit(topK)
      .localCheckpoint()
    // the final top-K is materialized, so the edge-list blocks release now
    // instead of lingering until the result frame is GC'd
    graft.functions.releaseCheckpoint(e)
    result
  }

  /** Oracle query: triangle participation in the part co-purchase graph
    * (parts sharing an order in lineitem, edges deduped as u < v), counted
    * EXACTLY on the induced subgraph of a deterministic 1/3 node sample
    * (p % 3 == 0) — the node-sampling triangle estimator (DOULION-family,
    * Tsourakakis et al. 2009): a triangle survives induced node sampling
    * with probability (1/3)^3, so `27 x subgraph count` estimates the full
    * graph's total, and per-node counts rank the sampled hubs. The sample
    * cuts the wedge stream 27x (measured 15 s -> sub-second warm at
    * sf0.1); an exact full count runs the same [[triangleCounts]] plan on
    * the unsampled edges — at 100 TB that is the node-coloring scheme:
    * partition nodes into k colors and union the per-color-triple runs.
    * The per-order pair explode is bounded: a TPC-H order has <= 7
    * lineitems, so <= 21 pairs per order regardless of corpus size.
    */
  def coPurchaseTriangles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_partkey") % 3 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
    triangleCounts(edges, topK = 10)
  }

  val coPurchaseTrianglesSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
         FROM lineitem WHERE l_partkey % 3 = 0),
       e AS (SELECT DISTINCT a.p AS u, b.p AS v
         FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
       w AS (SELECT x.u AS a, x.v AS b, y.v AS c
         FROM e x JOIN e y ON x.u = y.u AND x.v < y.v),
       tri AS (SELECT a, b, c FROM w JOIN e ON e.u = w.b AND e.v = w.c),
       nodes AS (SELECT a AS node FROM tri UNION ALL
         SELECT b FROM tri UNION ALL SELECT c FROM tri)
       SELECT node, CAST(count(*) AS BIGINT) AS n_tri
       FROM nodes GROUP BY 1 ORDER BY n_tri DESC, node LIMIT 10"""

  /** Oracle query for the REDISTRIBUTED variant: on the supplier->part
    * bipartite graph every part is a sink, so without redistribution
    * ~half the graph's rank mass simply vanishes — this graph is the
    * showcase for why the textbook form exists. 2 iterations, top 30;
    * the per-round dangling mass is a scalar the SQL mirrors as a
    * subquery over the previous round's sink ranks.
    */
  def supplierPartRankDangling(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
    val edges = pairs.select(concat(lit("s"), col("sk")).as("src"),
      concat(lit("p"), col("pk")).as("dst"))
    pageRank(edges, iters = 2, damping = 0.85, topK = 30, dedup = false,
      redistributeDangling = true, tol = None)
  }

  val supplierPartRankDanglingSql: String = {
    // one redistribution round: S = sum of the previous round's rank over
    // nodes with NO out-edge; every node gets 0.85 * S / N on top of the
    // usual damped inflow
    def iter(prev: String, cur: String): String =
      s"""${cur}_dang AS (SELECT coalesce(sum($prev.rank), 0) AS mass
           FROM $prev LEFT JOIN d ON d.src = $prev.node
           WHERE d.src IS NULL),
         $cur AS (SELECT n.node,
           0.15 + 0.85 * (SELECT mass FROM ${cur}_dang) / (SELECT cnt FROM nc)
             + 0.85 * coalesce(s.inflow, 0) AS rank
         FROM n LEFT JOIN (
           SELECT e.dst AS node, sum($prev.rank / d.deg) AS inflow
           FROM e JOIN d ON d.src = e.src JOIN $prev ON $prev.node = e.src
           GROUP BY 1) s ON s.node = n.node)"""
    s"""WITH e AS (SELECT DISTINCT 's' || l_suppkey AS src,
           'p' || l_partkey AS dst FROM lineitem),
       n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       nc AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM n),
       d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       r0 AS (SELECT node, 1.0 AS rank FROM n),
       ${iter("r0", "r1")},
       ${iter("r1", "r2")}
       SELECT node, round(rank + 1e-9, 4) + 0.0 AS rank FROM r2
       ORDER BY rank DESC, node LIMIT 30"""
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007), deterministic variant: each round every node adopts the MOST
    * FREQUENT label among its neighbors, ties broken toward the smaller
    * label; isolated nodes keep their own. A FIXED round count makes the
    * whole computation one deterministic plan (the classic async/random
    * LPA is irreproducible by design — wrong for an oracle-gated engine;
    * fixed-round sync LPA is the standard determinization and what a
    * curation pipeline wants for grouping near-dup graph neighborhoods
    * into communities).
    *
    * Scale shape per round: one join of the label table onto the
    * symmetrized edge list (bucketable on the node key), one
    * combiner-friendly (node, label) count, then a per-node keep-best
    * as a `min_by` AGGREGATE — never `row_number() over (partition by
    * node)`: real-graph degree is power-law, so a hub node's whole
    * neighbor-label set would land on one window task, while the
    * aggregate pre-combines map-side and its shuffle is AQE-splittable.
    * `min_by(nlabel, struct(-cnt, nlabel))` is the exact window
    * equivalent of `desc(cnt), asc(nlabel)` for ANY orderable label
    * type (string node ids included, where a negated-label max_by
    * would not typecheck). Labels localCheckpoint per round so lineage
    * never compounds (the PageRank loop's doctrine); edge+node
    * invariants cache across rounds.
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    val e0 = edges.select(col("u"), col("v")).filter(col("u") =!= col("v"))
    val sym = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().cache()
    val nodes = sym.select(col("u").as("node")).distinct().cache()
    var labels = nodes.withColumn("label", col("node"))
    var prev: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val best = sym.join(labels, sym("v") === labels("node"))
        .groupBy(col("u").as("nu"), col("label").as("nlabel"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("nu"))
        .agg(min_by(col("nlabel"),
          struct(negate(col("cnt")), col("nlabel"))).as("nlabel"))
      labels = labels.join(best, labels("node") === best("nu"), "left")
        .select(col("node"), coalesce(col("nlabel"), col("label")).as("label"))
        .localCheckpoint()
      prev.foreach(graft.functions.releaseCheckpoint)
      prev = Some(labels)
    }
    val result = labels.orderBy("node").localCheckpoint()
    prev.foreach(graft.functions.releaseCheckpoint)
    sym.unpersist()
    nodes.unpersist()
    result
  }

  /** Oracle query: 2 sync LPA rounds over the sampled part co-purchase
    * graph (same deterministic 1/3 node sample as [[coPurchaseTriangles]]),
    * plus each node's final community size.
    */
  def coPurchaseCommunities(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_partkey") % 3 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
    // community_size via groupBy+join, never count().over(partitionBy
    // (label)): real-graph LPA converges to giant communities (a web-graph
    // giant component is a double-digit fraction of all nodes), and a
    // window would put every member on one task; the aggregate
    // pre-combines and the join back is AQE-skew-splittable.
    val labels = labelPropagation(edges, iters = 2)
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("label"))
      .select(col("node"), col("label"), col("community_size"))
      .orderBy("node")
  }

  val coPurchaseCommunitiesSql: String = {
    def round(prev: String, cur: String): String =
      s"""${cur}_best AS (SELECT nu, nlabel FROM (
           SELECT e.u AS nu, $prev.label AS nlabel, count(*) AS cnt,
             row_number() OVER (PARTITION BY e.u
               ORDER BY count(*) DESC, $prev.label) AS rn
           FROM e JOIN $prev ON $prev.node = e.v
           GROUP BY 1, 2) t WHERE rn = 1),
         $cur AS (SELECT l.node, coalesce(b.nlabel, l.label) AS label
           FROM $prev l LEFT JOIN ${cur}_best b ON b.nu = l.node)"""
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
         FROM lineitem WHERE l_partkey % 3 = 0),
       e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
         FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
       e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
       n AS (SELECT DISTINCT u AS node FROM e),
       l0 AS (SELECT node, node AS label FROM n),
       ${round("l0", "l1")},
       ${round("l1", "l2")}
       SELECT node, label,
         CAST(count(*) OVER (PARTITION BY label) AS BIGINT)
           AS community_size
       FROM l2 ORDER BY node"""
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
       SELECT node, round(rank + 1e-9, 4) + 0.0 AS rank FROM r3
       ORDER BY rank DESC, node LIMIT 30"""
  }
}
