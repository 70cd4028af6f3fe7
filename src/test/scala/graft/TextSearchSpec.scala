package graft

import graft.operators.TextSearch
import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.funsuite.AnyFunSuite

/** BM25 semantics on a hand-computed corpus + plan-shape guards. */
class TextSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // 4 docs, dl = 3/3/3/3, avgdl = 3, N = 4
  //   d1: "cat cat cat"   d2: "cat dog fish"   d3: "dog dog dog"
  //   d4: "bird bird bird"
  private def corpus = {
    import spark.implicits._
    Seq((1L, "cat cat cat"), (2L, "cat dog fish"), (3L, "dog dog dog"),
      (4L, "bird bird bird")).toDF("doc_id", "text")
  }

  private def bm25(terms: Seq[String], k: Int = 10) =
    TextSearch.bm25TopK(corpus, "text", "doc_id", terms, k)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

  test("bm25 idf separates rare from common terms") {
    // df(cat)=2, df(fish)=1 over N=4: idf(fish) > idf(cat), so the doc
    // matching only fish-like evidence still reflects the rarity weight.
    // d2 matches both terms; d1 matches cat three times.
    val res = bm25(Seq("cat", "fish")).toMap
    assert(res.contains(1L) && res.contains(2L) && !res.contains(3L) &&
      !res.contains(4L))
    // d2 (one cat + one fish) must outrank d1 (three cats): tf saturates
    // (k1 = 1.2 caps the tf factor at ~2.2x) while a second, RARER term
    // adds a full idf contribution
    assert(res(2L) > res(1L), s"expected d2 > d1, got $res")
  }

  test("bm25 matches the closed form on a single term") {
    // term dog: df=2, idf = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2); dl=avgdl
    // so the length norm is 1 and score = idf * tf*2.2/(tf+1.2)
    def expected(tf: Double) = math.log(2.0) * tf * 2.2 / (tf + 1.2)
    val res = bm25(Seq("dog")).toMap
    assert(math.abs(res(3L) - BigDecimal(expected(3) + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(res(2L) - BigDecimal(expected(1) + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("bm25 ranks deterministically with asc-id tie-break and honors k") {
    val res = bm25(Seq("dog"), k = 1)
    assert(res.length == 1 && res.head._1 == 3L)
  }

  test("shard packing: every non-final shard meets the budget, shards are " +
    "contiguous, and totals conserve") {
    val sf = "/root/testdata/sf0.001"
    val shards = graft.operators.TextAnalysis.shardPack(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val totalDocs = docs.count()
    val totalTok = docs
      .select(graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .agg(sum("n")).head().getLong(0)
    // conservation: every doc lands in exactly one shard
    assert(shards.map(_.getLong(2)).sum == totalDocs)
    assert(shards.map(_.getLong(3)).sum == totalTok)
    shards.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // shard ids are 0..n-1 contiguous per source
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length).toSeq,
        s"non-contiguous shards for $src")
      // a shard closes only after its cumulative boundary is crossed: the
      // running total through shard k is >= (k+1) x 500 for every
      // non-final k. (A single shard's own total CAN undershoot the
      // budget when a large doc straddles the previous boundary and
      // "steals" tokens — the boundary guarantee is cumulative.)
      sorted.dropRight(1).zipWithIndex.foldLeft(0L) { case (cum, (r, k)) =>
        val through = cum + r.getLong(3)
        assert(through >= (k + 1) * 500L,
          s"shard $k of $src closed before its boundary: $through")
        through
      }
      // id ranges do not overlap across consecutive shards
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4))
        case _ => ()
      }
    }
  }

  test("shard packing: salted two-phase cumsum is exactly the unsalted " +
    "packing at every salt width") {
    // saltWidth = Long.MaxValue degenerates to one salt per source = the
    // pre-r14 single-window plan; tiny widths force many stitched salts
    // (including salts that straddle shard boundaries). All-long
    // arithmetic, so equality is exact, not approximate.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val unsalted = graft.operators.TextAnalysis
      .shardPack(docs, 500.0, Long.MaxValue).collect().toSeq
    assert(unsalted.nonEmpty)
    for (width <- Seq(1L, 7L, 64L, 4096L)) {
      val salted = graft.operators.TextAnalysis
        .shardPack(docs, 500.0, width).collect().toSeq
      assert(salted == unsalted, s"salted width=$width diverged")
    }
    // sequenceChunks rides the same salted cumsum — same exactness claim
    val chunksUnsalted = graft.operators.TextAnalysis
      .sequenceChunks(docs, 256L, Long.MaxValue).collect().toSeq
    assert(chunksUnsalted.nonEmpty)
    for (width <- Seq(7L, 4096L)) {
      val salted = graft.operators.TextAnalysis
        .sequenceChunks(docs, 256L, width).collect().toSeq
      assert(salted == chunksUnsalted, s"chunks width=$width diverged")
    }
  }

  test("bm25 plan cuts with TakeOrderedAndProject and no cartesian corpus product") {
    val df = TextSearch.bm25TopK(corpus, "text", "doc_id", Seq("cat"), 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject cut in:\n$plan")
    // the only nested-loop join allowed is the 1-row stats broadcast
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnl <= 1, s"unexpected nested-loop joins ($bnl) in:\n$plan")
  }
}
