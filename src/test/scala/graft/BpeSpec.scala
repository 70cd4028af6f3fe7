package graft

import graft.operators.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** BPE training/application on the paper's own fixture style: merge order
  * is hand-checkable from pair counts, training is deterministic, and
  * application compresses in-vocabulary words to whole tokens.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("training learns the hand-computed merge order") {
    import spark.implicits._
    // 5x "low", 2x "lower", 1x "lowest": pair (l,o) count 8 dominates,
    // then (lo,w) 8 — the classic Sennrich walkthrough shape
    val docs = Seq("low low low low low lower lower lowest").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")),
      s"first merges: $merges")
    // after (l,o),(lo,w): "low</w>" appears 5x, "e r/w e" pairs compete;
    // (low,</w>) count 5 beats (e,r) 2 and (w,e) 3
    assert(merges(2) == (("low", Bpe.EndOfWord)), s"got $merges")
  }

  test("encoding compresses learned words and keeps boundaries") {
    import spark.implicits._
    val docs = Seq("low low low low low lower lower lowest").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    // "low" collapses to a single token; an unseen word stays char-level-ish
    assert(Bpe.encodeWord("low", merges) == Seq("low" + Bpe.EndOfWord) ||
      Bpe.encodeWord("low", merges) == Seq("low", Bpe.EndOfWord),
      s"got ${Bpe.encodeWord("low", merges)}")
    val unseen = Bpe.encodeWord("cat", merges)
    assert(unseen.size >= 3, s"unseen word must stay split: $unseen")
    // merges never cross word boundaries: two words never share a token
    val col = Bpe.tokenizeColumn(merges)
    val out = Seq("low low").toDF("text")
      .select(col(org.apache.spark.sql.functions.col("text")).as("toks"))
      .head.getAs[scala.collection.Seq[String]](0)
    assert(out.size >= 2 && out.forall(!_.contains(" ")), s"got $out")
  }

  test("fertility drops as merges accumulate; sampling is deterministic") {
    import spark.implicits._
    val docs = (1 to 50).map(i =>
      s"the quick brown fox jumps over the lazy dog $i").toDF("text")
    val few = Bpe.train(docs, "text", numMerges = 2)
    val many = Bpe.train(docs, "text", numMerges = 25)
    val (fFew, fMany) = (Bpe.fertility(docs, "text", few),
      Bpe.fertility(docs, "text", many))
    assert(fMany < fFew, s"more merges must compress: $fFew vs $fMany")
    assert(fMany >= 1.0, "fertility is bounded below by 1 token per word")
    // hash-sampled training is reproducible run to run
    val a = Bpe.train(docs, "text", numMerges = 5, sampleFraction = 0.5)
    val b = Bpe.train(docs, "text", numMerges = 5, sampleFraction = 0.5)
    assert(a == b, "deterministic sample must yield identical merges")
  }

  test("cross-seed sample stability: two different half-samples of a real " +
    "corpus learn (near-)identical merge tables") {
    // tokenizer reproducibility from a SAMPLE is the design point of the
    // deterministic hash sampling: two different seeds draw two different
    // half-corpora, and a sufficient sample makes the learned merges agree.
    // Real documents table (not synthetic repetition, which would trivially
    // agree); per-round wall time recorded via the onRound hook so the
    // probe discipline is spec-exercised too.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text")
    val times = scala.collection.mutable.ArrayBuffer.empty[Double]
    val m1 = Bpe.train(docs, "text", numMerges = 15, sampleFraction = 0.5,
      seed = 1L, onRound = (_, s) => times += s)
    val m2 = Bpe.train(docs, "text", numMerges = 15, sampleFraction = 0.5,
      seed = 2L)
    assert(m1.size == 15 && m2.size == 15)
    assert(times.size == 15 && times.forall(_ > 0))
    val prefix = m1.zip(m2).takeWhile { case (a, b) => a == b }.size
    val overlap = (m1.toSet & m2.toSet).size
    info(s"cross-seed: identical prefix $prefix/15, set overlap $overlap/15")
    assert(overlap >= 12,
      s"half-sample merge tables diverged: $overlap/15 overlap\n$m1\n$m2")
    // and the same seed is exactly reproducible
    val m1b = Bpe.train(docs, "text", numMerges = 15, sampleFraction = 0.5,
      seed = 1L)
    assert(m1 == m1b, "same seed must reproduce the identical table")
  }

  test("degenerate corpora: empty text and singleton pairs stop training") {
    import spark.implicits._
    assert(Bpe.train(Seq("").toDF("text"), "text", 5).isEmpty)
    // every pair unique (count 1 < 2): no merge is worth learning
    assert(Bpe.train(Seq("ab cd ef").toDF("text"), "text", 5).isEmpty)
  }
}
