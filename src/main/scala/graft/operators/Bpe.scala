package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Byte-pair-encoding tokenizer training and application (Sennrich et al.
  * 2016) — the tokenizer-fitting step of an LLM data pipeline, Spark-first:
  *
  *  - TRAINING is iterative: each round counts adjacent symbol pairs over
  *    the working corpus (one explode + one combiner-friendly groupBy — a
  *    linear pass), picks the most frequent pair on the driver (ONE row —
  *    a bounded scalar read, ties broken lexicographically so training is
  *    deterministic), and rewrites the corpus by merging that pair. The
  *    working corpus localCheckpoints per round so lineage never compounds
  *    (the iterative-loop doctrine shared with PageRank/CC).
  *  - At 100 TB nobody trains on the full corpus: standard practice is a
  *    small uniform sample (`sampleFraction`) — the merge table converges
  *    on far less data than training consumes — and APPLICATION broadcasts
  *    the learned merge list to every executor as plain serialized state.
  *
  * Words are pre-split on whitespace and marked with a terminal `</w>`
  * symbol (the original paper's word-boundary convention), so merges never
  * cross word boundaries. No SQL oracle by design: K data-dependent
  * rewrite rounds are a training loop, not a query — the semantics are
  * spec-pinned on the paper's own style of fixture instead.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Initial symbol sequence of one word: characters + the `</w>` mark. */
  private[operators] def initSymbols(word: String): Seq[String] =
    word.map(_.toString) :+ EndOfWord

  /** Apply one merge rule to a symbol sequence (left-to-right, the
    * standard greedy pass).
    */
  private[operators] def mergeOnce(symbols: Seq[String],
      pair: (String, String)): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < symbols.length) {
      if (i + 1 < symbols.length &&
          symbols(i) == pair._1 && symbols(i + 1) == pair._2) {
        out += (pair._1 + pair._2)
        i += 2
      } else { out += symbols(i); i += 1 }
    }
    out.toSeq
  }

  /** Train `numMerges` BPE merges over a text column. Returns the ordered
    * merge list. `sampleFraction` < 1 trains on a deterministic hash
    * sample (`xxhash64` coin — reproducible, no RNG state); `seed` salts
    * the coin so two DIFFERENT same-size samples can be drawn — the
    * cross-sample agreement is the measured evidence that the sample is
    * large enough for a reproducible tokenizer (BpeSpec, BpeScaleProbe).
    *
    * Sample-size guidance (BpeScaleProbe BPE_MATRIX, sf0.1 = 5000 docs,
    * 30 merges, seeds 1 vs 2): merge-TABLE identity is sample-sensitive in
    * its tail and never reaches 28/30 below the full corpus (fraction 0.2
    * → 20/30 set overlap, 0.5 → 23/30; order prefix 0 at both — near-tied
    * pair counts flip even the first merge), but the metric that matters
    * downstream — `fertility` — is already sample-stable at 0.5 (drift
    * 0.0014 tokens/word = 0.04%, vs 0.0347 = 1% at 0.2). So the default
    * here stays 1.0 (train on everything you can afford), and the
    * reproducibility criterion for sampled training is FERTILITY DRIFT,
    * not merge identity; at 100 TB choose the sample by absolute token
    * budget — on this corpus ~2.5k docs sufficed where ~1k did not — not
    * by fraction. `onRound` observes (round, seconds) per merge round for
    * wall-time probes.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      sampleFraction: Double = 1.0, seed: Long = 0L,
      onRound: (Int, Double) => Unit = (_, _) => ()): Seq[(String, String)] = {
    val base0 = docs.select(col(textCol).as("text"))
    val base = if (sampleFraction >= 1.0) base0
      else base0.filter(
        pmod(abs(xxhash64(col("text"), lit(seed))), lit(1000000)) <
          lit((sampleFraction * 1000000).toLong))
    // working corpus: one row per WORD as its current symbol array —
    // word-frequency weighting falls out of keeping duplicates
    val split = udf((t: String) =>
      Option(t).getOrElse("").toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq)
    var work = base
      .select(explode(split(col("text"))).as("w"))
      .select(udf((w: String) => initSymbols(w)).apply(col("w")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    for (round <- 1 to numMerges if !exhausted) {
      val roundT0 = System.nanoTime()
      // adjacent-pair counts: explode each row's bigrams, one groupBy
      val bigrams = when(size(col("syms")) < 2,
        array().cast("array<struct<a:string,b:string>>"))
        .otherwise(transform(sequence(lit(1), size(col("syms")) - 1), i =>
          struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b"))))
      val top = work.select(explode(bigrams).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) exhausted = true
      else {
        val pair = (top.head.getString(0), top.head.getString(1))
        merges += pair
        val applyMerge = udf((s: scala.collection.Seq[String]) =>
          mergeOnce(s.toSeq, pair))
        val next = work.select(applyMerge(col("syms")).as("syms"))
          .localCheckpoint()
        graft.functions.releaseCheckpoint(work)
        work = next
      }
      onRound(round, (System.nanoTime() - roundT0) / 1e9)
    }
    graft.functions.releaseCheckpoint(work)
    merges.toSeq
  }

  /** Tokenize a word with a trained merge list (merges applied in learned
    * order — the standard BPE apply).
    */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(initSymbols(word))(mergeOnce)

  /** Column form: tokenize a text column with the broadcast merge list;
    * adds an array<string> of subword tokens. The merge list is plain
    * closure state (KBs) — every executor applies it locally, no shuffle.
    */
  def tokenizeColumn(merges: Seq[(String, String)]): Column => Column = {
    val ms = merges // immutable, serialized into the UDF closure
    val f = udf((t: String) =>
      Option(t).getOrElse("").toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => encodeWord(w, ms)))
    c => f(c)
  }

  /** Fertility = subword tokens per whitespace word — THE tokenizer
    * quality number (a tokenizer fit to the corpus drives it toward 1).
    */
  def fertility(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): Double = {
    val toks = tokenizeColumn(merges)(col(textCol))
    val words = udf((t: String) =>
      Option(t).getOrElse("").split("\\s+").count(_.nonEmpty))
    val r = docs.select(
      sum(size(toks)).as("t"), sum(words(col(textCol))).as("w")).head()
    if (r.isNullAt(1) || r.getLong(1) == 0L) 0.0
    else r.getLong(0).toDouble / r.getLong(1)
  }
}
