package graft.operators

import graft.Tables
import graft.functions.TextFunctions.{md5Bucket, tokens}
import graft.functions.round4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Training-data policy operators: PII redaction and benchmark-contamination
  * detection — standard hygiene stages of a large-scale pretraining
  * pipeline, expressed as pure column transforms (redaction) and a bucketed
  * shingle join (contamination), both DuckDB-oracle-gated.
  *
  * Patterns stay inside the regex dialect common to Java and RE2 (no
  * lookaround, no backreferences) so the Spark plan and the SQL oracle
  * compile the same language.
  */
object TextPolicy {

  /** (pattern, replacement) in application order: email first (its local
    * part may contain digits/dots), then SSN (digits-dashes), then phone
    * (+-prefixed), then IPv4 (digits-dots).
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("\\+\\d{1,3} \\d{3}-\\d{4}\\b", "<PHONE>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Chain of codegen'd regexp_replace — one projection, no UDF. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Oracle query: deterministic PII is injected into the synthetic corpus
    * (identically in the SQL mirror), then redacted and counted. Every
    * doc gains one email/SSN/phone/IP; docs with doc_id % 3 == 0 gain a
    * second email, so the counts are non-constant.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val contact = concat(
      lit(" contact user"), d, lit("@example.com from 10."), d % 256,
      lit(".0.7 ssn "), d % 900 + 100, lit("-"), d % 90 + 10, lit("-"),
      d % 9000 + 1000, lit(" call +1 555-"), d % 9000 + 1000)
    val extra = when(d % 3 === 0,
      concat(lit(" cc backup"), d, lit("@example.org"))).otherwise(lit(""))
    val withPii = Tables.documents(spark, dir)
      .select(d, concat(col("text"), contact, extra).as("raw"))
    withPii.select(
        d,
        size(regexp_extract_all(col("raw"), lit(PiiPatterns.head._1), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(PiiPatterns(3)._1), lit(0)))
          .cast("long").as("n_ips"),
        redactPii(col("raw")).as("redacted"))
      .orderBy("doc_id")
  }

  val piiRedactSql: String = {
    val inject = "text || ' contact user' || doc_id || '@example.com from 10.' || " +
      "(doc_id % 256) || '.0.7 ssn ' || (doc_id % 900 + 100) || '-' || " +
      "(doc_id % 90 + 10) || '-' || (doc_id % 9000 + 1000) || " +
      "' call +1 555-' || (doc_id % 9000 + 1000) || " +
      "(CASE WHEN doc_id % 3 = 0 THEN ' cc backup' || doc_id || '@example.org' ELSE '' END)"
    s"""WITH w AS (SELECT doc_id, $inject AS raw FROM documents)
       SELECT doc_id,
         len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
         len(regexp_extract_all(raw, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ips,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
           '\\+\\d{1,3} \\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS redacted
       FROM w ORDER BY doc_id"""
  }

  /** Benchmark-contamination detection (the GPT-3-style n-gram overlap
    * check): training docs sharing >= minShared distinct n-gram shingles
    * with any benchmark doc. The benchmark side (doc_id < benchCut here; a
    * fixed eval set in production) is SMALL BY DEFINITION -> its shingle
    * set broadcasts, and the training corpus is probed with a broadcast
    * hash join on one 64-bit shingle key: a 100 TB corpus streams through
    * map-side, no shuffle of the training side at all.
    */
  def contamination(spark: SparkSession, dir: String, n: Int = 5,
      benchCut: Int = 20, minShared: Int = 1): DataFrame =
    contamination(Tables.documents(spark, dir), n, benchCut, minShared)

  /** DataFrame-parametric form — needs (doc_id, text). */
  def contamination(documents: DataFrame, n: Int, benchCut: Int,
      minShared: Int): DataFrame =
    contaminationFromShingles(docShingleKeys(documents, n), benchCut,
      minShared)

  /** [[contamination]] over a precomputed [[docShingleKeys]] frame — the
    * composition point CorpusReportJob uses so the report's contamination
    * relation derives from the job's single tokenize pass (r15).
    */
  def contaminationFromShingles(sh: DataFrame, benchCut: Int = 20,
      minShared: Int = 1): DataFrame = {
    val bench = sh.filter(col("doc_id") < benchCut)
      .select(col("shk"), col("doc_id").as("bench_id"))
    val train = sh.filter(col("doc_id") >= benchCut)
      .select(col("shk"), col("doc_id").as("train_id"))
    train.join(broadcast(bench), Seq("shk"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("train_id", "bench_id")
  }

  /** Distinct (doc_id, 64-bit shingle key) rows — the shared front of the
    * contamination detector and [[decontaminate]].
    */
  private def docShingleKeys(documents: DataFrame, n: Int): DataFrame =
    docShingleKeysFromTokens(documents
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "tok"))), n)

  /** [[docShingleKeys]] from an existing (doc_id, pos, tok) explode — the
    * `FromTokens` composition point (r15): CorpusReportJob shingles off
    * its one tokenize pass instead of re-exploding the corpus. The lead
    * window is per-doc (bounded partitions by construction).
    */
  def docShingleKeysFromTokens(toks: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until n).map(i => lead(col("tok"), i).over(w).as(s"t$i"))
    val shingleCols = col("tok") +: (1 until n).map(i => col(s"t$i"))
    toks
      .select(Seq(col("doc_id"), col("tok")) ++ leads: _*)
      .filter(col(s"t${n - 1}").isNotNull)
      .select(col("doc_id"),
        xxhash64(concat_ws(" ", shingleCols: _*)).as("shk"))
      .distinct()
  }

  /** Decontamination APPLY (Brown et al. 2020 Appendix C / Rae et al. 2021
    * §A.2 — the step the reference pipelines RUN, where [[contamination]]
    * is the per-pair report): mark every training document sharing at
    * least `minShared` distinct word-`n`-grams with the BENCHMARK SET
    * (the union of all benchmark docs' shingles — any collision marks the
    * doc, the GPT-3 rule at minShared = 1; the pairwise attribution lives
    * in [[contamination]]). Emits (doc_id, n_shared, contaminated) for
    * every training doc, so the caller filters or funnels.
    *
    * Scale shape: evaluation benchmarks are BOUNDED (thousands of items,
    * never corpus-scale), so the benchmark shingle set is small and the
    * train side is one distinct + one broadcast semi-shaped join + a
    * combiner per-doc count — linear in corpus. No broadcast() HINT is
    * forced (r15, ADVICE r14): the hint would override Spark's size
    * threshold, so an unexpectedly large benchmark would drive a driver
    * OOM instead of degrading; without it, AQE sees the distinct's
    * runtime size and picks broadcast for every real benchmark while a
    * corpus-scale one genuinely degrades to a shuffle join on the 8-byte
    * shingle key, still linear.
    */
  def decontaminate(documents: DataFrame, benchmark: DataFrame, n: Int = 5,
      minShared: Int = 1): DataFrame =
    decontaminateKeys(documents, benchmarkShingles(benchmark, n), n,
      minShared)

  /** The benchmark side of [[decontaminate]], precomputed: the distinct
    * 64-bit shingle-key set of the benchmark corpus. Callers that apply
    * one benchmark against MANY corpora (every micro-batch of a stream)
    * compute this once, `cache()` it, and pass it to
    * [[decontaminateKeys]] — re-shingling a static eval set per batch is
    * pure waste (r15, VERDICT r14 item 3).
    */
  def benchmarkShingles(benchmark: DataFrame, n: Int = 5): DataFrame =
    docShingleKeys(benchmark, n).select(col("shk")).distinct()

  /** [[decontaminate]] against a pre-shingled benchmark key set (one
    * `shk` column, as produced by [[benchmarkShingles]]).
    */
  def decontaminateKeys(documents: DataFrame, benchShingles: DataFrame,
      n: Int = 5, minShared: Int = 1): DataFrame =
    decontaminateFromShingles(documents.select(col("doc_id")),
      docShingleKeys(documents, n), benchShingles, minShared)

  /** [[decontaminate]] from precomputed pieces (r15 composition point):
    * `docIds` is the full training-doc universe (docs with < n tokens
    * have no shingles but still must emit an n_shared = 0 row),
    * `docShingles` their [[docShingleKeys]] frame, `benchShingles` the
    * benchmark key set.
    */
  def decontaminateFromShingles(docIds: DataFrame, docShingles: DataFrame,
      benchShingles: DataFrame, minShared: Int = 1): DataFrame = {
    val hits = docShingles
      .join(benchShingles.select(col("shk")), Seq("shk"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    docIds.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) >= minShared)
          .as("contaminated"))
      .orderBy("doc_id")
  }

  /** Oracle composition mirroring [[contamination]]'s convention:
    * doc_id < 20 is the benchmark stand-in, the rest is the training
    * corpus.
    */
  def decontaminateScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    decontaminate(docs.filter(col("doc_id") >= 20),
      docs.filter(col("doc_id") < 20))
  }

  /** DuckDB mirror of [[decontaminateScore]] (n = 5, minShared = 1). */
  val decontaminateSql: String = {
    val toks = raw"regexp_split_to_array(lower(trim(text)), '\s+')"
    s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
       pos AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 3)) AS i
         FROM t WHERE len(tk) >= 5),
       sh AS (SELECT DISTINCT doc_id,
           tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4] AS sh
         FROM pos),
       bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
       hits AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         FROM sh s JOIN bsh USING (sh) WHERE s.doc_id >= 20 GROUP BY 1)
       SELECT d.doc_id, coalesce(h.n_shared, 0) AS n_shared,
         coalesce(h.n_shared, 0) >= 1 AS contaminated
       FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) d
       LEFT JOIN hits h USING (doc_id) ORDER BY d.doc_id"""
  }

  val contaminationSql: String = {
    val toks = raw"regexp_split_to_array(lower(trim(text)), '\s+')"
    s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
       pos AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 3)) AS i
         FROM t WHERE len(tk) >= 5),
       sh AS (SELECT DISTINCT doc_id,
           tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4] AS sh
         FROM pos)
       SELECT a.doc_id AS train_id, b.doc_id AS bench_id, count(*) AS n_shared
       FROM sh a JOIN sh b ON a.sh = b.sh
       WHERE a.doc_id >= 20 AND b.doc_id < 20
       GROUP BY 1, 2 HAVING count(*) >= 1
       ORDER BY train_id, bench_id"""
  }

  /** Repetition quality signals in the Gopher/MassiveText style (Rae et al.
    * 2021 §A1.1: "fraction of characters in the most frequent n-gram",
    * duplicate-content fractions) — the standard pre-training quality
    * filters that drop boilerplate and degenerate repetition. Per document:
    * duplicate-word fraction (1 - distinct/total; the single-line analog of
    * duplicate-line fraction) and the character fraction covered by the most
    * frequent word bigram (count x bigram length / text length, capped at 1
    * — adjacent occurrences share a word, so the naive product can exceed
    * the text).
    *
    * Scale shape: one shuffle on (doc_id, bigram) for the count, one window
    * per doc for the arg-max — linear in corpus size, no cross-document
    * state, the same plan at 100 TB. Ties on count break by bigram text so
    * both engines pick the same winner.
    */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame =
    repetitionSignals(Tables.documents(spark, dir))

  /** DataFrame-parametric form — the library API; needs (doc_id, text). */
  def repetitionSignals(documents: DataFrame): DataFrame = {
    val docs = documents
      .select(col("doc_id"), tokens(col("text")).as("ws"),
        length(col("text")).as("len_text"))
      .withColumn("n_words", size(col("ws")))
      .filter(col("n_words") >= 2)
      .withColumn("dup_word_frac", graft.functions.round4(
        (col("n_words") - size(array_distinct(col("ws")))).cast("double") /
          col("n_words")))
    val bigrams = docs.select(col("doc_id"), col("n_words"),
        col("dup_word_frac"), col("len_text"),
        explode(expr("transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
          .as("bigram"))
    val counts = bigrams
      .groupBy("doc_id", "n_words", "dup_word_frac", "len_text", "bigram")
      .agg(count(lit(1)).as("c"))
    // per-doc arg-max as min_by over (-count, bigram) — an AGGREGATE, not a
    // window: partial aggregation runs map-side, so only one candidate per
    // doc per partition crosses the second exchange (a window would shuffle
    // every bigram count). Ordering key (-c, bigram) = count desc, text asc
    // — the oracle's row_number tie-break.
    counts
      .groupBy("doc_id", "n_words", "dup_word_frac", "len_text")
      .agg(min_by(struct(col("bigram"), col("c")),
        struct((-col("c")).as("nc"), col("bigram"))).as("top"))
      .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
        col("dup_word_frac"),
        col("top.bigram").as("top_bigram"),
        graft.functions.round4(least(lit(1.0),
          col("top.c") * length(col("top.bigram")) / col("len_text")))
          .as("top_bigram_char_frac"))
      .orderBy("doc_id")
  }

  val repetitionSignalsSql: String = {
    val toks = raw"regexp_split_to_array(lower(trim(text)), '\s+')"
    s"""WITH t AS (SELECT doc_id, $toks AS ws, length(text) AS len_text
         FROM documents),
       base AS (SELECT doc_id, len_text, ws, len(ws) AS n_words,
           round((len(ws) - len(list_distinct(ws)))::DOUBLE / len(ws) + 1e-9, 4) + 0.0
             AS dup_word_frac
         FROM t WHERE len(ws) >= 2),
       pos AS (SELECT doc_id, n_words, dup_word_frac, len_text, ws,
           unnest(range(1, len(ws))) AS i FROM base),
       bg AS (SELECT doc_id, n_words, dup_word_frac, len_text,
           ws[i] || ' ' || ws[i+1] AS bigram FROM pos),
       cnt AS (SELECT doc_id, n_words, dup_word_frac, len_text, bigram,
           count(*) AS c
         FROM bg GROUP BY 1, 2, 3, 4, 5),
       top AS (SELECT *, row_number() OVER (PARTITION BY doc_id
           ORDER BY c DESC, bigram ASC) AS rn FROM cnt)
       SELECT doc_id, n_words, dup_word_frac, bigram AS top_bigram,
         round(least(1.0, c * length(bigram) / len_text) + 1e-9, 4) + 0.0
           AS top_bigram_char_frac
       FROM top WHERE rn = 1 ORDER BY doc_id"""
  }

  /** Corpus-level boilerplate n-gram filtering (the C4/RefinedWeb cleanup
    * step): the most document-frequent 3-gram shingles ACROSS the corpus
    * form the boilerplate list; a document is flagged when the fraction of
    * its distinct shingles on that list exceeds `maxCoverage`. This is the
    * cross-document complement of the WITHIN-doc Gopher signals
    * ([[repetitionSignals]]) — nav bars, license headers, and signup
    * prompts repeat across documents and are invisible per-doc.
    *
    * Scale shape: shingle explode is O(tokens); document frequency is one
    * combiner-friendly groupBy on the shingle key; the top-K cut is a
    * TakeOrderedAndProject (tie-break on the shingle text so engines pick
    * the same list); the tiny list broadcasts back onto the per-doc
    * shingles for the coverage aggregate. The corpus is never shuffled on
    * anything wider than the shingle key, and never joined to itself.
    * `flagged` compares the ROUNDED coverage in both engines so the
    * threshold can never flip on sub-1e-4 float noise.
    */
  def boilerplateFlags(spark: SparkSession, dir: String, n: Int = 3,
      topK: Int = 15, maxCoverage: Double = 0.5): DataFrame =
    boilerplateFlags(Tables.documents(spark, dir), n, topK, maxCoverage)

  /** DataFrame-parametric form — the library API; needs (doc_id, text). */
  def boilerplateFlags(documents: DataFrame, n: Int,
      topK: Int, maxCoverage: Double): DataFrame = {
    val toks = documents
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until n).map(i => lead(col("tok"), i).over(w).as(s"t$i"))
    val shingleCols = col("tok") +: (1 until n).map(i => col(s"t$i"))
    val sh = toks
      .select(Seq(col("doc_id"), col("tok")) ++ leads: _*)
      .filter(col(s"t${n - 1}").isNotNull)
      .select(col("doc_id"), concat_ws(" ", shingleCols: _*).as("sh"))
      .distinct()
    val top = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("sh")).limit(topK)
    val perDoc = sh
      .join(broadcast(top.select(col("sh"), lit(1).as("_b"))), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_b").isNotNull, 1).otherwise(0)).cast("long").as("n_boiler"))
    // sub-n-token docs have no shingles at all: join them back with zeros
    documents.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
      .withColumn("coverage", round4(when(col("n_shingles") === 0, 0.0)
        .otherwise(col("n_boiler").cast("double") / col("n_shingles"))))
      .withColumn("flagged", col("coverage") > maxCoverage)
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity filtering (Wenzek et al. 2020): score each
    * document by its average negative log-likelihood under a unigram
    * language model estimated from the corpus itself, the classic
    * "perplexity gate" of the CCNet/LLaMA data pipeline (there the LM is
    * KenLM over Wikipedia; here the same decision shape with a
    * corpus-unigram model — the target-corpus LM plugs in by swapping the
    * vocab frame). Add-one smoothing over a top-`vocab` vocabulary;
    * out-of-vocabulary tokens take the unseen-mass probability
    * 1/(total + vocab + 1). Low avg-NLL = fluent/common text; high = junk
    * or rare-language — the gate keeps the middle band in production.
    *
    * Scale shape: one combiner-friendly groupBy(token) builds the LM; the
    * top-`vocab` cut is a TakeOrderedAndProject (ties break on the token
    * text); the tiny vocab broadcasts back onto the token stream; one
    * groupBy(doc) averages. The corpus never joins itself and never
    * shuffles anything wider than (doc_id, token).
    */
  def perplexityScores(spark: SparkSession, dir: String,
      vocab: Int = 20): DataFrame =
    perplexityScores(Tables.documents(spark, dir), vocab)

  /** DataFrame-parametric form — needs (doc_id, text). */
  def perplexityScores(documents: DataFrame, vocab: Int): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total"))
    val top = counts.orderBy(desc("cnt"), asc("tok")).limit(vocab)
    val lm = top.crossJoin(totals)
      .select(col("tok"),
        (-log((col("cnt") + 1.0) / (col("total") + vocab + 1.0))).as("nll"))
    toks.join(broadcast(lm), Seq("tok"), "left")
      .crossJoin(broadcast(totals.select(col("total").as("t2"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        round4(avg(coalesce(col("nll"),
          -log(lit(1.0) / (col("t2") + vocab + 1.0))))).as("avg_nll"),
        sum(when(col("nll").isNull, 1L).otherwise(0L)).as("n_oov"))
      .orderBy("doc_id")
  }

  val perplexityScoresSql: String =
    raw"""WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(
           lower(trim(text)), '\s+')) AS tok FROM documents),
       cnt AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
       tot AS (SELECT sum(cnt) AS total FROM cnt),
       top AS (SELECT tok, cnt FROM cnt ORDER BY cnt DESC, tok LIMIT 20),
       lm AS (SELECT tok, -ln((cnt + 1.0) / (total + 21.0)) AS nll
         FROM top, tot)
       SELECT tk.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         round(avg(coalesce(lm.nll, -ln(1.0 / (tot.total + 21.0)))) + 1e-9, 4) + 0.0
           AS avg_nll,
         CAST(sum(CASE WHEN lm.nll IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
       FROM tk LEFT JOIN lm ON lm.tok = tk.tok, tot
       GROUP BY tk.doc_id ORDER BY tk.doc_id"""

  /** Composed hygiene funnel with per-stage drop accounting: every document
    * is attributed to the FIRST stage that drops it (language gate →
    * quality floor → repetition cut → fingerprint dedup keep-first) or to
    * 'kept'. The funnel is how a production pipeline audits itself — per-
    * stage counts are the number a data engineer checks before and after
    * every recipe change, and attribution-to-first-failure makes the stage
    * counts sum exactly to the corpus (no double counting).
    *
    * Scale shape: all quality signals are stateless column expressions on
    * ONE scan; the only shuffle is the fingerprint window — the dedup
    * shuffle the pipeline pays anyway — plus the tiny stage aggregate. The
    * thresholds compare ROUNDED signals (round4 both engines) so stage
    * attribution can't flip on float noise.
    */
  def hygieneFunnel(spark: SparkSession, dir: String): DataFrame =
    hygieneFunnel(Tables.documents(spark, dir))

  /** Per-document stage attribution (the funnel's row form): adds `stage`
    * = first failing hygiene stage or 'kept'. Needs (doc_id, text); extra
    * columns pass through (the pipeline job keeps them on survivors).
    */
  def hygieneStaged(documents: DataFrame): DataFrame =
    hygieneStaged(documents, None)

  /** [[hygieneStaged]] with CROSS-BATCH dedup (r12, VERDICT r11 item 5):
    * `priorFingerprints` is a relation with an `fp` column holding the
    * fingerprints of content EMITTED by earlier pipeline batches. A row
    * that survives every within-batch stage drops as `e_cross_batch_dup`
    * when its fingerprint is already in the store. Attribution doctrine
    * preserved: within-batch twins keep `d_fingerprint_dup` (only the
    * within-batch keeper can be re-attributed), counts still sum to the
    * corpus, and empty-fingerprint rows never cross-batch dedup — an empty
    * fingerprint is not content identity, same as the within-batch rule.
    * Scale shape: one additional left join on the fingerprint key — the
    * same shuffle key the dedup window already uses; the store side is
    * distinct-projected to one narrow column.
    */
  def hygieneStaged(documents: DataFrame,
      priorFingerprints: Option[DataFrame]): DataFrame =
    stagedFromSignals(hygieneSignals(documents), priorFingerprints)

  /** The per-row hygiene signal frame: input columns plus `_pre` (first
    * failing pre-dedup stage or null), `_fp_raw` (the raw nullable
    * fingerprint, consumed by the cross-batch prior-store join) and `_fpk`
    * (the dedup key). All the
    * EXPENSIVE per-row work — langId, qualityScore, repetition fraction,
    * fingerprint — lives here, factored out so callers can materialize it
    * ONCE ([[hygieneStagedCheckpointed]]) instead of paying the expression
    * evaluation on both sides of the keeper join.
    */
  def hygieneSignals(documents: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{fingerprint, langId, qualityScore}
    val ws = tokens(col("text"))
    val dupfrac = when(size(ws) >= 2,
      round4((size(ws) - size(array_distinct(ws))).cast("double") / size(ws)))
      .otherwise(lit(0.0))
    documents
      .withColumn("_pre",
        when(langId(col("text")) =!= "en", "a_lang")
          .when(qualityScore(col("text")) < 0.5, "b_quality")
          .when(dupfrac > 0.65, "c_repetition"))
      // an EMPTY fingerprint (whitespace/punct-only text) is not content
      // identity: keying on it would mark all such docs mutual
      // duplicates AND concentrate them on one hot key at scale — fall
      // back to a per-doc key so they neither dedup nor skew.
      // `_fp_raw` (the nullable raw form) rides along for the cross-batch
      // prior-store join (r16, VERDICT r15 wrong#1): recomputing
      // fingerprint(text) there was one extra per-row regex+substring
      // pass per micro-batch — the exact double-eval class the r15
      // checkpoint work exists to close.
      .withColumn("_fp_raw", nullif(fingerprint(col("text")), lit("")))
      .withColumn("_fpk", coalesce(
        col("_fp_raw"), concat(lit("doc#"), col("doc_id"))))
  }

  /** [[hygieneStaged]] with the signal frame materialized ONCE (r15,
    * VERDICT r14 item 2): the keyed frame feeds BOTH the keeper aggregate
    * and the survivor join, so the lazy form evaluates every per-row
    * signal expression twice — one extra corpus scan, the pinned price of
    * the r14 keep-first skew fix. `localCheckpoint` on the signal frame
    * (the TextAnalysis shingle-table idiom) makes both consumers read the
    * materialized rows instead. Returns (staged, signalCheckpoint); the
    * caller MUST `graft.functions.releaseCheckpoint` the second frame
    * after its last action on the first (or after re-checkpointing a
    * derived frame, as CorpusPipelineJob does). On a real cluster the
    * same trade is parquet-out/parquet-back — fault-tolerant where a
    * local checkpoint is not.
    */
  def hygieneStagedCheckpointed(documents: DataFrame,
      priorFingerprints: Option[DataFrame]): (DataFrame, DataFrame) = {
    val signals = hygieneSignals(documents).localCheckpoint()
    (stagedFromSignals(signals, priorFingerprints), signals)
  }

  /** Keeper election + stage attribution over a [[hygieneSignals]] frame.
    *
    * The dedup keeper considers only SURVIVORS of the earlier stages:
    * ranking the whole corpus would let a dropped twin (same 320-char
    * fingerprint, junk tail) claim keep-first and eliminate BOTH copies
    * of the content.
    *
    * Keep-first is the aggregate+join idiom, NEVER a window partitioned
    * by the fingerprint: one boilerplate page duplicated 10^7-10^8x is a
    * single fingerprint key, and a running-sum window would funnel every
    * copy through ONE task (windows have no AQE skew remedy; the
    * Consolidation.connectedComponents doctrine). keeper = min(doc_id)
    * over survivor rows per fingerprint — a combiner-friendly hash
    * aggregate — joined back on the same shuffle key the window would
    * have used; the join side IS AQE-skew-splittable.
    */
  private def stagedFromSignals(keyed: DataFrame,
      priorFingerprints: Option[DataFrame]): DataFrame = {
    val keepers = keyed.filter(col("_pre").isNull)
      .groupBy(col("_fpk")).agg(min(col("doc_id")).as("_keep_id"))
    // a survivor row always finds its keeper (its group contains itself);
    // pre-dropped rows may miss (left join) but coalesce picks _pre first
    val staged = keyed
      .join(keepers, Seq("_fpk"), "left")
      .withColumn("stage", coalesce(col("_pre"),
        when(col("doc_id") === col("_keep_id"), "kept")
          .otherwise("d_fingerprint_dup")))
      .drop("_pre", "_fpk", "_keep_id")
    val out = priorFingerprints match {
      case None => staged
      case Some(store) =>
        // the prior-store join reads `_fp_raw` OFF THE SIGNAL FRAME — when
        // the caller checkpointed it (hygieneStagedCheckpointed), the
        // cross-batch branch costs one join, zero re-evaluated
        // fingerprints (r16; TextPolicySpec pins the plan fingerprint-free)
        val seen = store.select(col("fp").as("_seen_fp"))
          .filter(length(col("_seen_fp")) > 0).distinct()
        staged
          .join(seen, col("_fp_raw") === col("_seen_fp"), "left")
          .withColumn("stage",
            when(col("stage") === "kept" && col("_seen_fp").isNotNull,
              "e_cross_batch_dup").otherwise(col("stage")))
          .drop("_seen_fp")
    }
    out.drop("_fp_raw")
  }

  /** Funnel aggregation over a [[hygieneStaged]] frame — shared by the
    * oracle query and `jobs.CorpusPipelineJob` so their shapes cannot
    * drift.
    */
  def funnelOf(staged: DataFrame): DataFrame =
    staged
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
      .orderBy("stage")

  /** DataFrame-parametric form — needs (doc_id, text). Uses the
    * checkpointed signal frame so the funnel pays ONE evaluation of the
    * per-row signals (r15); the funnel itself is tiny (one row per stage)
    * so it eager-checkpoints and the corpus-size signal blocks release
    * before this returns.
    */
  def hygieneFunnel(documents: DataFrame): DataFrame = {
    val (staged, signals) = hygieneStagedCheckpointed(documents, None)
    val funnel = funnelOf(staged).localCheckpoint()
    graft.functions.releaseCheckpoint(signals)
    funnel
  }

  val hygieneFunnelSql: String = {
    val toks = raw"regexp_split_to_array(lower(trim(text)), '\s+')"
    s"""WITH h AS (SELECT doc_id, text,
         CAST(len(list_intersect(list_distinct($toks), ['the','and','of','is'])) AS INT) AS h_en,
         CAST(len(list_intersect(list_distinct($toks), ['el','la','de','que'])) AS INT) AS h_es,
         CAST(len(list_intersect(list_distinct($toks), ['der','die','und','das'])) AS INT) AS h_de,
         CAST(len(list_intersect(list_distinct($toks), ['le','les','et','une'])) AS INT) AS h_fr
       FROM documents),
       lang AS (SELECT doc_id,
         CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'unknown'
              WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
              WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
              WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
              ELSE 'fr' END AS lp FROM h),
       qual AS (SELECT doc_id,
         round(least(1.0, (CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len($toks) END) / 200.0) * 0.4
         + least(1.0, (CASE WHEN len($toks) = 0 THEN 0.0 ELSE len(list_filter($toks, t -> list_contains(['the','a','of','and','to','in','is'], t))) * 1.0 / len($toks) END) * 5.0) * 0.3
         + (1.0 - least(1.0, (CASE WHEN length(text) = 0 THEN 0.0 ELSE len(regexp_extract_all(text, '[.,;:!?]')) * 1.0 / length(text) END) * 10.0)) * 0.3 + 1e-9, 4) + 0.0 AS quality
       FROM documents),
       rep AS (SELECT doc_id,
         round((len($toks) - len(list_distinct($toks))) * 1.0 / len($toks) + 1e-9, 4) + 0.0 AS dupfrac
         FROM documents WHERE len($toks) >= 2),
       pre AS (SELECT d.doc_id,
           CASE WHEN lang.lp <> 'en' THEN 'a_lang'
                WHEN qual.quality < 0.5 THEN 'b_quality'
                WHEN coalesce(rep.dupfrac, 0) > 0.65 THEN 'c_repetition'
                END AS p,
           coalesce(nullif(
             substr(regexp_replace(lower(d.text), '[^a-z0-9]', '', 'g'),
               1, 320), ''), 'doc#' || d.doc_id) AS f
         FROM documents d JOIN lang USING (doc_id) JOIN qual USING (doc_id)
         LEFT JOIN rep USING (doc_id)),
       rk AS (SELECT doc_id, p,
           sum(CASE WHEN p IS NULL THEN 1 ELSE 0 END)
             OVER (PARTITION BY f ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             AS surv_rank
         FROM pre),
       staged AS (SELECT doc_id,
         coalesce(p, CASE WHEN surv_rank > 1 THEN 'd_fingerprint_dup'
                          ELSE 'kept' END) AS stage
         FROM rk)
       SELECT stage, count(*) AS n, min(doc_id) AS first_doc
       FROM staged GROUP BY 1 ORDER BY 1"""
  }

  /** Domains dropped by the URL policy gate (stand-in for the production
    * blocklists — spam/adult/SEO-farm lists in C4/RefinedWeb).
    */
  val BlockedDomains: Seq[String] = Seq("site0.com", "site3.com")

  /** URL canonicalization: lowercase scheme+host, strip the fragment and
    * tracking parameters (utm_*, gclid, fbclid), normalize leftover
    * separator debris. The standard pre-dedup URL cleanup of a web-scale
    * pipeline — without it the same page survives dedup under thousands of
    * tracking-tagged aliases. Pure chained regexp arithmetic in the
    * Java/RE2-common dialect (no lookaround), whole-stage codegen.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val host = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]+)", 1))
    val rest = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+(.*)", 1)
    // the tracking name is anchored to a ?/& param boundary (an unanchored
    // pattern matches INSIDE longer names: '?easygclid=keep' would lose
    // 'gclid=keep' and fabricate '?easy'); the match is case-insensitive
    // with underscores allowed in the name (UTM_SOURCE and GA4-style
    // utm_source_platform are real-web aliases that would otherwise defeat
    // URL dedup); the separator is kept via $1 and the debris pass
    // collapses the leftover runs (&&, ?&, trailing ?/&)
    val stripped = regexp_replace(rest,
      "([?&])(?i:utm_[a-z_]+|gclid|fbclid)=[^&#]*", "$1")
    val cleaned = regexp_replace(regexp_replace(regexp_replace(stripped,
      "&&+", "&"), "\\?&", "?"), "[?&]$", "")
    // scheme-less/malformed input passes through UNCHANGED: all three
    // extracts return '' on it, so the canonical would collapse to '://'
    // and urlDomain to '' — silently whitelisting every blocklisted page
    // whose url column is relative or junk
    when(url.rlike("^[A-Za-z]+://"),
      concat(scheme, lit("://"), host, cleaned)).otherwise(url)
  }

  /** Registrable domain of a canonicalized URL (www. stripped). */
  def urlDomain(canonical: Column): Column =
    regexp_replace(regexp_extract(canonical, "^[a-z]+://([^/?#]+)", 1),
      "^www\\.", "")

  /** Oracle query: deterministic URLs are injected per doc (mixed-case
    * scheme/host, tracking params, fragments — identically in the SQL
    * mirror), then canonicalized and policy-checked. `ref=kept` proves
    * non-tracking params survive the strip.
    */
  def urlCanonical(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val raw = concat(
      when(d % 4 === 0, "HTTPS").otherwise("https"), lit("://"),
      when(d % 5 === 0, "WWW.").otherwise("www."),
      lit("Site"), (d % 7).cast("string"), lit(".COM/page/"),
      (d % 50).cast("string"),
      when(d % 2 === 0, "?utm_source=feed&utm_campaign=x&ref=kept")
        .otherwise(""),
      when(d % 3 === 0, "#frag").otherwise(""))
    Tables.documents(spark, dir)
      .select(d, raw.as("url"))
      .select(d, canonicalizeUrl(col("url")).as("canonical"),
        col("url").rlike("utm_|gclid|fbclid").as("had_tracking"))
      .withColumn("domain", urlDomain(col("canonical")))
      .withColumn("blocked", col("domain").isin(BlockedDomains: _*))
      .select(d, col("canonical"), col("domain"), col("had_tracking"),
        col("blocked"))
      .orderBy("doc_id")
  }

  val urlCanonicalSql: String = {
    val inject = "(CASE WHEN doc_id % 4 = 0 THEN 'HTTPS' ELSE 'https' END) " +
      "|| '://' || (CASE WHEN doc_id % 5 = 0 THEN 'WWW.' ELSE 'www.' END) " +
      "|| 'Site' || (doc_id % 7) || '.COM/page/' || (doc_id % 50) " +
      "|| (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_campaign=x&ref=kept' ELSE '' END) " +
      "|| (CASE WHEN doc_id % 3 = 0 THEN '#frag' ELSE '' END)"
    s"""WITH u AS (SELECT doc_id, $inject AS url FROM documents),
       p AS (SELECT doc_id, url, regexp_replace(url, '#.*', '') AS nf FROM u),
       c AS (SELECT doc_id, url,
           CASE WHEN regexp_matches(url, '^[A-Za-z]+://') THEN
           lower(regexp_extract(nf, '^([A-Za-z]+)://', 1)) || '://' ||
           lower(regexp_extract(nf, '^[A-Za-z]+://([^/?#]+)', 1)) ||
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_extract(nf, '^[A-Za-z]+://[^/?#]+(.*)', 1),
             '([?&])(?i:utm_[a-z_]+|gclid|fbclid)=[^&#]*', '\\1', 'g'),
             '&&+', '&', 'g'), '\\?&', '?'), '[?&]$$', '') ELSE url
           END AS canonical
         FROM p),
       d AS (SELECT doc_id, canonical,
           regexp_replace(regexp_extract(canonical, '^[a-z]+://([^/?#]+)', 1),
             '^www\\.', '') AS domain,
           regexp_matches(url, 'utm_|gclid|fbclid') AS had_tracking
         FROM c)
       SELECT doc_id, canonical, domain, had_tracking,
         domain IN ('site0.com', 'site3.com') AS blocked
       FROM d ORDER BY doc_id"""
  }

  val boilerplateFlagsSql: String =
    raw"""WITH t AS (SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS tk
       FROM documents),
       pos AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
         FROM t WHERE len(tk) >= 3),
       sh AS (SELECT DISTINCT doc_id,
           tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh FROM pos),
       top AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM sh
         GROUP BY 1 ORDER BY df DESC, sh ASC LIMIT 15),
       pd AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN tp.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler
         FROM sh s LEFT JOIN top tp ON tp.sh = s.sh GROUP BY 1),
       cov AS (SELECT d.doc_id,
           coalesce(pd.n_shingles, 0) AS n_shingles,
           coalesce(pd.n_boiler, 0) AS n_boiler,
           round(CASE WHEN coalesce(pd.n_shingles, 0) = 0 THEN 0.0
             ELSE pd.n_boiler * 1.0 / pd.n_shingles END + 1e-9, 4) + 0.0 AS coverage
         FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id)
       SELECT doc_id, n_shingles, n_boiler, coverage, coverage > 0.5 AS flagged
       FROM cov ORDER BY doc_id"""

  /** The Gopher required-stopword set (Rae et al. 2021, Appendix A1.1.2):
    * a kept document must contain at least 2 of these.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality rules (Rae et al. 2021, Appendix A — the
    * MassiveWeb filter most modern pretraining pipelines copy), plus the
    * two C4 page-level drops (Raffel et al. 2020 §2.2: "lorem ipsum" and
    * the curly-brace/code marker). Doc-level rules only — the Gopher
    * line-fraction rules (bullet/ellipsis lines) need multi-line pages and
    * this corpus is single-line; symbol-to-word covers the ellipsis mass.
    *
    * Emits every signal plus per-rule attribution: the first violated rule
    * in canonical order (word_count, mean_word_len, symbol_ratio,
    * alpha_words, stopwords, lorem, brace) — a pipeline wants to know WHY
    * a document dropped, not just that it did. Pure codegen projection:
    * one scan, no shuffle (ORDER BY is presentation for the oracle).
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRules(Tables.documents(spark, dir))

  def gopherRules(documents: DataFrame): DataFrame = {
    val ws = tokens(col("text"))
    val nWords = size(ws).cast("long")
    val denom = greatest(nWords, lit(1L))
    val meanLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / denom
    def charCount(needle: String, width: Int): Column =
      ((length(col("text")) -
        length(regexp_replace(col("text"), needle, ""))) / width).cast("long")
    // Gopher's symbol set: '#' and ellipsis (both the unicode char and
    // the three-dot spelling)
    val symbols = charCount("#", 1) + charCount("…", 1) +
      charCount("\\.\\.\\.", 3)
    val symbolRatio = symbols.cast("double") / denom
    val alphaFrac = aggregate(ws, lit(0L),
      (acc, w) => acc + when(w.rlike("[a-z]"), 1L).otherwise(0L))
      .cast("double") / denom
    val stopHits = size(filter(
      typedlit(GopherStopwords), s => array_contains(ws, s))).cast("long")
    val lowerText = lower(col("text"))
    documents
      .select(col("doc_id"),
        nWords.as("n_words"),
        round4(meanLen).as("mean_word_len"),
        round4(symbolRatio).as("symbol_ratio"),
        round4(alphaFrac).as("alpha_frac"),
        stopHits.as("stop_hits"),
        (nWords < 50 || nWords > 100000).as("r_word_count"),
        (meanLen < 3.0 || meanLen > 10.0).as("r_mean_word_len"),
        (symbolRatio > 0.1).as("r_symbol_ratio"),
        (alphaFrac < 0.8).as("r_alpha_words"),
        (stopHits < 2).as("r_stopwords"),
        lowerText.contains("lorem ipsum").as("r_lorem"),
        lowerText.contains("{").as("r_brace"))
      .withColumn("first_violation",
        when(col("r_word_count"), "word_count")
          .when(col("r_mean_word_len"), "mean_word_len")
          .when(col("r_symbol_ratio"), "symbol_ratio")
          .when(col("r_alpha_words"), "alpha_words")
          .when(col("r_stopwords"), "stopwords")
          .when(col("r_lorem"), "lorem")
          .when(col("r_brace"), "brace")
          .otherwise("kept"))
      .withColumn("keep", col("first_violation") === "kept")
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[gopherRules]]. */
  val gopherRulesSql: String = {
    val stops = GopherStopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    raw"""WITH t AS (SELECT doc_id, lower(trim(text)) AS lt,
         regexp_split_to_array(lower(trim(text)), '\s+') AS tk
       FROM documents),
       sig AS (SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_words,
         round(list_aggregate(list_transform(tk, w -> length(w)), 'sum')
           * 1.0 / greatest(len(tk), 1) + 1e-9, 4) + 0.0 AS mean_word_len,
         round(((length(lt) - length(replace(lt, '#', ''))) +
             (length(lt) - length(replace(lt, '…', ''))) +
             (length(lt) - length(replace(lt, '...', ''))) / 3)
           * 1.0 / greatest(len(tk), 1) + 1e-9, 4) + 0.0 AS symbol_ratio,
         round(len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
           * 1.0 / greatest(len(tk), 1) + 1e-9, 4) + 0.0 AS alpha_frac,
         CAST(len(list_filter($stops::VARCHAR[],
             s -> list_contains(tk, s))) AS BIGINT) AS stop_hits,
         contains(lt, 'lorem ipsum') AS r_lorem,
         contains(lt, '{') AS r_brace,
         list_aggregate(list_transform(tk, w -> length(w)), 'sum')
           * 1.0 / greatest(len(tk), 1) AS raw_mean,
         ((length(lt) - length(replace(lt, '#', ''))) +
             (length(lt) - length(replace(lt, '…', ''))) +
             (length(lt) - length(replace(lt, '...', ''))) / 3)
           * 1.0 / greatest(len(tk), 1) AS raw_sym,
         len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
           * 1.0 / greatest(len(tk), 1) AS raw_alpha
       FROM t),
       f AS (SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
         stop_hits,
         (n_words < 50 OR n_words > 100000) AS r_word_count,
         (raw_mean < 3.0 OR raw_mean > 10.0) AS r_mean_word_len,
         (raw_sym > 0.1) AS r_symbol_ratio,
         (raw_alpha < 0.8) AS r_alpha_words,
         (stop_hits < 2) AS r_stopwords, r_lorem, r_brace
       FROM sig)
       SELECT *, first_violation = 'kept' AS keep FROM (
         SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
           stop_hits, r_word_count, r_mean_word_len, r_symbol_ratio,
           r_alpha_words, r_stopwords, r_lorem, r_brace,
           CASE WHEN r_word_count THEN 'word_count'
             WHEN r_mean_word_len THEN 'mean_word_len'
             WHEN r_symbol_ratio THEN 'symbol_ratio'
             WHEN r_alpha_words THEN 'alpha_words'
             WHEN r_stopwords THEN 'stopwords'
             WHEN r_lorem THEN 'lorem'
             WHEN r_brace THEN 'brace'
             ELSE 'kept' END AS first_violation
         FROM f) v ORDER BY doc_id"""
  }

  /** GPT-3-style trained quality classifier with Pareto-threshold document
    * sampling (Brown et al. 2020, Appendix A; the same curated-vs-crawl
    * discriminator filters LLaMA's CommonCrawl, Touvron et al. 2023 §2).
    * Train: multinomial Naive Bayes over whitespace tokens, positives =
    * documents from the `positiveSources` (curated corpora), negatives =
    * the rest; add-one smoothing. Score: mean per-token log-odds, so the
    * decision boundary sits at 0 regardless of document length. Keep rule:
    * GPT-3 keeps a page when `score > threshold - pareto(alpha)`; the
    * noise lets a tail of below-boundary pages through so the filtered
    * corpus is not a hard cliff at the classifier boundary. Here the
    * threshold is the NB boundary (0) and the Pareto draw is DETERMINISTIC
    * — `u = md5("qc" || doc_id) / 1e6`, `pareto = (1-u)^(-1/alpha) - 1` —
    * so the op is replayable and oracle-checkable.
    *
    * Determinism (the DSIR lesson, r9): token weights are quantized to
    * integer MICRO-units (`round(w*1e6 + 1e-3)` as long), so the per-doc
    * accumulation is exact integer arithmetic — associative and
    * commutative under any partition-merge order — and the keep compare is
    * LONG vs LONG (`llr_u > -pareto_u * n_tokens`), never float vs float.
    * The only float ops left are two divisions and round4 on exact integer
    * inputs, plus the quantizations themselves, whose +1e-3 nudge keeps a
    * 1-ulp cross-engine `ln`/`pow` difference from straddling a .5 tie.
    *
    * Scale shape: one explode pass; the per-doc-token aggregate is
    * combiner-friendly and is consumed TWICE (vocabulary build + scoring
    * join) via ReusedExchange — left join, like DSIR, so the inferred
    * isnotnull filter cannot un-canonicalize the shared aggregate. The
    * weight table is VOCABULARY-sized (unlike DSIR's fixed-bucket table):
    * at these SFs it broadcasts via AQE; at 100 TB whitespace vocabulary
    * is unbounded, so either the scoring join becomes a shuffle join on
    * the token — still linear — or pass `hashBuckets = Some(n)` for the
    * FEATURE-HASHED form (the hashing trick, Weinberger et al. 2009 ICML;
    * the DSIR bucketed idiom): tokens map to `xxhash64 mod n` buckets, the
    * weight table is bounded at n rows and ALWAYS broadcasts, at the cost
    * of hash-collision noise in the weights. Kept-set agreement vs the
    * exact form is spec-measured at sf0.01 and probe-measured at 100k
    * docs (QualityScaleSpec / PipelineScaleProbe `quality_clf_hN`). No
    * stage is more than linear in the corpus either way.
    */
  def qualityClassifier(spark: SparkSession, dir: String,
      positiveSources: Seq[String] = Seq("src0", "src1", "src2"),
      alpha: Double = 9.0): DataFrame =
    qualityClassifier(Tables.documents(spark, dir), positiveSources, alpha)

  /** DataFrame-parametric form — needs (doc_id, source, text). Exact
    * vocabulary — the oracle-gated default.
    */
  def qualityClassifier(documents: DataFrame, positiveSources: Seq[String],
      alpha: Double): DataFrame =
    qualityClassifierImpl(documents, positiveSources, alpha, None)

  /** At-scale feature-hashed form (the hashing trick): tokens map to
    * `xxhash64 mod buckets` features, bounding the weight table at
    * `buckets` rows so it always broadcasts regardless of corpus
    * vocabulary, at the cost of collision noise in the weights.
    */
  def qualityClassifierHashed(documents: DataFrame,
      positiveSources: Seq[String], alpha: Double, buckets: Int): DataFrame =
    qualityClassifierImpl(documents, positiveSources, alpha, Some(buckets))

  private def qualityClassifierImpl(documents: DataFrame,
      positiveSources: Seq[String], alpha: Double,
      hashBuckets: Option[Int]): DataFrame = {
    val dtc = docTokenCounts(documents, positiveSources, hashBuckets)
    scoreFromDtc(dtc, weightsFromDtc(dtc), alpha)
  }

  /** Per-(doc, class-flag, feature) counts — the shared first pass. A
    * generator must sit top-level in its select; the hashed feature maps
    * the exploded token in a second projection.
    */
  private def docTokenCounts(documents: DataFrame,
      positiveSources: Seq[String], hashBuckets: Option[Int]): DataFrame = {
    val exploded = documents
      .select(col("doc_id"),
        col("source").isInCollection(positiveSources).as("pos"),
        explode(tokens(col("text"))).as("tok"))
    val feature = hashBuckets match {
      case Some(n) => pmod(xxhash64(col("tok")), lit(n.toLong))
      case None => col("tok")
    }
    exploded
      .select(col("doc_id"), col("pos"), feature.as("w"))
      .groupBy(col("doc_id"), col("pos"), col("w"))
      .agg(count(lit(1)).as("cnt"))
  }

  private def weightsFromDtc(dtc: DataFrame): DataFrame = {
    val vocab = dtc.groupBy(col("w")).agg(
      sum(when(col("pos"), col("cnt")).otherwise(0L)).as("p_cnt"),
      sum(when(!col("pos"), col("cnt")).otherwise(0L)).as("n_cnt"))
    // Totals via a 1-row combiner aggregate broadcast back onto the vocab —
    // NOT a global window: the vocabulary is unbounded (unlike DSIR's
    // <=64-row bucket table), and Window.partitionBy() would funnel every
    // vocab row through a single partition.
    val tot = vocab.agg(sum(col("p_cnt")).as("pt"), sum(col("n_cnt")).as("nt"),
      count(lit(1)).as("v"))
    vocab.crossJoin(broadcast(tot))
      .select(col("w"),
        round((log((col("p_cnt") + 1.0) / (col("pt") + col("v"))) -
          log((col("n_cnt") + 1.0) / (col("nt") + col("v")))) * 1e6 + 1e-3)
          .cast("long").as("w_u"))
  }

  private def scoreFromDtc(dtc: DataFrame, weights: DataFrame,
      alpha: Double): DataFrame =
    dtc.join(weights, Seq("w"), "left")
      .groupBy(col("doc_id"))
      // coalesce is a no-op in batch mode (every token is in the
      // vocabulary by construction) but gives FROZEN-weight apply its
      // unseen-token semantics: weight 0, neutral
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * coalesce(col("w_u"), lit(0L))).as("llr_u"))
      .withColumn("pareto_u",
        round((pow(lit(1.0) -
            md5Bucket("qc", col("doc_id"), 1000000).cast("double") / 1e6,
          lit(-1.0 / alpha)) - 1.0) * 1e6 + 1e-3).cast("long"))
      .select(col("doc_id"), col("n_tokens"),
        round4(col("llr_u") / 1e6 / col("n_tokens")).as("score"),
        round4(col("pareto_u") / lit(1e6)).as("pareto"),
        (col("llr_u") > -col("pareto_u") * col("n_tokens")).as("keep"))
      .orderBy("doc_id")

  /** TRAIN half of the classifier, exposed for freeze-and-apply
    * deployments (the streaming selection twin): the (w, w_u) micro-long
    * NB weight table over this corpus.
    */
  def qualityClassifierWeights(documents: DataFrame,
      positiveSources: Seq[String]): DataFrame =
    weightsFromDtc(docTokenCounts(documents, positiveSources, None))

  /** APPLY half: score documents under a FROZEN weight table (trained
    * elsewhere — an earlier batch, a curated reference corpus). Tokens
    * absent from the table contribute 0 (neutral); everything else is the
    * batch form verbatim, so applying a corpus's own weights reproduces
    * [[qualityClassifier]] exactly.
    */
  def qualityClassifierApply(documents: DataFrame,
      positiveSources: Seq[String], weights: DataFrame,
      alpha: Double): DataFrame =
    scoreFromDtc(docTokenCounts(documents, positiveSources, None), weights,
      alpha)

  /** DuckDB mirror of [[qualityClassifier]] at the default knobs. */
  val qualityClassifierSql: String =
    raw"""WITH t AS (SELECT doc_id,
         CASE WHEN source IN ('src0', 'src1', 'src2') THEN 1 ELSE 0 END AS pos,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
       dtc AS (SELECT doc_id, pos, unnest(ws) AS w FROM t),
       dc AS (SELECT doc_id, pos, w, count(*) AS cnt FROM dtc GROUP BY 1, 2, 3),
       voc AS (SELECT w,
           sum(CASE WHEN pos = 1 THEN cnt ELSE 0 END) AS p_cnt,
           sum(CASE WHEN pos = 0 THEN cnt ELSE 0 END) AS n_cnt
         FROM dc GROUP BY 1),
       tot AS (SELECT sum(p_cnt) AS pt, sum(n_cnt) AS nt, count(*) AS v
         FROM voc),
       wt AS (SELECT w, CAST(round(
           (ln((p_cnt + 1.0) / (pt + v)) - ln((n_cnt + 1.0) / (nt + v)))
           * 1e6 + 1e-3) AS BIGINT) AS w_u FROM voc, tot),
       sc AS (SELECT d.doc_id, CAST(sum(d.cnt) AS BIGINT) AS n_tokens,
           CAST(sum(d.cnt * w.w_u) AS BIGINT) AS llr_u
         FROM dc d JOIN wt w ON w.w = d.w GROUP BY 1),
       pu AS (SELECT doc_id, n_tokens, llr_u, CAST(round(
           (pow(1.0 - (('0x' || substr(md5('qc' || CAST(doc_id AS VARCHAR)),
             1, 15))::BIGINT % 1000000) / 1e6, -1.0 / 9.0) - 1.0)
           * 1e6 + 1e-3) AS BIGINT) AS pareto_u FROM sc)
       SELECT doc_id, n_tokens,
         round(CAST(llr_u AS DOUBLE) / 1e6 / n_tokens + 1e-9, 4) + 0.0
           AS score,
         round(CAST(pareto_u AS DOUBLE) / 1e6 + 1e-9, 4) + 0.0 AS pareto,
         llr_u > -pareto_u * n_tokens AS keep
       FROM pu ORDER BY doc_id"""

  /** A trained bigram language model's tables — the CCNet deployment
    * shape (Wenzek et al. 2019 "CCNet": the crawl is filtered by the
    * perplexity of an LM trained on a BOUNDED curated reference corpus —
    * Wikipedia — so the model tables are reference-sized, never
    * crawl-sized). `uni` is (w, c1), `bi` is (w1, w2, c12), `tv` is the
    * one-row (t, v) totals relation kept in-plan for a broadcast cross
    * join.
    */
  final case class BigramLm(uni: DataFrame, bi: DataFrame, tv: DataFrame)

  /** TRAIN half of the bigram-perplexity filter: unigram/bigram counts
    * over the reference corpus — two combiner aggregates off one
    * position-explode. Needs (doc_id, text).
    */
  def bigramLmTrain(ref: DataFrame): BigramLm = {
    val toks = ref.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "w")))
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bi = toks.withColumn("w2", lead(col("w"), 1).over(wd))
      .filter(col("w2").isNotNull)
      .select(col("w").as("w1"), col("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val tv = uni.agg(sum(col("c1")).as("t"), count(lit(1)).as("v"))
    BigramLm(uni, bi, tv)
  }

  /** APPLY half — per-document bigram negative log-likelihood under a
    * FROZEN [[BigramLm]], the CCNet-style quality signal (low nll = fluent
    * reference-like text; high = noise/serial numbers/boilerplate code).
    * Each bigram scores `ln((c12 + a*pu(w2)) / (c1 + a))` — interpolated
    * add-`a` smoothing with an add-one unigram backoff `pu(w2) =
    * (c2+1)/(T+V)`; an OOV context (c1 = 0) degrades to ln(pu(w2)) + the
    * smoothing constant, never a hole. Documents under two tokens emit
    * n_bigrams 0 / nll 0.0 (neutral).
    *
    * Determinism: one `ln` per bigram quantized to micro-longs
    * (`round(term*1e6 + 1e-3)`), per-doc accumulation exact integer, one
    * final division + round4 — the qualityClassifier doctrine, mirrored
    * token-for-token in the oracle.
    *
    * Scale shape: the CCNet premise makes `uni`/`bi` reference-bounded,
    * so apply is ONE corpus explode + three linear joins on token keys
    * (broadcast when the reference is small; shuffle joins — still
    * linear, AQE-skew-splittable — when not) + a combiner per-doc
    * aggregate. No window touches a corpus-scale group (the per-doc lead
    * window is bounded by document length).
    */
  def bigramPerplexity(docs: DataFrame, lm: BigramLm,
      a: Double = 1.0): DataFrame = {
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val db = docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      .withColumn("w2", lead(col("w"), 1).over(wd))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w").as("w1"), col("w2"))
    val terms = db
      .join(lm.bi, Seq("w1", "w2"), "left")
      .join(lm.uni.select(col("w").as("w1"), col("c1")), Seq("w1"), "left")
      .join(lm.uni.select(col("w").as("w2"), col("c1").as("c2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(lm.tv))
      .select(col("doc_id"),
        round(log(
          (coalesce(col("c12"), lit(0L)) +
            lit(a) * (coalesce(col("c2"), lit(0L)) + 1.0) /
              (col("t") + col("v"))) /
            (coalesce(col("c1"), lit(0L)) + lit(a)))
          * 1e6 + 1e-3).cast("long").as("term_u"))
    val perDoc = terms.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("term_u")).as("s_u"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNull, lit(0.0))
          .otherwise(round4(-(col("s_u") / 1e6) / col("n_bigrams")))
          .as("nll"))
      .orderBy("doc_id")
  }

  /** Oracle composition: train on the corpus's `lang = 'en'` slice (the
    * bounded curated-reference stand-in), score every document.
    */
  def bigramLmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    bigramPerplexity(docs, bigramLmTrain(docs.filter(col("lang") === "en")))
  }

  /** DuckDB mirror of [[bigramLmScore]] (a = 1.0). */
  val bigramLmScoreSql: String = {
    val toks = raw"regexp_split_to_array(lower(trim(text)), '\s+')"
    raw"""WITH ref AS (SELECT doc_id, $toks AS tk FROM documents
           WHERE lang = 'en'),
       runi AS (SELECT unnest(tk) AS w FROM ref),
       uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM runi
         GROUP BY 1),
       tv AS (SELECT CAST(sum(c1) AS BIGINT) AS t,
           CAST(count(*) AS BIGINT) AS v FROM uni),
       rbi AS (SELECT tk[i] AS w1, tk[i+1] AS w2 FROM ref,
           unnest(range(1, len(tk))) AS r(i) WHERE len(tk) >= 2),
       bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM rbi
         GROUP BY 1, 2),
       d AS (SELECT doc_id, $toks AS tk FROM documents),
       db AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2 FROM d,
           unnest(range(1, len(tk))) AS r(i) WHERE len(tk) >= 2),
       terms AS (SELECT db.doc_id, CAST(round(ln(
             (coalesce(bi.c12, 0) + 1.0 * (coalesce(u2.c1, 0) + 1.0)
               / (tv.t + tv.v)) / (coalesce(u1.c1, 0) + 1.0))
           * 1e6 + 1e-3) AS BIGINT) AS term_u
         FROM db
         LEFT JOIN bi ON bi.w1 = db.w1 AND bi.w2 = db.w2
         LEFT JOIN uni u1 ON u1.w = db.w1
         LEFT JOIN uni u2 ON u2.w = db.w2
         CROSS JOIN tv),
       pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(term_u) AS BIGINT) AS s_u FROM terms GROUP BY 1)
       SELECT d.doc_id,
         coalesce(pd.n_bigrams, 0) AS n_bigrams,
         CASE WHEN pd.n_bigrams IS NULL THEN 0.0
           ELSE round(-(CAST(s_u AS DOUBLE) / 1e6) / pd.n_bigrams
             + 1e-9, 4) + 0.0 END AS nll
       FROM (SELECT doc_id FROM documents) d LEFT JOIN pd USING (doc_id)
       ORDER BY doc_id"""
  }

  /** Rank-based ROC AUC of the quality classifier's score against its
    * curated-vs-crawl labels — the evaluation number a filter deployment
    * reads before trusting a threshold (Mann-Whitney U form with exact
    * average-rank tie handling, so massed identical scores are graded
    * fairly rather than by arrival order).
    *
    * Exact integer arithmetic throughout: ranks are accumulated in
    * HALF-units (avgRank*2 = 2*count_below + n + 1 — always integral), so
    * AUC = (S2 - P*(P+1)) / (2*P*N) has an all-long numerator and one
    * final division. All-tied scores give exactly 0.5 by construction.
    *
    * Scale shape: one combiner aggregate per distinct score, then a
    * prefix window over the DISTINCT-SCORE relation — whose size is
    * bounded by the round4 quantization domain (score range / 1e-4, e.g.
    * ~2*10^5 rows for mean-log-odds in [-10, 10]), independent of corpus
    * size; the same bounded-value-domain argument as the per-bucket
    * prefixes in largestGap/saltedSourceCumsum. Final AUC is a one-row
    * aggregate.
    */
  def classifierAuc(spark: SparkSession, dir: String,
      positiveSources: Seq[String] = Seq("src0", "src1", "src2"),
      alpha: Double = 9.0): DataFrame =
    classifierAuc(Tables.documents(spark, dir), positiveSources, alpha)

  /** DataFrame-parametric form — needs (doc_id, source, text). */
  def classifierAuc(documents: DataFrame, positiveSources: Seq[String],
      alpha: Double): DataFrame =
    classifierAucFromTokens(documents.select(col("doc_id"),
      col("source").isInCollection(positiveSources).as("pos"),
      explode(tokens(col("text"))).as("tok")), alpha)

  /** [[classifierAuc]] from an existing (doc_id, pos, tok) explode — the
    * `FromTokens` composition point (r15): CorpusReportJob scores and
    * grades the classifier off its one tokenize pass.
    *
    * Contract (r15, ADVICE r14): a single-class corpus — every doc
    * positive or every doc negative — emits `auc = null` with the class
    * counts still populated; Mann-Whitney AUC is undefined without both
    * classes, and the previous 0/0 division surfaced as an
    * indistinguishable NaN/null with no documented meaning.
    */
  def classifierAucFromTokens(docToks: DataFrame, alpha: Double)
      : DataFrame = {
    val dtc = docToks.select(col("doc_id"), col("pos"), col("tok").as("w"))
      .groupBy(col("doc_id"), col("pos"), col("w"))
      .agg(count(lit(1)).as("cnt"))
    val scored = scoreFromDtc(dtc, weightsFromDtc(dtc), alpha)
      .join(docToks.select(col("doc_id"), col("pos")).distinct(),
        Seq("doc_id"))
      .select(col("score"), col("pos").cast("long").as("pos"))
    val g = scored.groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("npos"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("below", coalesce(sum(col("n")).over(w), lit(0L)))
      // 2*avgRank of the tied group = 2*below + n + 1 (integral)
      .select((col("npos") * (lit(2L) * col("below") + col("n") + 1L))
          .as("s2"),
        col("n"), col("npos"))
      .agg(sum(col("s2")).as("s2"), sum(col("npos")).as("p"),
        sum(col("n") - col("npos")).as("ng"))
      .select(col("p").as("n_pos"), col("ng").as("n_neg"),
        when(col("p") === 0L || col("ng") === 0L,
          lit(null).cast("double"))
          .otherwise(
            round4((col("s2") - col("p") * (col("p") + 1L)).cast("double") /
              (lit(2.0) * col("p") * col("ng")))).as("auc"))
  }

  /** DuckDB mirror of [[classifierAuc]] at the default knobs — the score
    * CTE chain is [[qualityClassifierSql]]'s verbatim.
    */
  val classifierAucSql: String = {
    val toks = raw"regexp_split_to_array(lower(trim(text)), '\s+')"
    raw"""WITH t AS (SELECT doc_id, source,
         CASE WHEN source IN ('src0', 'src1', 'src2') THEN 1 ELSE 0 END
           AS pos, $toks AS ws FROM documents),
       dtc AS (SELECT doc_id, pos, unnest(ws) AS w FROM t),
       dc AS (SELECT doc_id, pos, w, count(*) AS cnt FROM dtc
         GROUP BY 1, 2, 3),
       voc AS (SELECT w,
           sum(CASE WHEN pos = 1 THEN cnt ELSE 0 END) AS p_cnt,
           sum(CASE WHEN pos = 0 THEN cnt ELSE 0 END) AS n_cnt
         FROM dc GROUP BY 1),
       tot AS (SELECT sum(p_cnt) AS pt, sum(n_cnt) AS nt, count(*) AS v
         FROM voc),
       wt AS (SELECT w, CAST(round(
           (ln((p_cnt + 1.0) / (pt + v)) - ln((n_cnt + 1.0) / (nt + v)))
           * 1e6 + 1e-3) AS BIGINT) AS w_u FROM voc, tot),
       sc AS (SELECT d.doc_id, CAST(sum(d.cnt) AS BIGINT) AS n_tokens,
           CAST(sum(d.cnt * w.w_u) AS BIGINT) AS llr_u
         FROM dc d JOIN wt w ON w.w = d.w GROUP BY 1),
       scored AS (SELECT
           round(CAST(llr_u AS DOUBLE) / 1e6 / n_tokens + 1e-9, 4) + 0.0
             AS score,
           t.pos
         FROM sc JOIN t ON t.doc_id = sc.doc_id),
       g AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS npos FROM scored GROUP BY 1),
       r AS (SELECT npos, n,
           CAST(coalesce(sum(n) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS below FROM g),
       acc AS (SELECT CAST(sum(npos * (2 * below + n + 1)) AS BIGINT) AS s2,
           CAST(sum(npos) AS BIGINT) AS p,
           CAST(sum(n - npos) AS BIGINT) AS ng FROM r)
       SELECT p AS n_pos, ng AS n_neg,
         CASE WHEN p = 0 OR ng = 0 THEN NULL
           ELSE round(CAST(s2 - p * (p + 1) AS DOUBLE) / (2.0 * p * ng)
             + 1e-9, 4) + 0.0 END AS auc
       FROM acc"""
  }
}
