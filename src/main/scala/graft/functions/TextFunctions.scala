package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders: tokenization, fingerprinting, language-ID,
  * quality scoring, keyword scoring, MinHash signatures. All pure
  * `org.apache.spark.sql.functions` compositions (whole-stage codegen), no
  * UDFs. Reference semantics: keyword extraction/scoring
  * `/root/reference/automem/utils/text.py:81-101` +
  * `automem/search/runtime_recall_helpers.py:595-724`; content fingerprint
  * `automem/api/recall.py:310-323`; tag-prefix expansion
  * `automem/utils/tags.py:23-48`.
  */
object TextFunctions {

  /** Lowercased whitespace tokens of trimmed text. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Deterministic uniform bucket in [0, mod) from a salted md5 of `c` —
    * the ONE portable coin behind train/val/test splitting, mixture
    * sampling, and the streaming hygiene twin (DuckDB mirror:
    * `('0x' || substr(md5(salt || CAST(c AS VARCHAR)), 1, 15))::BIGINT
    * % mod`). A single definition so batch and streaming flags can never
    * drift.
    */
  def md5Bucket(salt: String, c: Column, mod: Int): Column =
    pmod(conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(mod))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish token count: letter runs, single digits, and single
    * non-alphanumeric glyphs each count as one token.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** ASCII-fold diacritics (reference normalize,
    * `runtime_recall_helpers.py:123-144`): accented latin chars map to their
    * base letter before matching.
    */
  def asciiFold(text: Column): Column =
    translate(text,
      "\u00e1\u00e0\u00e2\u00e4\u00e3\u00e5\u00e7\u00e9\u00e8\u00ea\u00eb\u00ed\u00ec\u00ee\u00ef\u00f1\u00f3\u00f2\u00f4\u00f6\u00f5\u00fa\u00f9\u00fb\u00fc\u00fd\u00ff\u00c1\u00c0\u00c2\u00c4\u00c3\u00c5\u00c7\u00c9\u00c8\u00ca\u00cb\u00cd\u00cc\u00ce\u00cf\u00d1\u00d3\u00d2\u00d4\u00d6\u00d5\u00da\u00d9\u00db\u00dc\u00dd",
      "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY")

  /** Normalized content fingerprint: lowercase, strip non-alphanumerics, first
    * `n` chars (reference uses 320, `recall.py:310-323`).
    */
  def fingerprint(text: Column, n: Int = 320): Column =
    substring(regexp_replace(lower(text), "[^a-z0-9]", ""), 1, n)

  /** Count of sentence punctuation characters. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,;:!?]"))

  private val StopwordsSeq = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Number of tokens that are english stopwords (not distinct — each
    * occurrence counts).
    */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(StopwordsSeq: _*)))

  /** Heuristic document quality score in [0,1]:
    * 0.4 * min(1, tokens/200) + 0.3 * min(1, 5*stopRatio)
    * + 0.3 * (1 - min(1, 10*punctRatio)).
    * Deterministic arithmetic mirrored by the DuckDB oracle.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopRatio = when(nTok === 0, 0.0).otherwise(stopwordCount(text) / nTok)
    val punctRatio = when(length(text) === 0, 0.0)
      .otherwise(punctCount(text).cast("double") / length(text))
    round4(
      least(lit(1.0), nTok / 200.0) * 0.4 +
        least(lit(1.0), stopRatio * 5.0) * 0.3 +
        (lit(1.0) - least(lit(1.0), punctRatio * 10.0)) * 0.3)
  }

  /** Marker words per language for the n-gram-free language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "et", "une"))

  /** Distinct-marker-hit count for one language. */
  def langHits(text: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(text)), array(markers.map(lit): _*)))

  /** Argmax language by marker hits; ties break in `LangMarkers` order;
    * zero hits everywhere → "unknown".
    */
  def langId(text: Column): Column = {
    val hits = LangMarkers.map { case (lang, markers) => lang -> langHits(text, markers) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    // Wrap from last to first so the first language's `when` is outermost
    // (earlier languages win ties).
    hits.reverse.foldLeft(lit("unknown")) { case (acc, (lang, h)) =>
      when(best > 0 && h === best, lit(lang)).otherwise(acc)
    }
  }

  /** Keyword channel score (graph keyword search, Q3): +2 per keyword
    * contained in lowercased content, +2 whole-phrase bonus. Normalization to
    * 0-1 by the max raw score happens over the result set (window), as in
    * `runtime_recall_helpers.py:655-659`.
    */
  def keywordRawScore(text: Column, keywords: Seq[String], phrase: String): Column = {
    val lc = lower(text)
    val kwScore = keywords.map(k => when(lc.contains(k.toLowerCase), lit(2)).otherwise(lit(0)))
      .reduceOption(_ + _).getOrElse(lit(0))
    val phraseBonus = when(lc.contains(phrase.toLowerCase), lit(2)).otherwise(lit(0))
    kwScore + phraseBonus
  }

  /** MinHash signature component `s`: the lexicographic min of
    * `md5(token + "#" + s)` over the distinct tokens. A string-valued minhash
    * — portable across engines (md5 is bit-identical everywhere), no
    * engine-specific integer hash.
    */
  def minhashComponent(text: Column, seed: Int): Column =
    // r19: ONE codegen'd expression instead of array_distinct + an
    // interpreted md5 lambda per token (min over duplicates == min over
    // distinct, so the dedup pass is dropped outright) — bitwise-identical
    // by construction (see MinhashMinHex's scaladoc) and pinned by
    // PropertiesSpec's HOF-parity case.
    org.apache.spark.sql.graftshim.GraftShim.column(
      org.apache.spark.sql.graftshim.MinhashMinHex(
        org.apache.spark.sql.graftshim.GraftShim.expression(tokens(text)),
        "#" + seed))

  /** Full MinHash signature as a single concatenated string of `k` components. */
  def minhashSignature(text: Column, k: Int): Column =
    concat_ws("|", (1 to k).map(minhashComponent(text, _)): _*)

  /** Word n-gram shingles (distinct) for Jaccard near-dup. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) < n, array())
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Polynomial rolling-hash document fingerprint over whitespace tokens:
    * token hashes derive from md5 hex (bit-identical across engines), folded
    * left-to-right with h*31 + x mod 1e9+7. Order-sensitive — reordered
    * tokens change the fingerprint — which is what distinguishes it from the
    * set-style MinHash: the cheap exact-sequence identity for incremental
    * dedup at scale.
    */
  def rollingFingerprint(text: Column): Column =
    // r19: ONE codegen'd expression (thread-local digest, tight fold)
    // instead of three interpreted higher-order lambdas per token —
    // bitwise-identical by construction (see RollingFingerprintHash's
    // scaladoc) and pinned by PropertiesSpec's HOF-parity case.
    org.apache.spark.sql.graftshim.GraftShim.column(
      org.apache.spark.sql.graftshim.RollingFingerprintHash(
        org.apache.spark.sql.graftshim.GraftShim.expression(tokens(text))))

  /** Every ':'-delimited prefix of every lowercased tag
    * (`project:foo:bar` → `[project, project:foo, project:foo:bar]`);
    * materialized at write time (reference `utils/tags.py:23-48`).
    */
  def tagPrefixes(tags: Column): Column = {
    array_distinct(flatten(transform(tags, t => {
      val parts = split(lower(t), ":")
      transform(sequence(lit(1), size(parts)),
        i => array_join(slice(parts, lit(1), i), ":"))
    })))
  }
}
