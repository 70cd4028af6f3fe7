package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.round4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID, keyword search (graph keyword channel Q3,
  * `automem/search/runtime_recall_helpers.py:595-724`). Pure narrow
  * projections — whole-stage codegen, no shuffle except the final sort.
  * Each operator carries its mirrored DuckDB oracle SQL.
  */
object TextAnalysis {

  private val toks = raw"regexp_split_to_array(lower(trim(text)), '\s+')"

  /** Per-doc token counts, punctuation/stopword stats, quality score. */
  def docStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tok"),
        bpeTokenCount(col("text")).as("n_bpe"),
        punctCount(col("text")).as("n_punct"),
        stopwordCount(col("text")).as("n_stop"),
        qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val docStatsSql: String =
    s"""SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0 ELSE CAST(len($toks) AS INT) END AS n_tok,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe,
       CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INT) AS n_punct,
       CAST(len(list_filter($toks,
         t -> list_contains(['the','a','of','and','to','in','is'], t))) AS INT) AS n_stop,
       round(
         least(1.0, (CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len($toks) END) / 200.0) * 0.4 +
         least(1.0, (CASE WHEN length(trim(text)) = 0 THEN 0.0
             ELSE len(list_filter($toks,
               t -> list_contains(['the','a','of','and','to','in','is'], t))) * 1.0
               / len($toks) END) * 5.0) * 0.3 +
         (1.0 - least(1.0, (CASE WHEN length(text) = 0 THEN 0.0
             ELSE len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
               / length(text) END) * 10.0)) * 0.3
         + 1e-9, 4) + 0.0 AS quality
       FROM documents ORDER BY doc_id"""

  /** Language-ID heuristic vs the labeled lang column. */
  def langPrediction(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), langId(col("text")).as("predicted"))
      .orderBy("doc_id")

  val langPredictionSql: String =
    s"""WITH h AS (SELECT doc_id, lang,
         CAST(len(list_intersect(list_distinct($toks), ['the','and','of','is'])) AS INT) AS h_en,
         CAST(len(list_intersect(list_distinct($toks), ['el','la','de','que'])) AS INT) AS h_es,
         CAST(len(list_intersect(list_distinct($toks), ['der','die','und','das'])) AS INT) AS h_de,
         CAST(len(list_intersect(list_distinct($toks), ['le','les','et','une'])) AS INT) AS h_fr
       FROM documents)
       SELECT doc_id, lang,
         CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'unknown'
              WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
              WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
              WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
              ELSE 'fr' END AS predicted
       FROM h ORDER BY doc_id"""

  /** Deterministic train/val/test split for training-data pipelines: an
    * engine-portable md5-derived bucket (0-99) per doc id assigns 80/10/10.
    * Hash-based (not random) so the split is stable across runs, engines,
    * and re-partitioning — the property that matters when the corpus is
    * rebuilt incrementally at scale.
    */
  def trainSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = graft.functions.TextFunctions.md5Bucket("", col("doc_id"), 100)
    Tables.documents(spark, dir)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("split")
  }

  val trainSplitSql: String =
    """SELECT split, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
       FROM (SELECT doc_id,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
           FROM documents) t) s
       GROUP BY 1 ORDER BY 1"""

  /** Deterministic epoch shuffle — the data-ORDER operator of a training
    * run: every document gets a pseudo-random permutation position and a
    * balanced shard from the salted md5 coin ([[trainSplit]]'s portable
    * idiom, so the order is replayable per epoch seed and identical in
    * both engines), never from `rand()`. Reading shards in epoch_pos
    * order IS the epoch's global shuffle; changing the seed reshuffles.
    *
    * Scale shape: the global permutation index is NOT one row_number over
    * an unpartitioned window (the whole corpus on one task) — the r14
    * ranking doctrine: ranks stitch exactly from per-(key-range bucket)
    * windows (the md5 key is uniform, so 2^16 contiguous key ranges hold
    * ~corpus/65536 rows each) plus a one-row-per-bucket count prefix.
    * Key collisions tie-break on doc_id, so the order stays total and
    * deterministic at any scale.
    */
  def epochShuffle(spark: SparkSession, dir: String,
      seed: String = "ep0", shards: Int = 8): DataFrame =
    epochShuffle(Tables.documents(spark, dir), seed, shards)

  /** DataFrame-parametric form — needs (doc_id). */
  def epochShuffle(documents: DataFrame, seed: String,
      shards: Int): DataFrame = {
    val keyed = documents.select(col("doc_id"))
      .withColumn("_k", graft.functions.TextFunctions
        .md5Bucket(seed, col("doc_id"), 1000000000))
      .withColumn("_b", expr("_k DIV 15259"))
    val wb = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = keyed.groupBy(col("_b")).agg(count(lit(1)).as("_bn"))
      .withColumn("_off", coalesce(sum(col("_bn")).over(wb), lit(0L)))
      .select(col("_b"), col("_off"))
    val win = Window.partitionBy(col("_b"))
      .orderBy(col("_k"), col("doc_id"))
    keyed.join(off, Seq("_b"))
      .select(col("doc_id"),
        pmod(col("_k"), lit(shards.toLong)).as("shard"),
        (col("_off") + row_number().over(win)).as("epoch_pos"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[epochShuffle]] (seed ep0, 8 shards). */
  val epochShuffleSql: String =
    """WITH k AS (SELECT doc_id,
         ('0x' || substr(md5('ep0' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 1000000000 AS k
         FROM documents)
       SELECT doc_id, k % 8 AS shard,
         CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS epoch_pos
       FROM k ORDER BY doc_id"""

  /** Training-mixture sampling (domain mixing): downsample each source to
    * its recipe rate with a deterministic per-document coin — the standard
    * mixture-weighting stage of a pre-training pipeline (The Pile / Gopher
    * publish per-source epochs-over-corpus weights; at 100 TB this IS the
    * operator that enforces them). The coin is the md5-bucket idiom of
    * [[trainSplit]] (salted so mixing and splitting draw independent
    * coins), keep iff bucket < rate x 1000; the per-source recipe here is a
    * deterministic function of the source suffix so the oracle can mirror
    * it. One scan, one groupBy(source) — linear, no shuffle of kept rows.
    */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket =
      graft.functions.TextFunctions.md5Bucket("mix#", col("doc_id"), 1000)
    // recipe: src0 -> 0.2, src1 -> 0.4, src2 -> 0.6, src3 -> 0.8, cycling
    val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
    val rate = (pmod(srcNum, lit(4)) + 1).cast("double") / 5.0
    Tables.documents(spark, dir)
      .withColumn("_keep", bucket < rate * 1000)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("_keep"), 1).otherwise(0)).as("n_kept"),
        graft.functions.round4(
          sum(when(col("_keep"), 1.0).otherwise(0.0)) / count(lit(1)))
          .as("achieved_rate"),
        min(when(col("_keep"), col("doc_id"))).as("first_kept"))
      .withColumn("target_rate",
        graft.functions.round4((pmod(srcNum, lit(4)) + 1).cast("double") / 5.0))
      .orderBy("source")
  }

  val mixtureSampleSql: String =
    """WITH coin AS (SELECT doc_id, source,
         ('0x' || substr(md5('mix#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS b,
         (CAST(regexp_extract(source, '(\d+)', 1) AS INT) % 4 + 1) / 5.0 AS rate
         FROM documents),
       k AS (SELECT doc_id, source, rate, b < rate * 1000 AS keep FROM coin)
       SELECT source, count(*) AS n_total,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         round(sum(CASE WHEN keep THEN 1.0 ELSE 0.0 END) / count(*) + 1e-9, 4) + 0.0
           AS achieved_rate,
         min(CASE WHEN keep THEN doc_id END) AS first_kept,
         round(any_value(rate) + 1e-9, 4) + 0.0 AS target_rate
       FROM k GROUP BY source ORDER BY source"""

  /** Rolling-hash fingerprint per document + duplicate-group stats: the
    * order-sensitive counterpart to the MinHash/fingerprint dedup family.
    */
  def rollingFingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), rollingFingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .orderBy("fp")

  val rollingFingerprintsSql: String =
    s"""WITH hs AS (SELECT doc_id,
         list_transform($toks,
           t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS h
       FROM documents),
       fp AS (SELECT doc_id,
         CASE WHEN len(h) = 1 THEN h[1]
              ELSE list_reduce(h, (a, b) -> (a * 31 + b) % 1000000007) END AS fp
       FROM hs)
       SELECT fp, count(*) AS n_docs, min(doc_id) AS keep_id
       FROM fp GROUP BY 1 ORDER BY 1"""

  private val Keywords = Seq("spark", "join", "window")
  private val Phrase = "hash join"

  /** Q3 keyword channel: raw contains-score, normalized by the max raw score
    * over the candidate set (window over the filtered set), top-100.
    */
  def keywordSearch(spark: SparkSession, dir: String): DataFrame = {
    // normalize by the THEORETICAL maximum of the content-side components
    // (+2 per keyword, +2 phrase — `runtime_recall_helpers.py:655-660`
    // semantics), a per-query constant: no max-aggregate pass at all
    val maxRaw = 2.0 * Keywords.length + 2.0
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        keywordRawScore(col("text"), Keywords, Phrase).as("raw"))
      .filter(col("raw") > 0)
      .withColumn("kw_score", round4(least(lit(1.0), col("raw") / lit(maxRaw))))
      .select(col("doc_id"), col("kw_score"))
      .orderBy(desc("kw_score"), asc("doc_id"))
      .limit(100)
  }

  val keywordSearchSql: String =
    """WITH s AS (SELECT doc_id,
         (CASE WHEN contains(lower(text), 'spark') THEN 2 ELSE 0 END +
          CASE WHEN contains(lower(text), 'join') THEN 2 ELSE 0 END +
          CASE WHEN contains(lower(text), 'window') THEN 2 ELSE 0 END +
          CASE WHEN contains(lower(text), 'hash join') THEN 2 ELSE 0 END) AS raw
       FROM documents),
       f AS (SELECT * FROM s WHERE raw > 0)
       SELECT doc_id, round((least(1.0, raw / 8.0)) + 1e-9, 4) + 0.0 AS kw_score
       FROM f ORDER BY kw_score DESC, doc_id ASC LIMIT 100"""

  /** E2 pattern detection (`enrichment/runtime_helpers.py:74-174`): groups of
    * same-type records (lang stands in for type; the n_chars floor stands in
    * for the confidence > 0.5 member filter) with >= minDocs members emit
    * their top-k non-stopword key terms (>= 4 chars) and the reference's
    * pattern confidence 0.35 + 0.05 * observations capped 0.95. One
    * explode -> two hash aggregates -> per-group window; the shuffle carries
    * (group, token) keys only.
    */
  def patternKeyTerms(spark: SparkSession, dir: String, minDocs: Int = 3,
      k: Int = 5, minChars: Int = 100): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("n_chars") >= minChars)
    val groups = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .withColumn("pattern_conf",
        round4(least(lit(0.95), lit(0.35) + col("n_docs") * 0.05)))
    val tokCounts = docs
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
      .filter(length(col("token")) >= 4 &&
        !col("token").isin(graft.domain.Recall.Stopwords.toSeq: _*))
      .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
    // two-phase top-k per lang (the zipfSlope/weightedSample idiom): a
    // language's VOCABULARY grows with the corpus (Heaps), so a single
    // row_number over partitionBy(lang) would rank a mega-language's whole
    // vocabulary on one task; phase 1 keeps top-k per (lang, token-salt)
    // on bounded groups, phase 2 re-ranks <= 64k survivors per lang.
    // Exact: every global top-k row is in its own salt's top-k, and the
    // (n desc, token asc) order is total within a lang.
    val o1 = Window
      .partitionBy(col("lang"), pmod(xxhash64(col("token")), lit(64L)))
      .orderBy(desc("n"), asc("token"))
    val w = Window.partitionBy(col("lang")).orderBy(desc("n"), asc("token"))
    tokCounts
      .withColumn("_r1", row_number().over(o1)).filter(col("_r1") <= k)
      .join(groups, Seq("lang"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("_r1")
      .select(col("lang"), col("n_docs"), col("pattern_conf"),
        col("rank").cast("long").as("rank"), col("token"), col("n"))
      .orderBy("lang", "rank")
  }

  val patternKeyTermsSql: String = {
    val stop = graft.domain.Recall.Stopwords.toSeq.sorted
      .map(s => s"'$s'").mkString(", ")
    s"""WITH docs AS (SELECT * FROM documents WHERE n_chars >= 100),
       groups AS (SELECT lang, count(*) AS n_docs,
           round(least(0.95, 0.35 + count(*) * 0.05) + 1e-9, 4) + 0.0 AS pattern_conf
         FROM docs GROUP BY 1 HAVING count(*) >= 3),
       tok AS (SELECT lang, unnest($toks) AS token FROM docs),
       tc AS (SELECT lang, token, count(*) AS n FROM tok
         WHERE length(token) >= 4 AND token NOT IN ($stop)
         GROUP BY 1, 2),
       ranked AS (SELECT lang, token, n, row_number() OVER (PARTITION BY lang
           ORDER BY n DESC, token ASC) AS rank FROM tc)
       SELECT r.lang, g.n_docs, g.pattern_conf, r.rank, r.token, r.n
       FROM ranked r JOIN groups g USING (lang)
       WHERE r.rank <= 5 ORDER BY r.lang, r.rank"""
  }

  /** U2 memory classification (`automem/classification/memory_classifier
    * .py:13-125` via [[graft.domain.Ingest.classify]]): first matching type
    * in table order wins, confidence 0.6 + 0.1 per extra matching pattern of
    * that type capped 0.95, no match -> Context at 0.5. The synthetic corpus
    * has no type-signal vocabulary, so a deterministic signal phrase is
    * appended by doc_id (the PII-oracle trick: both engines inject the SAME
    * text, then run the SAME pattern table — Java and DuckDB/RE2 agree on
    * this regex subset). doc_id % 7 covers: two-pattern Decision (0.7),
    * one-pattern rows for four other types, a two-type row proving
    * first-match priority, and an unsignalled Context row.
    */
  def classifyDocs(spark: SparkSession, dir: String): DataFrame = {
    val signal = element_at(typedlit(ClassifySignals), (col("doc_id") % 7 + 1).cast("int"))
    val content = concat(col("text"), signal)
    val (t, c) = graft.domain.Ingest.classify(content)
    Tables.documents(spark, dir)
      .select(col("doc_id"), t.as("mem_type"), round4(c).as("confidence"))
      .orderBy("doc_id")
  }

  /** Injected type-signal suffixes, indexed by doc_id % 7 (1-based for
    * element_at). Index 5 fires both a Preference and a Pattern regex —
    * table order must pick Preference; index 6 fires none -> Context 0.5.
    */
  val ClassifySignals: Seq[String] = Seq(
    " so we decided after the decision review",
    " i prefer this approach",
    " this happens every time",
    " naming convention note",
    " i prefer the recurring style as always",
    " nothing to see here",
    " we realized and learned and discovered a lot")

  val classifyDocsSql: String = {
    val signals = ClassifySignals.map(s => s"'$s'").mkString(", ")
    val matchCounts = graft.domain.Ingest.TypePatterns.map { case (t, ps) =>
      val sum = ps.map(p =>
        s"(CASE WHEN regexp_matches(content, '$p') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      t.toLowerCase -> s"($sum)"
    }
    val cnt = matchCounts.map { case (n, e) => s"$e AS cnt_$n" }.mkString(", ")
    val typeCase = graft.domain.Ingest.TypePatterns.map { case (t, _) =>
      s"WHEN cnt_${t.toLowerCase} > 0 THEN '$t'" }.mkString(" ")
    val confCase = graft.domain.Ingest.TypePatterns.map { case (t, _) =>
      s"WHEN cnt_${t.toLowerCase} > 0 THEN least(0.95, 0.6 + (cnt_${t.toLowerCase} - 1) * 0.1)"
    }.mkString(" ")
    s"""WITH sig(idx, s) AS (SELECT * FROM (
         SELECT unnest(range(7)) AS idx, unnest([$signals]) AS s)),
       c AS (SELECT doc_id, text || sig.s AS content FROM documents
         JOIN sig ON sig.idx = doc_id % 7),
       m AS (SELECT doc_id, $cnt FROM c)
       SELECT doc_id,
         CASE $typeCase ELSE 'Context' END AS mem_type,
         round((CASE $confCase ELSE 0.5 END) + 1e-9, 4) + 0.0 AS confidence
       FROM m ORDER BY doc_id"""
  }

  /** S1b PATCH /memory batch twin (r16; `automem/api/memory.py:789-886`
    * via [[graft.domain.Ingest.applyPatches]]): a store twin built from
    * the documents table is merge-updated by a deterministic patch mix —
    * content rewrites (%3 of the %7 patched rows), raw mixed-case tag
    * payloads (%2, exercising normalize + prefix recompute), importance
    * (%5), metadata (%4) and explicit updated_at (%11) — and the merged
    * scalar fields are oracle-compared field-for-field. The re-embed gate
    * (only changed content re-embeds) is spec-gated in DomainSpec: the
    * embedding column is engine-internal and has no SQL mirror.
    */
  def patchApply(spark: SparkSession, dir: String): DataFrame = {
    import graft.domain.Ingest
    val d = Tables.documents(spark, dir)
    val t0 = to_timestamp(lit("2024-01-01 00:00:00")) +
      make_dt_interval(lit(0), lit(0), col("doc_id").cast("int"), lit(0))
    val storeTags = array(col("lang"), col("source"))
    val store = d.select(
      col("doc_id").cast("string").as("id"),
      col("text").as("content"),
      t0.as("timestamp"), t0.as("t_valid"),
      lit(null).cast("timestamp").as("t_invalid"),
      t0.as("updated_at"), t0.as("last_accessed"),
      least(lit(1.0), col("n_chars") / 500.0).as("importance"),
      lit(0.7).as("confidence"),
      lit("Context").as("type"),
      storeTags.as("tags"),
      tagPrefixes(storeTags).as("tag_prefixes"),
      lit("{}").as("metadata"),
      graft.domain.PlaceholderEmbedding.embedColumn(8)(col("text"))
        .as("embedding"))
    val patches = d.filter(col("doc_id") % 7 === 0).select(
      col("doc_id").cast("string").as("id"),
      when(col("doc_id") % 3 === 0,
        concat(lit("patched content "), col("doc_id").cast("string")))
        .as("content"),
      when(col("doc_id") % 2 === 0,
        array(lit(" QA:Sub "), lit("Patched"), col("lang"), lit("")))
        .as("tags"),
      when(col("doc_id") % 5 === 0, lit(0.95)).as("importance"),
      when(col("doc_id") % 11 === 0,
        to_timestamp(lit("2026-02-02 00:00:00"))).as("updated_at"),
      when(col("doc_id") % 4 === 0,
        concat(lit("{\"k\": "), col("doc_id").cast("string"), lit("}")))
        .as("metadata"))
    Ingest.applyPatches(store, patches,
        now = to_timestamp(lit("2026-03-01 00:00:00")), dim = 8)
      .select(col("id").cast("int").as("doc_id"),
        col("content"),
        array_join(array_sort(col("tags")), ",").as("tags"),
        array_join(array_sort(col("tag_prefixes")), ",").as("tag_prefixes"),
        round4(col("importance")).as("importance"),
        col("metadata"),
        col("updated_at").cast("string").as("updated_at"))
      .orderBy("doc_id")
  }

  val patchApplySql: String =
    """WITH store AS (
         SELECT doc_id, text AS content,
           TIMESTAMP '2024-01-01 00:00:00' + to_minutes(doc_id) AS ts,
           least(1.0, n_chars / 500.0) AS importance,
           [lang, source] AS tags, lang
         FROM documents),
       p AS (
         SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'patched content ' || doc_id END AS p_content,
           CASE WHEN doc_id % 2 = 0 THEN [' QA:Sub ', 'Patched', lang, ''] END AS p_tags,
           CASE WHEN doc_id % 5 = 0 THEN 0.95 END AS p_importance,
           CASE WHEN doc_id % 11 = 0 THEN TIMESTAMP '2026-02-02 00:00:00' END AS p_updated_at,
           CASE WHEN doc_id % 4 = 0 THEN '{"k": ' || doc_id || '}' END AS p_metadata,
           TRUE AS patched
         FROM documents WHERE doc_id % 7 = 0),
       m AS (
         SELECT s.doc_id,
           coalesce(p.p_content, s.content) AS content,
           CASE WHEN p.patched THEN list_distinct(list_filter(
               list_transform(coalesce(p.p_tags, s.tags), t -> lower(trim(t))),
               t -> length(t) > 0))
             ELSE s.tags END AS tags,
           CASE WHEN p.patched THEN coalesce(p.p_importance, s.importance)
             ELSE s.importance END AS importance,
           CASE WHEN p.patched THEN coalesce(p.p_metadata, '{}')
             ELSE '{}' END AS metadata,
           CASE WHEN p.patched THEN coalesce(p.p_updated_at, s.ts)
             ELSE s.ts END AS updated_at
         FROM store s LEFT JOIN p USING (doc_id)),
       pref AS (
         SELECT doc_id, flatten(list_transform(tags, t ->
           list_transform(range(1, len(string_split(t, ':')) + 1), i ->
             array_to_string(string_split(t, ':')[1:i], ':')))) AS prefixes0
         FROM m)
       SELECT CAST(m.doc_id AS INT) AS doc_id, m.content,
         array_to_string(list_sort(m.tags), ',') AS tags,
         array_to_string(list_sort(list_distinct(pref.prefixes0)), ',') AS tag_prefixes,
         round(m.importance + 1e-9, 4) + 0.0 AS importance,
         m.metadata,
         CAST(m.updated_at AS VARCHAR) AS updated_at
       FROM m JOIN pref USING (doc_id) ORDER BY m.doc_id"""

  /** S1 write-path tag derivation (`automem/utils/tags.py:7-48` via
    * [[graft.domain.Ingest.normalizeTags]] + `TextFunctions.tagPrefixes`):
    * raw tags (mixed case, padded, duplicated, empty) normalize to
    * trimmed/lowercased/deduped, then every ':'-delimited prefix
    * materializes — the write-time column that makes prefix tag filters O(1)
    * at read. Output arrays are sorted and joined to strings so the
    * cross-engine compare is order-insensitive and scalar.
    */
  def tagPrepare(spark: SparkSession, dir: String): DataFrame = {
    val raw = array(col("source"),
      concat(lit("src:"), col("source"), lit(":"), col("lang")),
      concat(lit(" "), upper(col("lang")), lit(" ")),
      col("source"), lit(""))
    val norm = graft.domain.Ingest.normalizeTags(raw)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_join(array_sort(norm), ",").as("tags"),
        array_join(array_sort(tagPrefixes(norm)), ",").as("tag_prefixes"))
      .orderBy("doc_id")
  }

  val tagPrepareSql: String =
    """WITH raw AS (SELECT doc_id,
         [source, 'src:' || source || ':' || lang, ' ' || upper(lang) || ' ',
          source, ''] AS tags0
         FROM documents),
       norm AS (SELECT doc_id,
         list_distinct(list_filter(
           list_transform(tags0, t -> lower(trim(t))), t -> length(t) > 0)) AS tags
         FROM raw),
       pref AS (SELECT doc_id, tags,
         flatten(list_transform(tags, t ->
           list_transform(range(1, len(string_split(t, ':')) + 1), i ->
             array_to_string(string_split(t, ':')[1:i], ':')))) AS prefixes0
         FROM norm)
       SELECT doc_id,
         array_to_string(list_sort(tags), ',') AS tags,
         array_to_string(list_sort(list_distinct(prefixes0)), ',') AS tag_prefixes
       FROM pref ORDER BY doc_id"""

  /** Token-budget shard packing (sequence packing): assign each document to
    * a training shard by RUNNING token count within its source, so shards
    * land near a fixed token budget (500 here) without a global sort. A
    * global running sum would be a single-partition window — a driver-shaped
    * bottleneck at 100 TB; partitioning the cumsum by source keeps shards
    * source-homogeneous for mixture accounting, and within each source the
    * cumsum is SALTED into contiguous doc_id ranges and stitched exactly
    * (see the three-arg overload) so a mega-source never serializes onto
    * one task. A doc is assigned to the shard its CUMULATIVE-BEFORE
    * count falls in (floor((cum - n_tok) / budget)): no shard splits a
    * document, and a shard closes only once the running total crosses its
    * cumulative boundary (an individual shard can undershoot the budget
    * when a large straddling doc was counted against the previous one).
    * Output is the per-shard summary (doc/token counts, id range).
    */
  def shardPack(spark: SparkSession, dir: String): DataFrame =
    shardPack(Tables.documents(spark, dir), budget = 500.0)

  /** DataFrame-parametric form — needs (doc_id, source, text). Default
    * salt width keeps any one sequential cumsum scan under 4096 docs.
    */
  def shardPack(documents: DataFrame, budget: Double): DataFrame =
    shardPack(documents, budget, saltWidth = 4096L)

  /** Salted two-phase form (the at-scale path, r13 VERDICT item 2): a
    * single `sum over (partition by source order by doc_id)` puts a
    * mega-source — the web crawl IS most of a real corpus — on ONE task.
    * Instead the per-source running count is computed in two exact integer
    * phases over CONTIGUOUS doc_id ranges (`salt = doc_id DIV saltWidth`,
    * monotone in doc_id, so per-salt order concatenates to global order):
    *   1. cumsum within (source, salt) — every window group is <= saltWidth
    *      rows, parallel across salts;
    *   2. per-salt token subtotals (a combiner aggregate), prefix-summed by
    *      a window whose groups hold ONE ROW PER SALT (corpus/saltWidth
    *      rows — tiny), joined back on the same (source, salt) key.
    * offset + within-salt cumsum == the global cumsum exactly (all-long
    * arithmetic — the sequenceChunks integer doctrine), so shard
    * boundaries are bitwise-identical to the unsalted form at any width
    * (equality spec in TextAnalysisSpec; saltWidth = Long.MaxValue
    * degenerates to one salt = the unsalted plan).
    */
  def shardPack(documents: DataFrame, budget: Double,
      saltWidth: Long): DataFrame =
    saltedSourceCumsum(
      documents.select(col("doc_id"), col("source"),
        tokenCount(col("text")).as("n_tok")),
      "n_tok", "_cum", saltWidth)
      .withColumn("shard",
        floor((col("_cum") - col("n_tok")) / lit(budget)))
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tok"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("source", "shard")

  /** Exact salted per-source running sum (the shardPack/sequenceChunks
    * doctrine): adds `cumName` = the INCLUSIVE running sum of `v` per
    * `source` in doc_id order, computed in two integer phases over
    * contiguous doc_id ranges (`salt = doc_id DIV saltWidth`, monotone in
    * doc_id): a within-(source, salt) window whose groups are bounded at
    * saltWidth docs, plus a one-row-per-salt subtotal prefix joined back.
    * Bitwise-identical to the single-window form at any width — a
    * mega-source never serializes onto one task.
    */
  private def saltedSourceCumsum(df: DataFrame, v: String, cumName: String,
      saltWidth: Long): DataFrame = {
    val salted = df.withColumn("_salt", expr(s"doc_id DIV ${saltWidth}L"))
    val wSalt = Window.partitionBy(col("source"), col("_salt"))
      .orderBy(col("doc_id"))
    val wPrefix = Window.partitionBy(col("source")).orderBy(col("_salt"))
    val offsets = salted.groupBy(col("source"), col("_salt"))
      .agg(sum(col(v)).as("_sub"))
      .withColumn("_off", sum(col("_sub")).over(wPrefix) - col("_sub"))
      .select(col("source"), col("_salt"), col("_off"))
    salted
      .withColumn("_cum_in", sum(col(v)).over(wSalt))
      .join(offsets, Seq("source", "_salt"))
      .withColumn(cumName, col("_off") + col("_cum_in"))
      .drop("_salt", "_cum_in", "_off")
  }

  val shardPackSql: String =
    raw"""WITH t AS (SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS n_tok
       FROM documents),
       c AS (SELECT doc_id, source, n_tok,
         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum FROM t),
       s AS (SELECT source,
         CAST(FLOOR((cum - n_tok) / 500.0) AS BIGINT) AS shard, doc_id, n_tok
         FROM c)
       SELECT source, shard, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS n_tok,
         min(doc_id) AS first_doc, max(doc_id) AS last_doc
       FROM s GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Temperature-scaled source mixing — the multilingual/multi-domain
    * sampling knob (the `T` in p_i ∝ n_i^(1/T) from the mBERT/XLM-R line
    * of work): raw source counts are exponentiated by alpha = 1/T and
    * renormalized, flattening the source distribution toward uniform as T
    * grows so low-resource sources are upsampled relative to their share.
    * Emits per source: raw count, natural share, the T-scaled target
    * share, and the effective per-document repeat factor (target share /
    * natural share — >1 means that source is oversampled in the mix).
    *
    * Scale shape: one combiner-friendly count aggregate, a 1-row total
    * via window over the ≤|sources| count table, pure arithmetic after —
    * identical cost to any per-source summary regardless of corpus size.
    */
  def temperatureMix(spark: SparkSession, dir: String,
      temperature: Double = 2.0): DataFrame =
    temperatureMix(Tables.documents(spark, dir), temperature)

  /** DataFrame-parametric form — needs (doc_id, source). */
  def temperatureMix(documents: DataFrame, temperature: Double): DataFrame = {
    val alpha = 1.0 / temperature
    val counts = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val all = Window.partitionBy()
    counts
      .withColumn("_tot", sum(col("n_docs")).over(all))
      .withColumn("_pow", pow(col("n_docs").cast("double"), alpha))
      .withColumn("_powtot", sum(col("_pow")).over(all))
      .select(col("source"), col("n_docs"),
        round4(col("n_docs") / col("_tot")).as("natural_share"),
        round4(col("_pow") / col("_powtot")).as("target_share"),
        round4((col("_pow") / col("_powtot")) /
          (col("n_docs") / col("_tot"))).as("repeat_factor"))
      .orderBy("source")
  }

  val temperatureMixSql: String =
    """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
       t AS (SELECT sum(n_docs) AS tot,
           sum(pow(n_docs, 0.5)) AS powtot FROM c)
       SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         round(n_docs / tot + 1e-9, 4) + 0.0 AS natural_share,
         round(pow(n_docs, 0.5) / powtot + 1e-9, 4) + 0.0 AS target_share,
         round((pow(n_docs, 0.5) / powtot) / (n_docs / tot) + 1e-9, 4) + 0.0
           AS repeat_factor
       FROM c, t ORDER BY source"""

  /** UniMax mixture allocation (Chung et al. 2023, ICLR — "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): distribute a total token budget across sources as
    * uniformly as possible subject to a per-source EPOCH CAP — no source
    * is repeated more than `maxEpochs` passes, the failure mode
    * temperature sampling has on low-resource sources (it upsamples them
    * into dozens of epochs). Closed form of the paper's greedy
    * ascending-size loop: while allocation proceeds in the capped regime
    * the consumed budget is exactly the prefix of capacities, so a source
    * at ascending rank r (of n) is capped iff
    * `cap * (n - r + 1) <= budget - prefixCap(r-1)`; the test is monotone
    * (for later ranks the naive capacity prefix only OVERSTATES real
    * consumption, keeping it false once false), and every uncapped source
    * gets the waterfilling level
    * `lambda = (budget - sum(capped caps)) / #uncapped`. One window pass
    * replaces the loop.
    *
    * Determinism discipline (the DSIR lesson): capacities are LONG
    * micro-tokens (`tokens * maxEpochsMicro`), so prefix/total sums are
    * exact integer arithmetic — associative under any window/partition
    * order — and the capped test is a long compare. Floats appear only in
    * the final division chain, written identically in the oracle.
    * Micro-token capacity overflows int64 at ~9e12 tokens/source divided
    * by n; a >100 TB single source wants milli-token units.
    *
    * Scale shape: token counting is the corpus scan (combiner-friendly
    * sum); the waterfill runs on the <= |sources| aggregate via
    * empty-partition windows — same pattern as [[temperatureMix]],
    * constant cost beyond the scan.
    */
  def unimaxMix(spark: SparkSession, dir: String): DataFrame =
    unimaxMix(Tables.documents(spark, dir), budgetTokens = 20000L,
      maxEpochsMicro = 800000L)

  /** DataFrame-parametric form — needs (source, text). `maxEpochsMicro` is
    * the epoch cap in millionths (800000 = 0.8 epochs).
    */
  def unimaxMix(documents: DataFrame, budgetTokens: Long,
      maxEpochsMicro: Long): DataFrame = {
    val budgetU = budgetTokens * 1000000L
    val counts = documents
      .select(col("source"), tokenCount(col("text")).as("n_tok"))
      .groupBy(col("source")).agg(sum(col("n_tok")).cast("long").as("tokens"))
      // a zero-token source has nothing to allocate and would make the
      // epochs division 0/0 = NaN (cross-engine NaN behavior is
      // undefined); it leaves the allocation entirely, mirrored in SQL
      .filter(col("tokens") > 0L)
      .withColumn("cap_u", col("tokens") * maxEpochsMicro)
    // <= |sources| rows from here on — the single-partition windows are
    // deliberate (same as temperatureMix)
    val o = Window.orderBy(col("cap_u"), col("source"))
    val all = Window.partitionBy()
    counts
      .withColumn("_r", row_number().over(o))
      .withColumn("_n", count(lit(1)).over(all))
      .withColumn("_prefix", coalesce(sum(col("cap_u"))
        .over(o.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("capped",
        col("cap_u") * (col("_n") - col("_r") + 1L) <= lit(budgetU) - col("_prefix"))
      .withColumn("_capsum", coalesce(
        sum(when(col("capped"), col("cap_u"))).over(all), lit(0L)))
      .withColumn("_nun", sum(when(col("capped"), 0L).otherwise(1L)).over(all))
      .withColumn("_alloc_u", when(col("capped"), col("cap_u").cast("double"))
        .otherwise((lit(budgetU) - col("_capsum")).cast("double") / col("_nun")))
      .select(col("source"), col("tokens"), col("capped"),
        round4(col("_alloc_u") / 1e6).as("alloc_tokens"),
        round4(col("_alloc_u") / 1e6 / col("tokens")).as("epochs"),
        round4(col("_alloc_u") / 1e6 / budgetTokens).as("mix_share"))
      .orderBy("source")
  }

  def unimaxMixSql(budgetTokens: Long = 20000L,
      maxEpochsMicro: Long = 800000L): String = {
    val budgetU = budgetTokens * 1000000L
    raw"""WITH tc AS (SELECT source, CAST(sum(
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END)
           AS BIGINT) AS tokens FROM documents GROUP BY 1),
       c AS (SELECT source, tokens, tokens * $maxEpochsMicro AS cap_u
         FROM tc WHERE tokens > 0),
       w AS (SELECT source, tokens, cap_u,
           row_number() OVER o AS r, count(*) OVER () AS n,
           coalesce(sum(cap_u) OVER (o ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS prefix
         FROM c WINDOW o AS (ORDER BY cap_u, source)),
       f AS (SELECT *, cap_u * (n - r + 1) <= $budgetU - prefix AS capped
         FROM w),
       g AS (SELECT *,
           coalesce(sum(CASE WHEN capped THEN cap_u END) OVER (), 0)
             AS capsum,
           sum(CASE WHEN capped THEN 0 ELSE 1 END) OVER () AS nun FROM f),
       a AS (SELECT source, tokens, capped,
           CASE WHEN capped THEN CAST(cap_u AS DOUBLE)
                ELSE CAST($budgetU - capsum AS DOUBLE) / nun END AS alloc_u
         FROM g)
       SELECT source, tokens, capped,
         round(alloc_u / 1e6 + 1e-9, 4) + 0.0 AS alloc_tokens,
         round(alloc_u / 1e6 / tokens + 1e-9, 4) + 0.0 AS epochs,
         round(alloc_u / 1e6 / $budgetTokens + 1e-9, 4) + 0.0 AS mix_share
       FROM a ORDER BY source"""
  }

  /** DoReMi domain reweighting (Xie et al. 2023, NeurIPS — "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * Group-DRO multiplicative-weights over per-domain EXCESS LOSS — the
    * domains a proxy model finds hardest relative to a per-domain
    * reference get upweighted, the step most post-Pile mixture recipes
    * borrow. The paper's proxy/reference losses come from two trained
    * 280M models; this engine's deterministic stand-in keeps the exact
    * same structure with unigram LMs: reference = the domain's own
    * add-one-smoothed unigram distribution, proxy = the corpus-wide one,
    * so `excess(d) = mean_tokens(ln p_d(w) - ln p_corpus(w))` — literally
    * the per-token log-loss gap between the generalist and the domain
    * specialist, clamped at 0 like the paper's `max(0, ·)`.
    *
    * Update rule (T steps, the paper's Algorithm 1 with eta=1, smoothing
    * c=0.001): `a_i = w_i * exp(eta * lambda_i)`; normalize;
    * `w_i' = (1-c) * a_i / sum(a) + c/n`. Reported weights are the final
    * step AND the across-step average (DoReMi's actual output is the
    * average mixture).
    *
    * Determinism discipline (the DSIR idiom, three layers): (1) per-
    * (domain, token) log-prob deltas quantize to integer MICRO-units, so
    * the per-domain accumulation is exact long arithmetic under any
    * partition-merge order; (2) the iteration state itself is RE-QUANTIZED
    * to micro-longs after every step, so both engines iterate on identical
    * integers and a sub-ulp `exp` disagreement cannot compound across
    * steps; (3) every float expression is written token-for-token
    * identically in the oracle (including `1.0 - 0.001` — the LITERAL
    * 0.999 is a different double). The +1e-3 nudge guards each
    * re-quantization's .5 boundary.
    *
    * Scale shape: one explode pass into a combiner-friendly
    * (domain, token) aggregate — the same class as [[dsirWeights]]; the
    * corpus-level token table joins on the token (linear shuffle, or
    * broadcast at vocab sizes that fit); the iteration runs on |domains|
    * rows COLLECTED to the driver (the k-means-centroid pattern — a
    * bounded model parameter, not a corpus collect) and is O(T*n).
    */
  def doremiMix(spark: SparkSession, dir: String): DataFrame =
    doremiMix(Tables.documents(spark, dir), eta = 1.0, steps = 10,
      smoothing = 0.001)

  /** DataFrame-parametric form — needs (source, text). */
  def doremiMix(documents: DataFrame, eta: Double, steps: Int,
      smoothing: Double): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val dwc = documents
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
    val cw = dwc.groupBy(col("w")).agg(sum(col("cnt")).as("c_w"))
    val dt = dwc.groupBy(col("source")).agg(sum(col("cnt")).as("t_d"))
    val tot = cw.agg(sum(col("c_w")).as("tt"), count(lit(1)).as("v"))
    // LEFT joins for the same ReusedExchange reason as dsirWeights: an
    // inner join's inferred isnotnull would un-canonicalize the shared
    // (source, w) aggregate
    val delta = dwc.join(cw, Seq("w"), "left")
      .join(broadcast(dt), Seq("source"), "left")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("cnt"),
        round((log((col("cnt") + 1.0) / (col("t_d") + col("v"))) -
          log((col("c_w") + 1.0) / (col("tt") + col("v")))) * 1e6 + 1e-3)
          .cast("long").as("delta_u"))
    val lam = delta.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("delta_u")).as("ex_u"))
      .select(col("source"), col("n_tokens"),
        greatest(round(col("ex_u").cast("double") / col("n_tokens") + 1e-3)
          .cast("long"), lit(0L)).as("lam_u"))
      .orderBy("source")
      .collect()
    val n = lam.length
    val lamU = lam.map(_.getLong(2))
    val w = Array.fill(n)(math.round(1e6 / n + 1e-3))
    val acc = Array.fill(n)(0L)
    for (_ <- 1 to steps) {
      val a = Array.tabulate(n)(i =>
        w(i).toDouble * math.exp(eta * lamU(i) / 1e6))
      var s = 0.0
      var i = 0
      while (i < n) { s += a(i); i += 1 }
      i = 0
      while (i < n) {
        val m = (1.0 - smoothing) * a(i) / s + smoothing / n
        w(i) = math.round(m * 1e6 + 1e-3)
        acc(i) += w(i)
        i += 1
      }
    }
    lam.indices.map(i =>
        (lam(i).getString(0), lam(i).getLong(1), lamU(i), w(i), acc(i)))
      .toDF("source", "n_tokens", "lam_u", "w_u", "acc_u")
      .select(col("source"), col("n_tokens"),
        round4(col("lam_u") / 1e6).as("excess_loss"),
        round4(col("w_u") / 1e6).as("weight"),
        round4(col("acc_u") / lit(steps * 1e6)).as("weight_avg"))
      .orderBy("source")
  }

  /** DuckDB mirror of [[doremiMix]] at the default knobs: the iteration is
    * a recursive CTE whose state is a pair of domain-ordered micro-long
    * LISTS (weights, across-step accumulator) — list order fixes the
    * normalization's summation order to match the driver loop's.
    */
  val doremiMixSql: String =
    raw"""WITH RECURSIVE t AS (SELECT source,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
       FROM documents),
       dwc AS (SELECT source, w, count(*) AS cnt FROM t GROUP BY 1, 2),
       cw AS (SELECT w, sum(cnt) AS c_w FROM dwc GROUP BY 1),
       dt AS (SELECT source, sum(cnt) AS t_d FROM dwc GROUP BY 1),
       tot AS (SELECT sum(c_w) AS tt, count(*) AS v FROM cw),
       del AS (SELECT d.source, d.cnt, CAST(round(
             (ln((d.cnt + 1.0) / (dt.t_d + tot.v)) -
              ln((c.c_w + 1.0) / (tot.tt + tot.v))) * 1e6 + 1e-3) AS BIGINT)
           AS delta_u
         FROM dwc d JOIN cw c USING (w) JOIN dt ON dt.source = d.source, tot),
       lam AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
           greatest(CAST(round(CAST(sum(cnt * delta_u) AS DOUBLE) / sum(cnt)
             + 1e-3) AS BIGINT), 0) AS lam_u
         FROM del GROUP BY 1),
       ll AS (SELECT list(source ORDER BY source) AS srcs,
           list(lam_u ORDER BY source) AS lams, count(*) AS n FROM lam),
       it AS (
         SELECT 0 AS i,
             list_transform(range(n),
               x -> CAST(round(1e6 / n + 1e-3) AS BIGINT)) AS w,
             list_transform(range(n), x -> CAST(0 AS BIGINT)) AS acc
           FROM ll
         UNION ALL
         SELECT i + 1, neww,
             list_transform(range(len(neww)), j -> acc[j+1] + neww[j+1])
           FROM (SELECT i, acc, list_transform(range(len(a)), j ->
               CAST(round(((1.0 - 0.001) * a[j+1] / s + 0.001 / nn) * 1e6
                 + 1e-3) AS BIGINT)) AS neww
             FROM (SELECT i, acc, a, list_aggregate(a, 'sum') AS s,
                 len(a) AS nn
               FROM (SELECT it.i, it.acc,
                   list_transform(range(len(it.w)), j ->
                     it.w[j+1] * exp(1.0 * ll.lams[j+1] / 1e6)) AS a
                 FROM it, ll WHERE it.i < 10) z1) z2) z3),
       fin AS (SELECT w, acc FROM it WHERE i = 10),
       ex AS (SELECT unnest(ll.srcs) AS source, unnest(fin.w) AS w_u,
           unnest(fin.acc) AS acc_u FROM fin, ll)
       SELECT e.source, l.n_tokens,
         round(l.lam_u / 1e6 + 1e-9, 4) + 0.0 AS excess_loss,
         round(e.w_u / 1e6 + 1e-9, 4) + 0.0 AS weight,
         round(e.acc_u / (10 * 1e6) + 1e-9, 4) + 0.0 AS weight_avg
       FROM ex e JOIN lam l USING (source) ORDER BY source"""

  /** Context-window sequence packing accounting — the concat-then-chunk
    * step of a pretraining pipeline (documents concatenated per source in
    * id order, the token stream split into fixed `ctx`-token training
    * sequences; GPT-style packing). Unlike [[shardPack]] (which assigns
    * each WHOLE document to the shard where it starts), this accounts for
    * documents SPLIT across sequence boundaries: per sequence it reports
    * how many documents contribute tokens, how many carried over from the
    * previous sequence (the split count a data engineer watches — high
    * carry-over on short contexts means attention windows full of document
    * fragments), and the fill (every sequence holds exactly `ctx` tokens
    * except the final partial one per source).
    *
    * All arithmetic is INTEGER (token offsets, DIV) — no float rounding
    * anywhere, so the oracle hash cannot drift by construction. Scale
    * shape: one window cumsum per source (the same single shuffle
    * shardPack pays), then a bounded explode — each document expands to
    * ceil(len/ctx)+1 spanned-sequence rows at most, and the per-sequence
    * aggregate is combiner-friendly. No global sort, no driver loop.
    */
  def sequenceChunks(spark: SparkSession, dir: String): DataFrame =
    sequenceChunks(Tables.documents(spark, dir), ctx = 256L)

  /** DataFrame-parametric form — needs (doc_id, source, text). */
  def sequenceChunks(documents: DataFrame, ctx: Long): DataFrame =
    sequenceChunks(documents, ctx, saltWidth = 4096L)

  /** Salted form (r14: the same mega-source cumsum fix as [[shardPack]] —
    * the per-source token running count rides [[saltedSourceCumsum]], so
    * a 10^10-doc source never lands on one window task; chunk boundaries
    * are bitwise-identical at any width).
    */
  def sequenceChunks(documents: DataFrame, ctx: Long,
      saltWidth: Long): DataFrame = {
    val base = saltedSourceCumsum(
      documents
        .select(col("doc_id"), col("source"),
          tokenCount(col("text")).cast("long").as("n_tok"))
        .filter(col("n_tok") > 0),
      "n_tok", "_cum", saltWidth)
      .withColumn("tok_start", col("_cum") - col("n_tok"))
      .withColumn("tok_end", col("_cum"))
      .drop("_cum")
    base
      .withColumn("seq", explode(sequence(
        expr(s"tok_start DIV $ctx"), expr(s"(tok_end - 1) DIV $ctx"))))
      .withColumn("tok_in",
        least(col("tok_end"), (col("seq") + 1) * ctx) -
          greatest(col("tok_start"), col("seq") * ctx))
      .groupBy(col("source"), col("seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_in")).as("n_tok"),
        sum(when(col("tok_start") < col("seq") * ctx, 1L).otherwise(0L))
          .as("n_carried"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("source", "seq")
  }

  val sequenceChunksSql: String =
    raw"""WITH t AS (SELECT doc_id, source,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END
           AS n_tok
       FROM documents),
       c AS (SELECT doc_id, source, n_tok,
           CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok
             AS BIGINT) AS tok_start
         FROM t WHERE n_tok > 0),
       sp AS (SELECT doc_id, source, n_tok, tok_start,
           tok_start + n_tok AS tok_end,
           unnest(range(tok_start // 256, (tok_start + n_tok - 1) // 256 + 1))
             AS seq
         FROM c)
       SELECT source, seq, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(least(tok_end, (seq + 1) * 256) -
           greatest(tok_start, seq * 256)) AS BIGINT) AS n_tok,
         CAST(sum(CASE WHEN tok_start < seq * 256 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_carried,
         min(doc_id) AS first_doc, max(doc_id) AS last_doc
       FROM sp GROUP BY 1, 2 ORDER BY 1, 2"""

  /** DSIR-style importance weighting (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score every
    * raw-pool document by the log-likelihood ratio of its hashed n-gram
    * features under a TARGET distribution vs the RAW distribution, so a
    * pretraining pipeline can resample the web crawl toward a trusted
    * domain. Features are unigrams + word bigrams hashed into `buckets`
    * buckets (the paper uses 10^4; production would use 2^20 — the plan is
    * identical); the target here is the corpus slice with `lang =
    * targetLang`, add-1 smoothing on both distributions.
    *
    * Scale shape: ONE explode pass builds (doc, bucket) pairs, immediately
    * reduced to per-(doc, bucket) counts — <= `buckets` rows per document
    * regardless of length. BOTH downstream consumers (the global bucket
    * distributions and the per-doc score) read that same aggregate, so the
    * expensive explode+shuffle subplan is planned once and Catalyst's
    * ReusedExchange serves the second consumer from the first's shuffle
    * files (plan-verified in DataSelectionSpec). The raw-vs-target split is
    * a conditional sum in the same aggregate, not a second scan; totals
    * ride a window over the <= `buckets`-row count table (bounded, never
    * corpus-sized); the log-ratio table broadcasts. No stage is more than
    * linear in the corpus. `keep` compares the ROUNDED average so the sign
    * can't flip on float noise.
    */
  def dsirWeights(spark: SparkSession, dir: String, buckets: Int = 64,
      targetLang: String = "en"): DataFrame =
    dsirWeights(Tables.documents(spark, dir), buckets, targetLang)

  /** DataFrame-parametric form — needs (doc_id, lang, text). */
  def dsirWeights(documents: DataFrame, buckets: Int,
      targetLang: String): DataFrame = {
    val base = documents
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("ws"))
    val bigrams = when(size(col("ws")) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("ws")) - 1),
        i => concat(element_at(col("ws"), i), lit(" "),
          element_at(col("ws"), i + 1))))
    val perDocBucket = base
      .select(col("doc_id"), col("lang"),
        explode(concat(col("ws"), bigrams)).as("f"))
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("f")), 1, 15), 16, 10).cast("long"),
          lit(buckets)).as("b"))
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val counts = perDocBucket.groupBy(col("b")).agg(
      sum(col("cnt")).as("r_cnt"),
      sum(when(col("lang") === targetLang, col("cnt")).otherwise(0L))
        .as("t_cnt"))
    val all = Window.partitionBy()
    // lam is quantized to integer MICRO-units (round(lam*1e6), stored as
    // long) so the per-doc weighted sum below is EXACT integer arithmetic:
    // sum-of-longs is associative/commutative regardless of partition-merge
    // order, which kills the float-accumulation-order flake the r9 driver
    // gate caught (avg within an ulp of a .00005 boundary flipped the 4th
    // decimal on SOME runs). The only float ops left are one division and
    // one round4 on exact integer inputs — deterministic. The +1e-3 nudge
    // (1e-9 in lam units) mirrors round4's boundary-escape trick so the
    // micro-quantization itself can't straddle a .5 tie across engines.
    val lam = counts
      .withColumn("rt", sum(col("r_cnt")).over(all))
      .withColumn("tt", sum(col("t_cnt")).over(all))
      .select(col("b"),
        round((log((col("t_cnt") + 1.0) / (col("tt") + buckets)) -
          log((col("r_cnt") + 1.0) / (col("rt") + buckets))) * 1e6 + 1e-3)
          .cast("long").as("lam_u"))
    // LEFT join, not inner: lam covers every observed bucket by
    // construction, and an inner join would infer an isnotnull(b) filter
    // on the probe side — which un-canonicalizes the shared feature
    // aggregate and defeats ReusedExchange
    perDocBucket.join(broadcast(lam), Seq("b"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("cnt") * col("lam_u")).as("llr_u"))
      .select(col("doc_id"), col("lang"), col("n_feats"),
        round4(col("llr_u") / 1e6 / col("n_feats")).as("avg_llr"))
      .withColumn("keep", col("avg_llr") > 0.0)
      .orderBy("doc_id")
  }

  val dsirWeightsSql: String =
    raw"""WITH t AS (SELECT doc_id, lang,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
       uni AS (SELECT doc_id, lang, unnest(ws) AS f FROM t),
       bi AS (SELECT doc_id, lang, ws[i] || ' ' || ws[i+1] AS f
         FROM (SELECT doc_id, lang, ws, unnest(range(1, len(ws))) AS i
               FROM t WHERE len(ws) >= 2) p),
       f AS (SELECT doc_id, lang,
           ('0x' || substr(md5(f), 1, 15))::BIGINT % 64 AS b
         FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) u),
       dbc AS (SELECT doc_id, lang, b, count(*) AS cnt FROM f GROUP BY 1, 2, 3),
       cnt AS (SELECT b, sum(cnt) AS r_cnt,
           sum(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS t_cnt
         FROM dbc GROUP BY 1),
       tot AS (SELECT sum(r_cnt) AS rt, sum(t_cnt) AS tt FROM cnt),
       lam AS (SELECT b, CAST(round(
           (ln((t_cnt + 1.0) / (tt + 64)) - ln((r_cnt + 1.0) / (rt + 64)))
           * 1e6 + 1e-3) AS BIGINT) AS lam_u
         FROM cnt, tot)
       SELECT d.doc_id, d.lang, CAST(sum(d.cnt) AS BIGINT) AS n_feats,
         round(CAST(sum(d.cnt * l.lam_u) AS DOUBLE) / 1e6 / sum(d.cnt)
           + 1e-9, 4) + 0.0 AS avg_llr,
         round(CAST(sum(d.cnt * l.lam_u) AS DOUBLE) / 1e6 / sum(d.cnt)
           + 1e-9, 4) + 0.0 > 0.0 AS keep
       FROM dbc d JOIN lam l ON l.b = d.b
       GROUP BY d.doc_id, d.lang ORDER BY d.doc_id"""

  /** Per-source length-quantile filtering: exact p10/p50/p90 of `n_chars`
    * within each source, and the count of documents inside the [p10, p90]
    * band — the standard outlier-length cut of a pretraining pipeline,
    * computed PER SOURCE because length distributions differ wildly across
    * domains (code vs chat vs web). Bounds compare against the ROUNDED
    * quantiles so the band membership can't flip on float noise.
    *
    * Scale shape: the quantile aggregate groups by source (combiner-
    * friendly for the count/avg parts; the exact percentile is a per-group
    * sort). At 100 TB swap `percentile` for `percentile_approx(...,
    * accuracy)` — a true streaming sketch aggregate with bounded state —
    * and the rest of the plan (tiny per-source bounds broadcast back onto
    * the corpus scan) is unchanged; the spec pins the approx variant's
    * error against this exact one.
    */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame =
    lengthQuantiles(Tables.documents(spark, dir))

  /** DataFrame-parametric form — needs (doc_id, source, n_chars). */
  def lengthQuantiles(documents: DataFrame): DataFrame = {
    val q = documents.groupBy(col("source"))
      .agg(expr("percentile(n_chars, array(0.1D, 0.5D, 0.9D))").as("qs"))
      .select(col("source"),
        round4(element_at(col("qs"), 1)).as("p10"),
        round4(element_at(col("qs"), 2)).as("p50"),
        round4(element_at(col("qs"), 3)).as("p90"))
    documents.join(broadcast(q), Seq("source"))
      .groupBy(col("source"), col("p10"), col("p50"), col("p90"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("n_chars") >= col("p10") &&
          col("n_chars") <= col("p90"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("source"), col("p10"), col("p50"), col("p90"),
        col("n_total"), col("n_kept"))
      .orderBy("source")
  }

  /** One-pass sketch-based corpus profile: per source, doc/token totals,
    * HyperLogLog++ distinct-text estimate (the dedup-rate gauge), and
    * KLL-sketch length quantiles. This is THE profiling shape at 100 TB:
    * every aggregate here is a mergeable bounded-memory sketch computed in
    * a single combiner-friendly pass — no sort, no second scan, no exact
    * distinct's full shuffle. NOT DuckDB-oracle-gated (sketch internals are
    * not engine-portable); the gate is DataSelectionSpec, which pins the
    * sketch error against exact answers (<=5%) on real data.
    */
  def corpusProfile(documents: DataFrame): DataFrame =
    documents
      .select(col("source"), col("n_chars"), md5(col("text")).as("h"),
        tokenCount(col("text")).as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        approx_count_distinct(col("h"), 0.01).as("approx_distinct_texts"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        expr("approx_percentile(n_chars, array(0.5D, 0.9D), 5000)").as("q"))
      .select(col("source"), col("n_docs"), col("approx_distinct_texts"),
        col("n_tokens"),
        element_at(col("q"), 1).as("p50_chars"),
        element_at(col("q"), 2).as("p90_chars"))
      .orderBy("source")

  val lengthQuantilesSql: String =
    """WITH q AS (SELECT source,
         round(quantile_cont(n_chars, 0.1) + 1e-9, 4) + 0.0 AS p10,
         round(quantile_cont(n_chars, 0.5) + 1e-9, 4) + 0.0 AS p50,
         round(quantile_cont(n_chars, 0.9) + 1e-9, 4) + 0.0 AS p90
       FROM documents GROUP BY 1)
       SELECT d.source, q.p10, q.p50, q.p90, count(*) AS n_total,
         CAST(sum(CASE WHEN d.n_chars >= q.p10 AND d.n_chars <= q.p90
           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       FROM documents d JOIN q ON q.source = d.source
       GROUP BY 1, 2, 3, 4 ORDER BY 1"""

  /** Cross-source content-overlap matrix (r13): for every source pair,
    * the count of distinct word-3-grams they SHARE and the Jaccard of
    * their shingle sets — the inter-source contamination diagnostic a
    * mixture recipe wants before weighting sources independently (two
    * mirrors of the same crawl would otherwise be double-counted by every
    * per-source allocator: UniMax, DoReMi, temperature mixing). Distinct
    * from [[graft.operators.TextPolicy.contamination]], which screens the
    * corpus against a known BENCHMARK list; this screens the corpus
    * against itself, source-pairwise.
    *
    * Scale shape: one shingle pass -> distinct (source, shingle) — both
    * combiner-friendly; the pair stage joins the deduped table with
    * itself ON THE SHINGLE, so the quadratic term is bounded by
    * (sources-per-shingle choose 2) per shingle — sources are a bounded
    * set (unlike documents), so the join output is at most |sources|^2 x
    * distinct shingles, and in practice shared-shingle mass. No window,
    * no corpus self-join.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    sourceOverlap(Tables.documents(spark, dir))

  /** DataFrame-parametric form — needs (doc_id, source, text). r19: the
    * per-doc shingles come from a range-explode + element_at over the
    * token array (one codegen'd scan stage, zero shuffles) instead of the
    * posexplode + lead-window pass, which shuffled and sorted the whole
    * token stream by (doc_id, pos) first (guide §2.4). Shingle strings
    * are identical, so the (source, sh) set — and every number
    * downstream — is unchanged. The window form survives in
    * [[sourceOverlapFromTokens]] for the corpus-report job, whose shared
    * tokenize pass hands this operator an already-exploded relation.
    */
  def sourceOverlap(documents: DataFrame): DataFrame = {
    val tk = col("_tk")
    sourceOverlapFromShingles(documents
      .select(col("source"), tokens(col("text")).as("_tk"))
      .filter(size(tk) >= 3)
      .select(col("source"),
        explode(sequence(lit(1), size(tk) - 2)).as("_i"), tk)
      .select(col("source"),
        concat_ws(" ", element_at(tk, col("_i")),
          element_at(tk, col("_i") + 1),
          element_at(tk, col("_i") + 2)).as("sh")))
  }

  /** [[sourceOverlap]] over a PRECOMPUTED (doc_id, source, pos, tok)
    * position-explode — the corpus-report composition point.
    */
  def sourceOverlapFromTokens(docToks: DataFrame): DataFrame = {
    // shingles derive per DOCUMENT (a lead over source-pooled tokens would
    // fabricate grams across doc boundaries), then dedup to (source, sh)
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    sourceOverlapFromShingles(docToks
      .withColumn("t1", lead(col("tok"), 1).over(wd))
      .withColumn("t2", lead(col("tok"), 2).over(wd))
      .filter(col("t2").isNotNull)
      .select(col("source"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("sh")))
  }

  /** Shared tail over a raw (source, sh) shingle stream. */
  private def sourceOverlapFromShingles(rawSh: DataFrame): DataFrame = {
    // localCheckpoint the deduped (source, shingle) table: it feeds THREE
    // consumers (both self-join sides + totals), and the self-join's
    // differing aliases defeat exchange reuse — without this the corpus
    // scan + shingle derivation executed three times (seen in explain). At
    // 100 TB write it to parquet and read back instead (the
    // containmentPairs persisted-artifact note).
    val sh = rawSh
      .distinct()
      .localCheckpoint()
    val totals = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.select(col("source").as("source_a"), col("sh"))
      .join(sh.select(col("source").as("source_b"), col("sh")), Seq("sh"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(totals.select(col("source").as("source_a"),
        col("n_sh").as("a_total")), Seq("source_a"))
      .join(totals.select(col("source").as("source_b"),
        col("n_sh").as("b_total")), Seq("source_b"))
      .withColumn("jaccard", graft.functions.round4(
        col("shared").cast("double") /
          (col("a_total") + col("b_total") - col("shared"))))
      .select(col("source_a"), col("source_b"), col("shared"),
        col("a_total"), col("b_total"), col("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Heaps'-law vocabulary-growth exponent (r13): fit `ln V(N) ~ a +
    * beta ln N` where V(N) is the distinct-token vocabulary after the
    * first N corpus tokens (by doc_id order), at 16 evenly-spaced doc-id
    * checkpoints — the companion health check to [[zipfSlope]]: natural
    * text grows sublinearly (beta ~ 0.4-0.6); beta near 1 means the
    * vocabulary is inflating linearly (serial numbers, hashes, noise —
    * content that poisons tokenizers and dedup alike).
    *
    * Scale shape: everything is the combiner idiom — V at a checkpoint is
    * `count(tokens whose FIRST doc <= checkpoint)` over the
    * `min(doc_id) per token` aggregate, and N is the token-count sum
    * below the checkpoint; both broadcast-join against the 16-row
    * checkpoint relation. No window anywhere; the OLS runs on 16 rows
    * with the micro-quantized integer sums of [[zipfSlope]].
    */
  def heapsLaw(spark: SparkSession, dir: String): DataFrame =
    heapsLaw(Tables.documents(spark, dir))

  /** DataFrame-parametric form — needs (doc_id, text). */
  def heapsLaw(documents: DataFrame): DataFrame =
    heapsLawFromTokens(documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("w")),
      documents)

  /** [[heapsLaw]] over a PRECOMPUTED (doc_id, w) token relation; the
    * `documents` frame still supplies max(doc_id) (zero-token docs exist
    * there but not in the explode) — the corpus-report composition point.
    */
  def heapsLawFromTokens(toksDf: DataFrame, documents: DataFrame)
      : DataFrame = {
    val firsts = toksDf.groupBy(col("w"))
      .agg(min(col("doc_id")).as("first_doc"))
    val perDocTok = toksDf.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"))
    // 16 checkpoints at even fractions of max(doc_id) — deterministic
    // integer arithmetic both engines reproduce exactly
    val maxId = documents.agg(max(col("doc_id")).as("m"))
    // floor BOTH engines: DuckDB's CAST(x AS BIGINT) rounds where Spark's
    // cast truncates (the verify_local doctrine)
    val checkpoints = maxId.select(
      explode(sequence(lit(1), lit(16))).as("ck"), col("m"))
      .select(col("ck"),
        floor(col("m") * col("ck") / lit(16.0)).cast("long").as("cut"))
    val vAt = checkpoints.join(firsts, col("first_doc") <= col("cut"))
      .groupBy(col("ck"), col("cut")).agg(count(lit(1)).as("v"))
    val nAt = checkpoints.join(perDocTok, col("doc_id") <= col("cut"))
      .groupBy(col("ck")).agg(sum(col("n_tok")).as("n"))
    val pts = vAt.join(nAt, Seq("ck"))
      .filter(col("n") > 0 && col("v") > 0)
      .select(
        round(log(col("n").cast("double")) * 1e6 + 1e-3).cast("long")
          .as("x_u"),
        round(log(col("v").cast("double")) * 1e6 + 1e-3).cast("long")
          .as("y_u"))
    pts.agg(count(lit(1)).as("n_points"),
        sum(col("x_u")).as("sx"), sum(col("y_u")).as("sy"),
        sum(col("x_u") * col("y_u")).as("sxy"),
        sum(col("x_u") * col("x_u")).as("sxx"))
      .select(col("n_points"),
        graft.functions.round4(
          (col("n_points") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("n_points") * col("sxx") - col("sx") * col("sx"))
            .cast("double")).as("heaps_beta"))
  }

  /** DuckDB mirror of [[heapsLaw]]. */
  val heapsLawSql: String =
    raw"""WITH tok AS (SELECT doc_id, unnest($toks) AS w FROM documents),
       f AS (SELECT w, min(doc_id) AS first_doc FROM tok GROUP BY 1),
       pdt AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1),
       mx AS (SELECT max(doc_id) AS m FROM documents),
       cks AS (SELECT ck, CAST(floor(m * ck / 16.0) AS BIGINT) AS cut
         FROM mx, unnest(range(1, 17)) AS r(ck)),
       vat AS (SELECT c.ck, count(*) AS v FROM cks c
         JOIN f ON f.first_doc <= c.cut GROUP BY 1),
       nat AS (SELECT c.ck, CAST(sum(p.n_tok) AS BIGINT) AS n FROM cks c
         JOIN pdt p ON p.doc_id <= c.cut GROUP BY 1),
       pts AS (SELECT
           CAST(round(ln(CAST(n.n AS DOUBLE)) * 1e6 + 1e-3) AS BIGINT)
             AS x_u,
           CAST(round(ln(CAST(v.v AS DOUBLE)) * 1e6 + 1e-3) AS BIGINT)
             AS y_u
         FROM vat v JOIN nat n USING (ck) WHERE n.n > 0 AND v.v > 0),
       s AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(x_u) AS BIGINT) AS sx, CAST(sum(y_u) AS BIGINT) AS sy,
           CAST(sum(x_u * y_u) AS BIGINT) AS sxy,
           CAST(sum(x_u * x_u) AS BIGINT) AS sxx FROM pts)
       SELECT n_points,
         round(CAST(n_points * sxy - sx * sy AS DOUBLE) /
           CAST(n_points * sxx - sx * sx AS DOUBLE) + 1e-9, 4) + 0.0
           AS heaps_beta
       FROM s"""

  /** Order-aware n-gram novelty (r13): per document, the fraction of its
    * distinct word-3-grams whose FIRST corpus occurrence (by doc_id
    * order) is this document — the admission/curriculum metric a
    * streaming ingest or data-ordering policy reads ("how much of this
    * document is new against everything already admitted"). Complements
    * [[graft.operators.Dedup.softDedupWeights]] (frequency-weighted,
    * order-blind): a verbatim copy of an EARLIER doc scores novelty 0
    * here regardless of how rare its content is corpus-wide.
    *
    * Scale shape: first-occurrence is `min(doc_id)` grouped by shingle —
    * the combiner aggregate + join-back idiom (never a window over the
    * shingle: a boilerplate shingle with 10^8 occurrences is one window
    * task); everything else is per-doc aggregates.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame =
    ngramNovelty(Tables.documents(spark, dir))

  /** DataFrame-parametric form — needs (doc_id, text). */
  def ngramNovelty(documents: DataFrame): DataFrame = {
    val docToks = documents.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val sh = docToks
      .withColumn("t1", lead(col("tok"), 1).over(wd))
      .withColumn("t2", lead(col("tok"), 2).over(wd))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("sh"))
      .distinct()
    val firsts = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
    val perDoc = sh.join(firsts, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    documents.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        graft.functions.round4(coalesce(col("n_novel"), lit(0L)) /
          greatest(coalesce(col("n_shingles"), lit(0L)), lit(1L)))
          .as("novelty"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[ngramNovelty]]. */
  val ngramNoveltySql: String =
    raw"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
       shex AS (SELECT DISTINCT doc_id,
           tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh
         FROM t, unnest(range(1, len(tk) - 1)) AS r(i) WHERE len(tk) >= 3),
       f AS (SELECT sh, min(doc_id) AS first_doc FROM shex GROUP BY 1),
       pd AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel
         FROM shex s JOIN f USING (sh) GROUP BY 1)
       SELECT d.doc_id,
         coalesce(pd.n_shingles, 0) AS n_shingles,
         coalesce(pd.n_novel, 0) AS n_novel,
         round(coalesce(pd.n_novel, 0) * 1.0 /
           greatest(coalesce(pd.n_shingles, 0), 1) + 1e-9, 4) + 0.0
           AS novelty
       FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id"""

  /** Per-source Zipf slope (r13): fit `ln(freq) ~ a + b ln(rank)` over
    * the top-N token frequencies of each source — the corpus-health
    * fingerprint (natural language sits near b = -1; templated or
    * machine-generated sources flatten toward 0, mono-boilerplate
    * steepens). Fitting on the HEAD only is deliberate: the head is where
    * Zipf behavior is diagnostic AND it makes the op scale-shaped — the
    * rank window runs on top-N rows per source (two-phase salted top-k,
    * the [[weightedSample]] pattern), never on a source's full unbounded
    * vocabulary.
    *
    * Determinism: ln(rank)/ln(freq) quantize to integer MICRO-unit longs;
    * the OLS sums (Sx, Sy, Sxy, Sxx) are exact integer arithmetic (max
    * |term| ~ ln(1e15)^2 * 1e12 < 2^63 at micro units with N <= 200), and
    * the slope is one double division of exact integers — identical in
    * both engines.
    */
  def zipfSlope(spark: SparkSession, dir: String, topN: Int = 50)
      : DataFrame = zipfSlope(Tables.documents(spark, dir), topN)

  /** DataFrame-parametric form — needs (source, text). */
  def zipfSlope(documents: DataFrame, topN: Int): DataFrame =
    zipfSlopeFromCounts(documents
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c")), topN)

  /** [[zipfSlope]] over a PRECOMPUTED per-(source, token) count relation
    * (`source`, `w`, `c`) — the corpus-report composition point: the same
    * counts frame feeds [[sourceDivergenceFromCounts]], so one tokenize
    * pass serves both ([[graft.jobs.CorpusReportJob]]).
    */
  def zipfSlopeFromCounts(counts: DataFrame, topN: Int): DataFrame = {
    // two-phase top-N per source (the weightedSample pattern): a source's
    // vocabulary never lands on one window task
    val o1 = Window
      .partitionBy(col("source"), pmod(xxhash64(col("w")), lit(64L)))
      .orderBy(desc("c"), asc("w"))
    val o2 = Window.partitionBy(col("source")).orderBy(desc("c"), asc("w"))
    val head = counts
      .withColumn("_r1", row_number().over(o1)).filter(col("_r1") <= topN)
      .withColumn("rank", row_number().over(o2)).filter(col("rank") <= topN)
    val quant = head.select(col("source"),
      round(log(col("rank").cast("double")) * 1e6 + 1e-3).cast("long")
        .as("x_u"),
      round(log(col("c").cast("double")) * 1e6 + 1e-3).cast("long")
        .as("y_u"))
    quant.groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("x_u")).as("sx"), sum(col("y_u")).as("sy"),
        sum(col("x_u") * col("y_u")).as("sxy"),
        sum(col("x_u") * col("x_u")).as("sxx"))
      .select(col("source"), col("n_terms"),
        graft.functions.round4(
          (col("n_terms") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("n_terms") * col("sxx") - col("sx") * col("sx"))
            .cast("double")).as("zipf_slope"))
      .orderBy("source")
  }

  /** DuckDB mirror of [[zipfSlope]] at topN = 50. */
  val zipfSlopeSql: String =
    raw"""WITH tok AS (SELECT source, unnest($toks) AS w FROM documents),
       cnt AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
       rk AS (SELECT source, c,
           row_number() OVER (PARTITION BY source
             ORDER BY c DESC, w ASC) AS rank FROM cnt),
       q AS (SELECT source,
           CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6 + 1e-3) AS BIGINT)
             AS x_u,
           CAST(round(ln(CAST(c AS DOUBLE)) * 1e6 + 1e-3) AS BIGINT)
             AS y_u
         FROM rk WHERE rank <= 50),
       s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(x_u) AS BIGINT) AS sx, CAST(sum(y_u) AS BIGINT) AS sy,
           CAST(sum(x_u * y_u) AS BIGINT) AS sxy,
           CAST(sum(x_u * x_u) AS BIGINT) AS sxx
         FROM q GROUP BY 1)
       SELECT source, n_terms,
         round(CAST(n_terms * sxy - sx * sy AS DOUBLE) /
           CAST(n_terms * sxx - sx * sx AS DOUBLE) + 1e-9, 4) + 0.0
           AS zipf_slope
       FROM s ORDER BY source"""

  /** Weighted reservoir sample per source (r13): k documents per source,
    * sampled WITHOUT replacement proportionally to a per-document weight
    * — the consumer of [[graft.operators.Dedup.softDedupWeights]]-style
    * reweighting ("sample the corpus under the dedup weights" is the step
    * between weighting and training). Efraimidis & Spirtakis 2006 A-ES
    * keys: `key = u^(1/w)` with u a deterministic md5 draw; the k largest
    * keys per source ARE a weight-proportional without-replacement sample,
    * and determinism makes the op replayable and oracle-checkable.
    *
    * Scale shape — the top-k-per-group pattern done skew-aware: a plain
    * `row_number over (partition by source)` puts a 10^10-doc source on
    * one task. Instead, phase 1 takes the per-(source, salt-of-64) top-k
    * on bounded partitions; phase 2 re-ranks the <= 64k survivors per
    * source — the second window sees k x 64 rows per source regardless of
    * corpus size. Both phases are windows over BOUNDED partitions; the
    * oracle uses the single-window form (fine at oracle SF), equality is
    * structural (phase 1 can only discard rows that phase 2's global
    * top-k would discard anyway).
    *
    * Determinism: the A-ES key quantizes to an integer nano-unit long
    * (`round(pow(u, 1/w) * 1e9 + 1e-3)`), ties break on doc_id — exact
    * integer compares in both engines. The demo weight is a deterministic
    * function of n_chars so the oracle can mirror it; production callers
    * pass a real weight column via the DataFrame form.
    */
  def weightedSample(spark: SparkSession, dir: String,
      k: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("w", (pmod(col("n_chars"), lit(7)) + 1).cast("double"))
    weightedSample(docs, k)
  }

  /** DataFrame-parametric form — needs (doc_id, source, w > 0). */
  def weightedSample(documents: DataFrame, k: Int): DataFrame = {
    val u = graft.functions.TextFunctions
      .md5Bucket("ws#", col("doc_id"), 1000000).cast("double") / 1e6
    val keyed = documents.withColumn("key_u",
      round(pow(u, lit(1.0) / col("w")) * 1e9 + 1e-3).cast("long"))
    val o1 = Window
      .partitionBy(col("source"), pmod(xxhash64(col("doc_id")), lit(64L)))
      .orderBy(desc("key_u"), asc("doc_id"))
    val o2 = Window.partitionBy(col("source"))
      .orderBy(desc("key_u"), asc("doc_id"))
    keyed
      .withColumn("_r1", row_number().over(o1)).filter(col("_r1") <= k)
      .withColumn("rank", row_number().over(o2)).filter(col("rank") <= k)
      .select(col("source"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("key_u"),
        graft.functions.round4(col("w")).as("w"))
      .orderBy("source", "rank")
  }

  /** DuckDB mirror of [[weightedSample]] at k = 10. */
  val weightedSampleSql: String =
    """WITH keyed AS (SELECT doc_id, source,
         CAST(n_chars % 7 + 1 AS DOUBLE) AS w,
         CAST(round(pow((('0x' || substr(md5('ws#' || CAST(doc_id AS VARCHAR)),
             1, 15))::BIGINT % 1000000) / 1e6,
           1.0 / (n_chars % 7 + 1)) * 1e9 + 1e-3) AS BIGINT) AS key_u
         FROM documents),
       rk AS (SELECT source, doc_id, key_u, w,
           row_number() OVER (PARTITION BY source
             ORDER BY key_u DESC, doc_id ASC) AS rank FROM keyed)
       SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, key_u,
         round(w + 1e-9, 4) + 0.0 AS w
       FROM rk WHERE rank <= 10 ORDER BY source, rank"""

  /** Pairwise source unigram KL divergence (r13): for every source pair,
    * `KL(a || b) = sum_w p_a(w) ln(p_a(w) / p_b(w))` over the UNION
    * vocabulary with add-one smoothing — the distributional companion to
    * [[sourceOverlap]]'s set-level Jaccard (overlap says whether sources
    * share literal content; divergence says whether they speak the same
    * distribution — two paraphrase-mirrors of one crawl have low KL and
    * low Jaccard, a giveaway no single diagnostic catches). Reported both
    * directions per pair (KL is asymmetric).
    *
    * Determinism (the DSIR idiom): each per-token term quantizes to an
    * integer NANO-unit long (`round(term * 1e9 + 1e-3)`), so the
    * per-pair accumulation is exact integer arithmetic under any
    * partition-merge order, and a 1-ulp cross-engine `ln` disagreement
    * cannot straddle a rounding tie. Every float expression is written
    * token-for-token identically in the oracle.
    *
    * Scale shape: token counts are one combiner aggregate; the union-
    * vocabulary grid is |vocab| x |sources| rows (sources are a bounded
    * set) and the pair join keys on the token — linear in vocabulary,
    * never quadratic in corpus.
    */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame =
    sourceDivergence(Tables.documents(spark, dir))

  /** DataFrame-parametric form — needs (source, text). */
  def sourceDivergence(documents: DataFrame): DataFrame =
    sourceDivergenceFromCounts(documents
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c")))

  /** [[sourceDivergence]] over a PRECOMPUTED (source, w, c) count
    * relation — see [[zipfSlopeFromCounts]].
    */
  def sourceDivergenceFromCounts(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("t"))
    val vocabSize = counts.select(col("w")).distinct()
      .agg(count(lit(1)).as("v"))
    // full (source, token) grid over the union vocabulary, zero-filled —
    // smoothing needs the absent-token rows
    val grid = counts.select(col("w")).distinct()
      .crossJoin(totals)
      .join(counts, Seq("source", "w"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(vocabSize))
      .select(col("source"), col("w"),
        ((col("c") + 1.0) / (col("t") + col("v"))).as("p"))
    val a = grid.select(col("source").as("source_a"), col("w"),
      col("p").as("pa"))
    val b = grid.select(col("source").as("source_b"), col("w"),
      col("p").as("pb"))
    a.join(b, Seq("w")).filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        round(col("pa") * log(col("pa") / col("pb")) * 1e9 + 1e-3)
          .cast("long").as("tab_u"),
        round(col("pb") * log(col("pb") / col("pa")) * 1e9 + 1e-3)
          .cast("long").as("tba_u"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("tab_u")).as("ab_u"), sum(col("tba_u")).as("ba_u"))
      .select(col("source_a"), col("source_b"),
        graft.functions.round4(col("ab_u") / 1e9).as("kl_ab"),
        graft.functions.round4(col("ba_u") / 1e9).as("kl_ba"))
      .orderBy("source_a", "source_b")
  }

  /** DuckDB mirror of [[sourceDivergence]]. */
  val sourceDivergenceSql: String =
    raw"""WITH tok AS (SELECT source, unnest($toks) AS w FROM documents),
       cnt AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
       tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM cnt
         GROUP BY 1),
       voc AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM cnt),
       grid AS (SELECT s.source, vv.w,
           (coalesce(c.c, 0) + 1.0) / (s.t + voc.v) AS p
         FROM (SELECT DISTINCT w FROM cnt) vv
         CROSS JOIN tot s CROSS JOIN voc
         LEFT JOIN cnt c ON c.source = s.source AND c.w = vv.w),
       terms AS (SELECT a.source AS source_a, b.source AS source_b,
           CAST(round(a.p * ln(a.p / b.p) * 1e9 + 1e-3) AS BIGINT) AS tab_u,
           CAST(round(b.p * ln(b.p / a.p) * 1e9 + 1e-3) AS BIGINT) AS tba_u
         FROM grid a JOIN grid b ON a.w = b.w AND a.source < b.source)
       SELECT source_a, source_b,
         round(CAST(sum(tab_u) AS DOUBLE) / 1e9 + 1e-9, 4) + 0.0 AS kl_ab,
         round(CAST(sum(tba_u) AS DOUBLE) / 1e9 + 1e-9, 4) + 0.0 AS kl_ba
       FROM terms GROUP BY 1, 2 ORDER BY 1, 2"""

  /** DuckDB mirror of [[sourceOverlap]]. */
  val sourceOverlapSql: String =
    raw"""WITH t AS (SELECT doc_id, source,
         regexp_split_to_array(lower(trim(text)), '\s+') AS tk FROM documents),
       shex AS (SELECT DISTINCT source,
           tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh
         FROM t, unnest(range(1, len(tk) - 1)) AS r(i) WHERE len(tk) >= 3),
       tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sh FROM shex
         GROUP BY 1),
       p AS (SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS shared
         FROM shex a JOIN shex b ON a.sh = b.sh AND a.source < b.source
         GROUP BY 1, 2)
       SELECT p.source_a, p.source_b, p.shared,
         ta.n_sh AS a_total, tb.n_sh AS b_total,
         round(p.shared * 1.0 / (ta.n_sh + tb.n_sh - p.shared) + 1e-9, 4)
           + 0.0 AS jaccard
       FROM p JOIN tot ta ON ta.source = p.source_a
       JOIN tot tb ON tb.source = p.source_b
       ORDER BY 1, 2"""
}
