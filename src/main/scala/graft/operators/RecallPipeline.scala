package graft.operators

import graft.Tables
import graft.domain.Scoring
import graft.functions.TextFunctions
import graft.functions.round4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The recall scoring pipeline (SURVEY §2.4-§2.5) run end-to-end under the
  * DuckDB oracle: the documents table is mapped to a memories relation
  * (id/content/tags/importance/confidence/timestamp), then the keyword
  * channel -> component scoring -> fingerprint dedup -> rank -> top-k chain
  * executes with the SAME library code paths used by `graft.domain.Recall`
  * (keywordRawScore, Scoring.recency/tagScore, fingerprint), mirrored
  * term-for-term in SQL.
  */
object RecallPipeline {

  val Query = "spark join window"
  val QueryTokens: Seq[String] = Seq("spark", "join", "window")
  private val NowLit = "2024-02-01 00:00:00"
  val Limit = 20

  def recallDocuments(spark: SparkSession, dir: String): DataFrame = {
    // documents -> memories mapping
    val mems = Tables.documents(spark, dir)
      .withColumn("tags", array(col("lang"), col("source"),
        element_at(TextFunctions.tokens(col("text")), 1)))
      .withColumn("importance", least(lit(1.0), col("n_chars") / 500.0))
      .withColumn("confidence", lit(0.7))
      .withColumn("timestamp",
        to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(lit(0), lit(0), col("doc_id").cast("int"), lit(0)))
    // keyword channel (Q3): raw score > 0 keeps the row; normalized by the
    // THEORETICAL content-side maximum (+2 per keyword, +2 phrase) — a
    // per-query constant, so no max-aggregate pass over the candidates
    val kwMax = 2.0 * QueryTokens.length + 2.0
    val normalized = mems.withColumn("kw_raw",
        TextFunctions.keywordRawScore(col("text"), QueryTokens, Query))
      .filter(col("kw_raw") > 0)
      .withColumn("kw", least(lit(1.0), col("kw_raw").cast("double") / lit(kwMax)))
    // component scoring (§2.5)
    val ageDays = (unix_millis(to_timestamp(lit(NowLit))) -
      unix_millis(col("timestamp"))) / 86400000.0
    val scored = normalized
      .withColumn("tag_score", Scoring.tagScore(QueryTokens, col("tags")))
      .withColumn("recency", Scoring.recency(ageDays))
      .withColumn("final_score",
        col("kw") * 0.35 + col("tag_score") * 0.2 + col("importance") * 0.1 +
          col("confidence") * 0.05 + col("recency") * 0.1)
    // R1 fingerprint dedup keep-best, R2 sort, top-k. Keep-best is ONE
    // max_by hash aggregate over the corpus-wide fingerprint key, never a
    // row_number window partitioned by fp: a boilerplate page duplicated
    // 10^7x is one fingerprint, and a window would sort that whole group
    // on a single task (the r13/r14 hot-key doctrine; same fix as
    // Dedup.fingerprintDedup and TextPolicy.hygieneStaged).
    scored.withColumn("fp", TextFunctions.fingerprint(col("text"), 320))
      .groupBy(col("fp"))
      .agg(max_by(
        struct(col("doc_id"), col("final_score"), col("kw"),
          col("tag_score"), col("recency")),
        // keep-best order: final_score desc, timestamp desc, doc_id asc
        struct(col("final_score"), col("timestamp"), -col("doc_id")))
        .as("best"))
      .select(col("best.doc_id").as("doc_id"),
        round4(col("best.final_score")).as("score"),
        round4(col("best.kw")).as("kw"),
        round4(col("best.tag_score")).as("tag_score"),
        round4(col("best.recency")).as("recency"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(Limit)
  }

  /** Throughput demonstrator: 100 recall requests against the documents
    * corpus executed as ONE plan via [[graft.domain.BatchRecall]] — queries
    * fabricated deterministically from the first tokens of the first 100
    * docs. Memory and query vectors come from the `embeddings` parquet table
    * (joined on doc_id = vec_id; the query vector is its doc's embedding —
    * "find documents like this one"), which a SQL engine can read too — so
    * the WHOLE two-channel pipeline is DuckDB-oracle-gated (rows + schema +
    * hash), not rows-only. `roundScores` quantizes scores to 4 decimals
    * before ranking so rank order is reproducible across engines.
    */
  /** The (memories, queries) inputs of [[batchRecall100]], factored out so
    * the IVF A/B probe (`tools.BatchRecallIvfProbe`) drives the IDENTICAL
    * corpus and request mix the oracle-gated query runs. Memories come back
    * cached (caller unpersists).
    */
  def batchRecall100Inputs(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val mems = Tables.documents(spark, dir)
      .join(emb, col("doc_id") === col("vec_id"))
      .select(
        col("doc_id").cast("string").as("id"),
        col("text").as("content"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(lit(0), lit(0), col("doc_id").cast("int"), lit(0)))
          .as("timestamp"),
        least(lit(1.0), col("n_chars") / 500.0).as("importance"),
        lit(0.7).as("confidence"),
        lit("Context").as("type"),
        array(col("lang"), col("source")).as("tags"),
        // Q5 sidecar: each doc's SECOND token as a {"project": ...} value —
        // single-token values make MetadataScoring.matchScore reduce to a
        // closed form the DuckDB oracle states exactly (see batchRecall100Sql)
        when(length(coalesce(get(TextFunctions.tokens(col("text")), lit(1)),
            lit(""))) > 0,
          concat(lit("{\"project\": \""),
            get(TextFunctions.tokens(col("text")), lit(1)), lit("\"}")))
          .otherwise(lit("{}")).as("metadata"),
        lit(1.0).as("relevance_score"),
        lit(false).as("archived"),
        col("embedding"))
      .withColumn("t_invalid", lit(null).cast("timestamp"))
      .withColumn("last_accessed", col("timestamp"))
      // the test file is a single parquet split -> 1 cached partition, which
      // would serialize every downstream per-partition stage (cross-join
      // cosine, postings explode) onto one task; spread it across the cores
      // first (at real scale the input arrives already multi-split)
      .repartition(8)
      .cache()
    val queries = Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
      .join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(graft.functions.TextFunctions.tokens(col("text")), 1, 3))
          .as("query"),
        col("embedding").as("qvec"))
    (mems, queries)
  }

  def batchRecall100(spark: SparkSession, dir: String): DataFrame = {
    import graft.domain.BatchRecall
    val (mems, queries) = batchRecall100Inputs(spark, dir)
    BatchRecall.batchRecall(mems, spark.emptyDataFrame, queries, limit = 5,
      now = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
      roundScores = true)
      .orderBy("qid", "rank")
  }

  /** DuckDB mirror of [[batchRecall100]]: the full three-channel batch —
    * vector cosine top-20 per qid + inverted-keyword scoring (+2 content
    * token, +1 tag token, phrase bonus, per-qid max-normalize) + the Q5
    * metadata channel (prefilter -> asc-id scan cap -> strong-evidence
    * score, stated in closed form because every sidecar value is a single
    * token — see the mdscore CTE), channel merge, 9-component scoring
    * (relation/context zero on this corpus mapping; metadata, tag-term-set
    * and exact all live), fingerprint dedup per (qid, fp), and per-qid
    * rank — term-for-term against `graft.domain.BatchRecall.batchRecall`
    * with `roundScores=true` (all compared scores quantized via
    * round(x+1e-9,4) before ranking, asc-id tie-breaks everywhere).
    */
  val batchRecall100Sql: String =
    raw"""WITH mems AS (
         SELECT CAST(d.doc_id AS VARCHAR) AS id, lower(d.text) AS lc, d.text,
           TIMESTAMP '2024-01-01 00:00:00' + to_minutes(d.doc_id) AS ts,
           least(1.0, d.n_chars / 500.0) AS importance, 0.7 AS confidence,
           [d.lang, d.source] AS tags, e.embedding AS emb
         FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
       mems_md AS (
         -- the Q5 sidecar: second text token as {"project": ...}; single-
         -- token values reduce matchScore to the closed form in mdscore
         SELECT id, val, CASE WHEN val IS NOT NULL AND length(val) > 0
             THEN '{"project": "' || val || '"}' ELSE '{}' END AS md
         FROM (SELECT id, regexp_split_to_array(trim(lc), '\s+')[2] AS val
               FROM mems)),
       q0 AS (
         SELECT d.doc_id AS qid,
           array_to_string(regexp_split_to_array(trim(lower(d.text)), '\s+')[1:3], ' ') AS query,
           e.embedding AS qvec
         FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
         WHERE d.doc_id < 100),
       qtok AS (
         -- [a-z0-9]+ runs, mirroring Recall.keywords / utils/text.py:81-101
         SELECT qid, tok FROM (
           SELECT qid, unnest(list_distinct(regexp_extract_all(query, '[a-z0-9]+'))) AS tok
           FROM q0)
         WHERE length(tok) >= 3 AND tok NOT IN ('the','and','for','with','that',
           'this','from','was','are','has','had','were','will','would','into','about')),
       qtl AS (
         SELECT q0.qid, coalesce(l.toks, []) AS toks,
           CASE WHEN coalesce(len(l.toks), 0) > 0
             THEN 3.0 * len(l.toks) +
               (CASE WHEN length(trim(q0.query)) >= 3 THEN 3.0 ELSE 0.0 END)
             ELSE 3.0 END AS kw_max
         FROM q0 LEFT JOIN
           (SELECT qid, list(tok) AS toks FROM qtok GROUP BY qid) l ON l.qid = q0.qid),
       qmeta AS (
         -- metadata-channel query terms (runtime_recall_helpers.py:123-199):
         -- qvt = value tokens (>= 3 chars, field tokens + metadata stopwords
         -- removed); pterms = prefilter terms (>= 2 chars, same removals,
         -- cap 12 -- never binding on 3-token queries, so the unordered
         -- list_distinct is safe); qall = every normalized token
         SELECT qid, query,
           list_distinct(list_filter(regexp_extract_all(query, '[a-z0-9]+'),
             t -> length(t) >= 3
               AND t NOT IN ('source','agent','agents','repo','repository',
                 'project','tool','surface','applies','apply','trigger',
                 'provider','model','entity','entities','metadata')
               AND t NOT IN ('all','any','about','by','find','for','from','in',
                 'me','memory','memories','of','on','please','show','that',
                 'the','to','with'))) AS qvt,
           list_filter(list_distinct(regexp_extract_all(query, '[a-z0-9]+')),
             t -> length(t) >= 2
               AND t NOT IN ('source','agent','agents','repo','repository',
                 'project','tool','surface','applies','apply','trigger',
                 'provider','model','entity','entities','metadata')
               AND t NOT IN ('all','any','about','by','find','for','from','in',
                 'me','memory','memories','of','on','please','show','that',
                 'the','to','with')) AS pterms,
           regexp_extract_all(query, '[a-z0-9]+') AS qall
         FROM q0),
       qreq AS (
         -- requestedFields (runtime_recall_helpers.py:202-231): req_project
         -- is the only field present in this corpus mapping; req_any covers
         -- every single-word alias plus the multi-word phrase aliases
         SELECT qid, qvt, pterms,
           list_contains(qall, 'project') AS req_project,
           (list_contains(qall, 'project')
             OR list_has_any(qall, ['source','repo','repository','tool',
               'surface','trigger','provider','model','entity','entities'])
             OR contains(' ' || query || ' ', ' source agent ')
             OR contains(' ' || query || ' ', ' source agents ')
             OR contains(' ' || query || ' ', ' applies to ')
             OR contains(' ' || query || ' ', ' apply to ')) AS req_any
         FROM qmeta),
       mdsurv AS (
         -- contains-prefilter on the raw JSON + deterministic asc-id scan cap
         -- (batch twin of Recall.metadataChannel's scanCap=200 at limit=5)
         SELECT qid, id, val, qvt, req_any, req_project,
           row_number() OVER (PARTITION BY qid ORDER BY id ASC) AS scan_rn
         FROM mems_md m JOIN qreq q
           ON len(q.pterms) > 0
             AND len(list_filter(q.pterms, t -> contains(m.md, t))) > 0),
       mdscore AS (
         -- matchScore closed form for single-token values: valueHits = {val}
         -- iff val in qvt (so exactHit always holds); strongEvidence reduces
         -- to (requested & project named & len>=3) OR (no fields named &
         -- len>=5 & |qvt|<=3); weak off-field hits (req_any & !req_project)
         -- are excluded; score = min(1, .15 + .45 + .20/|qvt| + .15 exact
         -- + .20 requested-field bonus)
         SELECT qid, id,
           round((least(1.0, 0.75 + 0.20 / len(qvt) +
             CASE WHEN req_any AND req_project THEN 0.20 ELSE 0.0 END)) + 1e-9, 4) + 0.0 AS ms
         FROM mdsurv
         WHERE scan_rn <= 200 AND len(qvt) > 0 AND list_contains(qvt, val)
           AND ((req_any AND req_project)
             OR ((NOT req_any) AND length(val) >= 5 AND len(qvt) <= 3))),
       mtop AS (SELECT qid, id, ms FROM (
           SELECT qid, id, ms,
             row_number() OVER (PARTITION BY qid ORDER BY ms DESC, id ASC) AS rn
           FROM mdscore WHERE ms > 0) WHERE rn <= 20),
       vpx AS (SELECT q.qid, m.id, unnest(m.emb)::DOUBLE AS x, unnest(q.qvec)::DOUBLE AS y
         FROM mems m CROSS JOIN q0 q),
       vs AS (SELECT qid, id, sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny
         FROM vpx GROUP BY 1, 2),
       vecc AS (SELECT qid, id,
           round((CASE WHEN nx = 0 OR ny = 0 THEN 0
             ELSE dot / (sqrt(nx) * sqrt(ny)) END) + 1e-9, 4) + 0.0 AS cs
         FROM vs),
       vtop AS (SELECT qid, id, cs FROM (
           SELECT qid, id, cs,
             row_number() OVER (PARTITION BY qid ORDER BY cs DESC, id ASC) AS rn
           FROM vecc) WHERE rn <= 20),
       ctoks AS (SELECT id,
           unnest(list_distinct(regexp_split_to_array(trim(lc), '\s+'))) AS ctok
         FROM mems),
       qd AS (SELECT DISTINCT tok FROM qtok),
       chits AS (SELECT DISTINCT c.id, q.tok
         FROM ctoks c JOIN qd q ON contains(c.ctok, q.tok)),
       ttoks AS (SELECT id, unnest(tags) AS tag FROM mems),
       thits AS (SELECT DISTINCT t.id, q.tok
         FROM ttoks t JOIN qd q ON contains(t.tag, q.tok)),
       tw AS (SELECT id, tok, 2 AS w FROM chits
         UNION ALL SELECT id, tok, 1 AS w FROM thits),
       traw AS (SELECT q.qid, h.id, sum(h.w) AS tok_raw
         FROM tw h JOIN qtok q ON q.tok = h.tok GROUP BY 1, 2),
       eq AS (SELECT qid FROM q0 WHERE qid NOT IN (SELECT qid FROM qtok)),
       epairs AS (SELECT e.qid, m.id, 0 AS tok_raw FROM eq e CROSS JOIN mems m),
       cand AS (SELECT * FROM traw UNION ALL SELECT * FROM epairs),
       kwall AS (SELECT c.qid, c.id,
           c.tok_raw + (CASE WHEN length(trim(q.query)) >= 3
             THEN (CASE WHEN contains(m.lc, trim(q.query)) THEN 2 ELSE 0 END) +
                  (CASE WHEN contains(array_to_string(m.tags, chr(0)), trim(q.query)) THEN 1 ELSE 0 END)
             ELSE 0 END) AS raw
         FROM cand c JOIN mems m ON m.id = c.id JOIN q0 q ON q.qid = c.qid),
       kwn AS (SELECT k.qid, k.id,
           round((least(1.0, CAST(k.raw AS DOUBLE) / t.kw_max)) + 1e-9, 4) + 0.0 AS ks
         FROM kwall k JOIN qtl t ON t.qid = k.qid WHERE k.raw > 0),
       ktop AS (SELECT qid, id, ks FROM (
           SELECT k.qid, k.id, k.ks,
             row_number() OVER (PARTITION BY k.qid ORDER BY k.ks DESC,
               m.importance DESC, m.ts DESC, k.id ASC) AS rn
           FROM kwn k JOIN mems m ON m.id = k.id) WHERE rn <= 20),
       merged AS (SELECT qid, id,
           max(CASE WHEN ch = 'v' THEN s END) AS vector_score,
           max(CASE WHEN ch = 'k' THEN s END) AS keyword_score,
           max(CASE WHEN ch = 'm' THEN s END) AS metadata_score
         FROM (SELECT qid, id, 'v' AS ch, cs AS s FROM vtop
               UNION ALL SELECT qid, id, 'k' AS ch, ks AS s FROM ktop
               UNION ALL SELECT qid, id, 'm' AS ch, ms AS s FROM mtop)
         GROUP BY 1, 2),
       hyd AS (SELECT g.qid, g.id, g.vector_score, g.keyword_score,
           g.metadata_score,
           CASE WHEN g.vector_score IS NOT NULL THEN 'vector'
                WHEN g.keyword_score IS NOT NULL THEN 'keyword'
                ELSE 'metadata' END AS match_type,
           m.lc, m.text, m.ts, m.importance, m.confidence, m.tags,
           d.val, q.query, t.toks
         FROM merged g JOIN mems m ON m.id = g.id
           JOIN mems_md d ON d.id = g.id
           JOIN q0 q ON q.qid = g.qid JOIN qtl t ON t.qid = g.qid),
       comps AS (SELECT *,
           coalesce(vector_score, 0.0) AS c_vector,
           coalesce(keyword_score,
             CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks, tk -> contains(lc, tk))) AS DOUBLE)
                 / len(toks) END) AS c_keyword,
           coalesce(metadata_score, 0.0) AS c_metadata,
           -- tag component counts query tokens in tags OR metadata TERMS
           -- (scoring.py:150-153); collectTerms({"project": val}) = {val}
           CASE WHEN len(toks) = 0 THEN 0.0
             ELSE CAST(len(list_intersect(toks,
               CASE WHEN val IS NOT NULL AND length(val) > 0
                 THEN list_distinct(tags || [val]) ELSE tags END)) AS DOUBLE)
               / len(toks) END AS c_tag,
           greatest(0.0, 1.0 - greatest(0.0, (epoch(TIMESTAMP '2024-02-01 00:00:00') - epoch(ts))
             / 86400.0) / 180.0) AS c_recency,
           -- exact = whole trimmed query in the metadata term set = {val}
           CASE WHEN length(trim(query)) > 0 AND trim(query) = val
             THEN 1.0 ELSE 0.0 END AS c_exact
         FROM hyd),
       scored AS (SELECT qid, id, match_type, importance, ts, text,
           round((coalesce(vector_score, 0.0)) + 1e-9, 4) + 0.0 AS s_vector,
           round((c_keyword) + 1e-9, 4) + 0.0 AS s_keyword,
           round((c_tag) + 1e-9, 4) + 0.0 AS s_tag,
           round((c_vector * 0.35 + c_keyword * 0.35 + c_metadata * 0.35 + 0.0 * 0.25 +
             (c_tag * 0.2 + importance * 0.1 + confidence * 0.05 +
              c_recency * 0.1 + 1.0 * 0.0) * 1.0 + c_exact * 0.2 + 0.0) + 1e-9, 4) + 0.0
             AS final_score
         FROM comps),
       fps AS (SELECT *,
           CASE WHEN length(substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 320)) > 0
             THEN substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 320)
             ELSE id END AS fp
         FROM scored),
       dd AS (SELECT *, row_number() OVER (PARTITION BY qid, fp
           ORDER BY final_score DESC, ts DESC, id ASC) AS dd_rn FROM fps),
       ranked AS (SELECT qid, id, final_score, match_type, s_vector, s_keyword, s_tag,
           row_number() OVER (PARTITION BY qid ORDER BY final_score DESC,
             (CASE WHEN match_type = 'vector' THEN 0 ELSE 1 END) ASC,
             importance DESC, ts DESC, id ASC) AS rank
         FROM dd WHERE dd_rn = 1)
       SELECT qid, rank, id, final_score, match_type, s_vector, s_keyword, s_tag
       FROM ranked WHERE rank <= 5 ORDER BY qid, rank"""

  val recallDocumentsSql: String = {
    val toks = raw"regexp_split_to_array(lower(trim(text)), '\s+')"
    s"""WITH mems AS (SELECT doc_id, text,
         [lang, source, $toks[1]] AS tags,
         least(1.0, n_chars / 500.0) AS importance,
         0.7 AS confidence,
         TIMESTAMP '2024-01-01 00:00:00' + to_minutes(doc_id) AS ts
       FROM documents),
       raw AS (SELECT *,
         (CASE WHEN contains(lower(text), 'spark') THEN 2 ELSE 0 END +
          CASE WHEN contains(lower(text), 'join') THEN 2 ELSE 0 END +
          CASE WHEN contains(lower(text), 'window') THEN 2 ELSE 0 END +
          CASE WHEN contains(lower(text), 'spark join window') THEN 2 ELSE 0 END) AS kw_raw
       FROM mems),
       cand AS (SELECT * FROM raw WHERE kw_raw > 0),
       scored AS (SELECT *,
         least(1.0, CAST(kw_raw AS DOUBLE) / 8.0) AS kw,
         (CASE WHEN list_contains(tags, 'spark') THEN 1 ELSE 0 END +
          CASE WHEN list_contains(tags, 'join') THEN 1 ELSE 0 END +
          CASE WHEN list_contains(tags, 'window') THEN 1 ELSE 0 END) / CAST(3 AS DOUBLE) AS tag_score,
         greatest(0.0, 1.0 - greatest(0.0, (epoch_ms(TIMESTAMP '2024-02-01 00:00:00') - epoch_ms(ts))
           / 86400000.0) / 180.0) AS recency
       FROM cand),
       final AS (SELECT doc_id, text, ts,
         kw * 0.35 + tag_score * 0.2 + importance * 0.1 +
           confidence * 0.05 + recency * 0.1 AS final_score,
         kw, tag_score, recency,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 320) AS fp
       FROM scored),
       deduped AS (SELECT *, row_number() OVER (PARTITION BY fp
           ORDER BY final_score DESC, ts DESC, doc_id ASC) AS rn FROM final)
       SELECT doc_id, round((final_score) + 1e-9, 4) + 0.0 AS score,
         round((kw) + 1e-9, 4) + 0.0 AS kw, round((tag_score) + 1e-9, 4) + 0.0 AS tag_score,
         round((recency) + 1e-9, 4) + 0.0 AS recency
       FROM deduped WHERE rn = 1
       ORDER BY score DESC, doc_id ASC LIMIT $Limit"""
  }
}
