package graft

import graft.functions.TextFunctions
import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is a thin wiring of a library operator from
  * `graft.operators` / `graft.functions`; `oracleSql` carries the equivalent
  * DuckDB SQL. Floating-point aggregates are integerized per row (exact
  * cents) or rounded after bit-stable mirrored arithmetic so the driver's
  * hash compare is deterministic across engines and partition orders.
  */
object SparkEntry {

  /** Flagship: the recall scoring pipeline end-to-end on sf=0.001 (rows>0). */
  def entry(spark: SparkSession): DataFrame =
    RecallPipeline.recallDocuments(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.pricingSummary _),
    "q_f1_time_window" -> (Relational.timeWindowAgg _),
    "q_s3_point" -> (Relational.pointLookup _),
    "q_s4_page" -> (Relational.page _),
    "q_j_broadcast_brand" -> (Relational.brandRevenue _),
    "q_j_semi_anti" -> (Relational.semiAntiCustomers _),
    "q_j1_topk_per_group" -> ((s, d) => Relational.topOrdersPerCustomer(s, d)),
    "q_a5_hour_hist" -> (Relational.hourHistogram _),
    "q_a6_word_freq" -> ((s, d) => Relational.wordFrequency(s, d)),
    "q_e1_trailing_window" -> (Relational.trailingWindowCount _),
    "q_set_except" -> (Relational.setDiffCustomers _),
    "q_j6_multihop" -> (Relational.multiHopRevenue _),
    "q_dedup_exact" -> (Dedup.exactDupGroups _),
    "q_dedup_fingerprint" -> (Dedup.fingerprintDedup _),
    "q_dedup_minhash" -> ((s, d) => Dedup.minhashGroups(s, d)),
    "q_dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "q_sim_topk" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "q_sim_bucket_pairs" -> ((s, d) => Similarity.bucketedNearDupPairs(s, d, threshold = 0.3)),
    "q_text_stats" -> (TextAnalysis.docStats _),
    "q_lang_id" -> (TextAnalysis.langPrediction _),
    "q_q3_keyword" -> (TextAnalysis.keywordSearch _),
    "q_a1_count_by_type" -> (Analytics.countByType _),
    "q_a3_importance_dist" -> (Analytics.importanceDistribution _),
    "q_a4_confidence_dist" -> (Analytics.confidenceDistribution _),
    "q_a8_recent_by_day" -> (Analytics.recentByDay _),
    "q_a9_rel_count" -> (Analytics.relCountPerKey _),
    "q_date_parts" -> (Analytics.dateParts _),
    "q_c1_decay" -> (Maintenance.decayScores _),
    "q_c4_forget" -> (Maintenance.forgetFates _),
    "q_c2_creative_pairs" -> (Maintenance.creativePairs _),
    "q_q4_trending" -> (RecallShapes.trending _),
    "q_q5_metadata" -> (RecallShapes.metadataSearch _),
    "q_r3_minmax" -> (RecallShapes.minMaxRerank _),
    "q_r5_priority" -> (RecallShapes.priorityGuarantee _),
    "q_j3_entity_expand" -> (RecallShapes.entityExpansion _),
    "q_r4_gap_floor" -> (RecallShapes.largestGap _),
    "q_r6_scope_fallback" -> ((s, d) => RecallShapes.scopeFallback(s, d)),
    "q_j4_supersession_head" -> (RecallShapes.supersessionHeads _),
    "q_j2_seed_expansion" -> (RecallShapes.seedExpansion _),
    "q_f2_tag_filters" -> (RecallShapes.tagFilters _),
    "q_set_intersect" -> (RecallShapes.setIntersect _),
    "q_u5_snippet" -> (RecallShapes.snippets _),
    "q_recall_pipeline" -> (RecallPipeline.recallDocuments _),
    "q_sim_ivf_centroid" -> (Similarity.labelCentroidSim _),
    "q_sim_ivf_topk" -> ((s, d) => Similarity.ivfTopKAll(s, d)),
    "q_sim_ivf_quantized" -> ((s, d) => Similarity.ivfQuantizedTopKAll(s, d)),
    "q_dedup_simhash" -> ((s, d) => Dedup.simhashGroups(s, d)),
    "q_batch_recall_100q" -> (RecallPipeline.batchRecall100 _),
    "q_bm25_topk" -> (TextSearch.bm25Query _),
    "q_shard_pack" -> (TextAnalysis.shardPack _),
    "q_source_overlap" -> ((s, d) => TextAnalysis.sourceOverlap(s, d)),
    "q_source_kl" -> ((s, d) => TextAnalysis.sourceDivergence(s, d)),
    "q_weighted_sample" -> ((s, d) => TextAnalysis.weightedSample(s, d)),
    "q_zipf_slope" -> ((s, d) => TextAnalysis.zipfSlope(s, d)),
    "q_ngram_novelty" -> ((s, d) => TextAnalysis.ngramNovelty(s, d)),
    "q_heaps_law" -> ((s, d) => TextAnalysis.heapsLaw(s, d)),
    "q_boilerplate" -> ((s, d) => TextPolicy.boilerplateFlags(s, d)),
    "q_dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLshPairs(s, d)),
    "q_dedup_lsh_cc" -> ((s, d) => Dedup.minhashLshFamilies(s, d)),
    "q_softdedup_weight" -> ((s, d) => Dedup.softDedupWeights(s, d)),
    "q_pii_redact" -> (TextPolicy.piiRedact _),
    "q_contamination" -> ((s, d) => TextPolicy.contamination(s, d)),
    "q_sessionize" -> (Relational.sessionStats _),
    "q_a_rollup" -> (Analytics.revenueRollup _),
    "q_train_split" -> (TextAnalysis.trainSplit _),
    "q_a2_edge_counts" -> (Analytics.edgeTypeCounts _),
    "q_q2_tag_scroll" -> (RecallShapes.tagOnlyScroll _),
    "q_s7_snapshot" -> (RecallShapes.graphSnapshot _),
    "q_s8_sync_diff" -> (RecallShapes.syncDiff _),
    "q_q6_multi" -> (RecallShapes.multiQueryUnion _),
    "q_u7_lev_pairs" -> ((s, d) => Dedup.levenshteinPairs(s, d)),
    "q_sim_band_pairs" -> ((s, d) => Similarity.bandedNearDupPairs(s, d, threshold = 0.3)),
    "q_fp_rolling" -> (TextAnalysis.rollingFingerprints _),
    "q_c3_clusters" -> (Maintenance.clusterSummary _),
    "q_c3_clusters_banded" -> (Maintenance.clusterSummaryBanded _),
    "q_a7_top_prefs" -> ((s, d) => Analytics.topPreferences(s, d)),
    "q_e3_neighbors" -> ((s, d) => Similarity.semanticNeighborEdges(s, d)),
    "q_e2_patterns" -> ((s, d) => TextAnalysis.patternKeyTerms(s, d)),
    "q_u2_classify" -> (TextAnalysis.classifyDocs _),
    "q_a10_dedup_sources" -> (Dedup.dedupSources _),
    "q_r8_touch" -> (Relational.touchAccess _),
    "q_s1_tag_prep" -> (TextAnalysis.tagPrepare _),
    "q_mm_decode" -> (Multimodal.decodePipeline _),
    "q_quality_repetition" -> (TextPolicy.repetitionSignals _),
    "q_dedup_semantic" -> ((s, d) => Dedup.semanticDedup(s, d, threshold = 0.35)),
    "q_mix_sample" -> (TextAnalysis.mixtureSample _),
    "q_dsir_weight" -> ((s, d) => TextAnalysis.dsirWeights(s, d)),
    "q_len_quantile" -> (TextAnalysis.lengthQuantiles _),
    "q_pagerank" -> (GraphAnalytics.supplierPartRank _),
    "q_kmeans" -> ((s, d) => KMeans.kmeansClusters(s, d)),
    "q_pagerank_dangling" -> (GraphAnalytics.supplierPartRankDangling _),
    "q_seq_chunks" -> (TextAnalysis.sequenceChunks _),
    "q_mix_temperature" -> ((s, d) => TextAnalysis.temperatureMix(s, d)),
    "q_unimax_mix" -> (TextAnalysis.unimaxMix _),
    "q_doremi_mix" -> (TextAnalysis.doremiMix _),
    "q_pca_cov" -> (Pca.covarianceQuery _),
    "q_perplexity" -> ((s, d) => TextPolicy.perplexityScores(s, d)),
    "q_url_canonical" -> (TextPolicy.urlCanonical _),
    "q_dedup_containment" -> ((s, d) => Dedup.containmentPairs(s, d)),
    "q_hygiene_funnel" -> (TextPolicy.hygieneFunnel _),
    "q_asof_join" -> (Relational.asofClickForPurchase _),
    "q_dedup_winnowing" -> ((s, d) => Dedup.winnowingPairs(s, d)),
    "q_substring_spans" -> ((s, d) => Dedup.substringDupSpans(s, d)),
    "q_substring_dedup" -> ((s, d) => Dedup.substringDedupApply(s, d)),
    "q_dup_rate_source" -> ((s, d) => Dedup.dupRateBySource(s, d)),
    "q_gopher_rules" -> (TextPolicy.gopherRules _),
    "q_quality_classifier" -> ((s, d) => TextPolicy.qualityClassifier(s, d)),
    "q_bigram_lm" -> (TextPolicy.bigramLmScore _),
    "q_classifier_auc" -> ((s, d) => TextPolicy.classifierAuc(s, d)),
    "q_decontam_apply" -> (TextPolicy.decontaminateScore _),
    "q_epoch_shuffle" -> ((s, d) => TextAnalysis.epochShuffle(s, d)),
    "q_triangles" -> (GraphAnalytics.coPurchaseTriangles _),
    "q_lpa_communities" -> (GraphAnalytics.coPurchaseCommunities _),
    "q_cube" -> (Analytics.shipmodeCube _),
    "q_skew_salted" -> (Skew.saltedBrandRevenue _),
    "q_conversion_funnel" -> (Relational.conversionFunnel _),
    "q_s1b_patch" -> (TextAnalysis.patchApply _),
    "q_startup_recall" -> (RecallShapes.startupRecall _),
  )

  private val centsSum: String => String = e =>
    s"CAST(sum(CAST(round(($e) * 100) AS BIGINT)) AS BIGINT)"

  private val toks = raw"regexp_split_to_array(lower(trim(text)), '\s+')"

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         ${centsSum("l_extendedprice * (1.0 - l_discount)")} AS revenue_cents,
         round((avg(l_quantity)) + 1e-9, 4) + 0.0 AS avg_qty, count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_f1_time_window" ->
      s"""SELECT event_type, count(*) AS n, ${centsSum("value")} AS value_cents
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
         GROUP BY 1 ORDER BY 1""",
    "q_s3_point" ->
      "SELECT * FROM customer WHERE c_custkey = 1",
    "q_s4_page" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderstatus = 'O'
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50 OFFSET 20""",
    "q_j_broadcast_brand" ->
      s"""SELECT p_brand,
         ${centsSum("l_extendedprice * (1.0 - l_discount)")} AS revenue_cents,
         count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1 ORDER BY 1""",
    "q_j_semi_anti" ->
      """SELECT * FROM (
         SELECT c_mktsegment, count(*) AS n, TRUE AS has_orders FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY 1
         UNION ALL
         SELECT c_mktsegment, count(*) AS n, FALSE AS has_orders FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY 1
         ) ORDER BY c_mktsegment, has_orders""",
    "q_j1_topk_per_group" ->
      """SELECT o_custkey, c_name, o_orderkey, o_totalprice, rn FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
         FROM orders) t JOIN customer ON o_custkey = c_custkey
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_a5_hour_hist" ->
      """SELECT CAST(hour(ts) AS INT) AS hr, count(*) AS n,
         round((avg(value)) + 1e-9, 4) + 0.0 AS avg_value
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_a6_word_freq" ->
      s"""SELECT token, count(*) AS n FROM (
         SELECT unnest($toks) AS token FROM documents) t
         WHERE length(token) >= 3
         GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 50""",
    "q_e1_trailing_window" ->
      """SELECT event_id, user_id, count(*) OVER (PARTITION BY user_id
           ORDER BY epoch_ms(ts)
           RANGE BETWEEN 604800000 PRECEDING AND 1 PRECEDING) AS n_prior_7d
         FROM events ORDER BY event_id""",
    "q_set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",
    "q_j6_multihop" ->
      s"""SELECT c_mktsegment, p_brand, ${centsSum("l_extendedprice")} AS gross_cents,
         count(*) AS n
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN part ON l_partkey = p_partkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_dup, min(doc_id) AS keep_id
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_dedup_fingerprint" ->
      """SELECT doc_id, fp, n_chars FROM (
         SELECT doc_id, n_chars,
           substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 64) AS fp,
           row_number() OVER (
             PARTITION BY substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 64)
             ORDER BY n_chars DESC, doc_id ASC) AS rn
         FROM documents) t WHERE rn = 1 ORDER BY doc_id""",
    "q_dedup_minhash" ->
      s"""SELECT sig, count(*) AS n_docs, min(doc_id) AS keep_id FROM (
         SELECT doc_id, concat_ws('|',
           list_aggregate(list_transform(list_distinct($toks), t -> md5(t || '#1')), 'min'),
           list_aggregate(list_transform(list_distinct($toks), t -> md5(t || '#2')), 'min'),
           list_aggregate(list_transform(list_distinct($toks), t -> md5(t || '#3')), 'min'),
           list_aggregate(list_transform(list_distinct($toks), t -> md5(t || '#4')), 'min')) AS sig
         FROM documents) t
         GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""",
    "q_dedup_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, lang, source, $toks AS tk FROM documents),
         pos AS (SELECT doc_id, lang, source, tk,
             unnest(range(1, len(tk) - 1)) AS i FROM t WHERE len(tk) >= 3),
         shex AS (SELECT DISTINCT doc_id, lang, source,
             tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh FROM pos),
         counts AS (SELECT doc_id, count(*) AS n_sh FROM shex GROUP BY 1),
         pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
           FROM shex a JOIN shex b ON a.lang = b.lang AND a.source = b.source
             AND a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id, jaccard FROM (
           SELECT a_id, b_id,
             round((inter * 1.0 / (ca.n_sh + cb.n_sh - inter)) + 1e-9, 4) + 0.0 AS jaccard
           FROM pairs JOIN counts ca ON ca.doc_id = a_id
           JOIN counts cb ON cb.doc_id = b_id) j
         WHERE jaccard >= 0.5 ORDER BY a_id, b_id""",
    "q_sim_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         px AS (SELECT e.vec_id, e.label,
             unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
           FROM embeddings e, q),
         s AS (SELECT vec_id, label, sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny
           FROM px GROUP BY 1, 2)
         SELECT vec_id, label,
           round((CASE WHEN nx = 0 OR ny = 0 THEN 0
             ELSE dot / (sqrt(nx) * sqrt(ny)) END) + 1e-9, 4) + 0.0 AS sim
         FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10""",
    "q_sim_bucket_pairs" ->
      """WITH e AS (SELECT vec_id, embedding,
           (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
           (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
           (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
           (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) +
           (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END) +
           (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) +
           (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END) +
           (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket
           FROM embeddings),
         pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             a.embedding AS ae, b.embedding AS be
           FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         px AS (SELECT a_id, b_id, unnest(ae)::DOUBLE AS x, unnest(be)::DOUBLE AS y
           FROM pairs),
         s AS (SELECT a_id, b_id, sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny
           FROM px GROUP BY 1, 2)
         SELECT a_id, b_id, sim FROM (
           SELECT a_id, b_id, round((CASE WHEN nx = 0 OR ny = 0 THEN 0
             ELSE dot / (sqrt(nx) * sqrt(ny)) END) + 1e-9, 4) + 0.0 AS sim FROM s) t
         WHERE sim >= 0.3 ORDER BY a_id, b_id""",
    "q_text_stats" -> TextAnalysis.docStatsSql,
    "q_lang_id" -> TextAnalysis.langPredictionSql,
    "q_q3_keyword" -> TextAnalysis.keywordSearchSql,
    "q_a1_count_by_type" -> Analytics.countByTypeSql,
    "q_a3_importance_dist" -> Analytics.importanceDistributionSql,
    "q_a4_confidence_dist" -> Analytics.confidenceDistributionSql,
    "q_a8_recent_by_day" -> Analytics.recentByDaySql,
    "q_a9_rel_count" -> Analytics.relCountPerKeySql,
    "q_date_parts" -> Analytics.datePartsSql,
    "q_c1_decay" -> Maintenance.decayScoresSql,
    "q_c4_forget" -> Maintenance.forgetFatesSql,
    "q_c2_creative_pairs" -> Maintenance.creativePairsSql,
    "q_q4_trending" -> RecallShapes.trendingSql,
    "q_q5_metadata" -> RecallShapes.metadataSearchSql,
    "q_r3_minmax" -> RecallShapes.minMaxRerankSql,
    "q_r5_priority" -> RecallShapes.priorityGuaranteeSql,
    "q_j3_entity_expand" -> RecallShapes.entityExpansionSql,
    "q_r4_gap_floor" -> RecallShapes.largestGapSql,
    "q_r6_scope_fallback" -> RecallShapes.scopeFallbackSql,
    "q_j4_supersession_head" -> RecallShapes.supersessionHeadsSql,
    "q_j2_seed_expansion" -> RecallShapes.seedExpansionSql,
    "q_f2_tag_filters" -> RecallShapes.tagFiltersSql,
    "q_set_intersect" -> RecallShapes.setIntersectSql,
    "q_u5_snippet" -> RecallShapes.snippetsSql,
    "q_recall_pipeline" -> RecallPipeline.recallDocumentsSql,
    "q_batch_recall_100q" -> RecallPipeline.batchRecall100Sql,
    "q_bm25_topk" -> TextSearch.bm25Sql,
    "q_shard_pack" -> TextAnalysis.shardPackSql,
    "q_source_overlap" -> TextAnalysis.sourceOverlapSql,
    "q_source_kl" -> TextAnalysis.sourceDivergenceSql,
    "q_weighted_sample" -> TextAnalysis.weightedSampleSql,
    "q_zipf_slope" -> TextAnalysis.zipfSlopeSql,
    "q_ngram_novelty" -> TextAnalysis.ngramNoveltySql,
    "q_heaps_law" -> TextAnalysis.heapsLawSql,
    "q_boilerplate" -> TextPolicy.boilerplateFlagsSql,
    "q_pii_redact" -> TextPolicy.piiRedactSql,
    "q_contamination" -> TextPolicy.contaminationSql,
    "q_c3_clusters" -> Maintenance.clusterSummarySql,
    "q_c3_clusters_banded" -> Maintenance.clusterSummaryBandedSql,
    "q_a7_top_prefs" -> Analytics.topPreferencesSql,
    "q_e3_neighbors" -> Similarity.semanticNeighborEdgesSql,
    "q_e2_patterns" -> TextAnalysis.patternKeyTermsSql,
    "q_u2_classify" -> TextAnalysis.classifyDocsSql,
    "q_a10_dedup_sources" -> Dedup.dedupSourcesSql,
    "q_r8_touch" -> Relational.touchAccessSql,
    "q_s1_tag_prep" -> TextAnalysis.tagPrepareSql,
    "q_mm_decode" -> Multimodal.decodePipelineSql,
    "q_quality_repetition" -> TextPolicy.repetitionSignalsSql,
    "q_dedup_semantic" -> Dedup.semanticDedupSql(threshold = 0.35),
    "q_mix_sample" -> TextAnalysis.mixtureSampleSql,
    "q_dsir_weight" -> TextAnalysis.dsirWeightsSql,
    "q_len_quantile" -> TextAnalysis.lengthQuantilesSql,
    "q_pagerank" -> GraphAnalytics.supplierPartRankSql,
    "q_kmeans" -> KMeans.kmeansClustersSql,
    "q_pagerank_dangling" -> GraphAnalytics.supplierPartRankDanglingSql,
    "q_seq_chunks" -> TextAnalysis.sequenceChunksSql,
    "q_mix_temperature" -> TextAnalysis.temperatureMixSql,
    "q_unimax_mix" -> TextAnalysis.unimaxMixSql(),
    "q_doremi_mix" -> TextAnalysis.doremiMixSql,
    "q_pca_cov" -> Pca.covarianceSql,
    "q_perplexity" -> TextPolicy.perplexityScoresSql,
    "q_url_canonical" -> TextPolicy.urlCanonicalSql,
    "q_dedup_containment" -> Dedup.containmentPairsSql,
    "q_hygiene_funnel" -> TextPolicy.hygieneFunnelSql,
    "q_asof_join" -> Relational.asofClickForPurchaseSql,
    "q_dedup_winnowing" -> Dedup.winnowingPairsSql,
    "q_substring_spans" -> Dedup.substringDupSpansSql,
    "q_substring_dedup" -> Dedup.substringDedupApplySql,
    "q_dup_rate_source" -> Dedup.dupRateBySourceSql,
    "q_gopher_rules" -> TextPolicy.gopherRulesSql,
    "q_quality_classifier" -> TextPolicy.qualityClassifierSql,
    "q_bigram_lm" -> TextPolicy.bigramLmScoreSql,
    "q_classifier_auc" -> TextPolicy.classifierAucSql,
    "q_decontam_apply" -> TextPolicy.decontaminateSql,
    "q_epoch_shuffle" -> TextAnalysis.epochShuffleSql,
    "q_triangles" -> GraphAnalytics.coPurchaseTrianglesSql,
    "q_lpa_communities" -> GraphAnalytics.coPurchaseCommunitiesSql,
    "q_cube" -> Analytics.shipmodeCubeSql,
    "q_skew_salted" -> Skew.saltedBrandRevenueSql,
    "q_conversion_funnel" -> Relational.conversionFunnelSql,
    "q_sim_ivf_centroid" ->
      """WITH px AS (SELECT label, i, embedding[i]::DOUBLE AS x
           FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
         cent AS (SELECT label, i, CAST(avg(x) AS REAL) AS cx FROM px GROUP BY 1, 2),
         cl AS (SELECT label, list(cx ORDER BY i) AS centroid FROM cent GROUP BY 1),
         pairs AS (SELECT e.vec_id, e.label,
             unnest(e.embedding)::DOUBLE AS x, unnest(cl.centroid)::DOUBLE AS y
           FROM embeddings e JOIN cl ON e.label = cl.label),
         s AS (SELECT vec_id, label, sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny
           FROM pairs GROUP BY 1, 2)
         SELECT vec_id, label, round((CASE WHEN nx = 0 OR ny = 0 THEN 0
             ELSE dot / (sqrt(nx) * sqrt(ny)) END) + 1e-9, 4) + 0.0 AS sim
         FROM s ORDER BY vec_id""",
    "q_sim_ivf_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         px AS (SELECT e.vec_id, e.label,
             unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
           FROM embeddings e, q),
         s AS (SELECT vec_id, label, sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny
           FROM px GROUP BY 1, 2)
         SELECT vec_id, label,
           round((CASE WHEN nx = 0 OR ny = 0 THEN 0
             ELSE dot / (sqrt(nx) * sqrt(ny)) END) + 1e-9, 4) + 0.0 AS sim
         FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10""",
    // the quantized IVF path refines with exact fp32 cosine, so the oracle
    // is the SAME brute-force top-k as q_sim_ivf_topk — a hash match proves
    // quantize-then-refine loses nothing at full nprobe
    "q_sim_ivf_quantized" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         px AS (SELECT e.vec_id, e.label,
             unnest(e.embedding)::DOUBLE AS x, unnest(q.qe)::DOUBLE AS y
           FROM embeddings e, q),
         s AS (SELECT vec_id, label, sum(x*y) AS dot, sum(x*x) AS nx, sum(y*y) AS ny
           FROM px GROUP BY 1, 2)
         SELECT vec_id, label,
           round((CASE WHEN nx = 0 OR ny = 0 THEN 0
             ELSE dot / (sqrt(nx) * sqrt(ny)) END) + 1e-9, 4) + 0.0 AS sim
         FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10""",
    "q_dedup_simhash" -> Dedup.simhashGroupsSql(),
    "q_dedup_minhash_lsh" -> Dedup.minhashLshPairsSql(),
    "q_dedup_lsh_cc" -> Dedup.minhashLshFamiliesSql(),
    "q_softdedup_weight" -> Dedup.softDedupWeightsSql,
    "q_sessionize" -> Relational.sessionStatsSql,
    "q_a_rollup" -> Analytics.revenueRollupSql,
    "q_train_split" -> TextAnalysis.trainSplitSql,
    "q_a2_edge_counts" -> Analytics.edgeTypeCountsSql,
    "q_q2_tag_scroll" -> RecallShapes.tagOnlyScrollSql,
    "q_s7_snapshot" -> RecallShapes.graphSnapshotSql,
    "q_s8_sync_diff" -> RecallShapes.syncDiffSql,
    "q_q6_multi" -> RecallShapes.multiQueryUnionSql,
    "q_u7_lev_pairs" -> Dedup.levenshteinPairsSql(),
    "q_sim_band_pairs" -> Similarity.bandedNearDupPairsSql(threshold = 0.3),
    "q_fp_rolling" -> TextAnalysis.rollingFingerprintsSql,
    "q_s1b_patch" -> TextAnalysis.patchApplySql,
    "q_startup_recall" -> RecallShapes.startupRecallSql,
  )
}
