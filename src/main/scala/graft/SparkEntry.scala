package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.RelationalOps
import graft.ops.{CurationOps, DedupOps, ExtractQueries, MultimodalOps, SamplingOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries cover SURVEY §2's operator inventory (scan/filter/project P3-P6,
  * aggregations A1-A8, sorts/limits/set-ops O1-O5, joins J1-J3, windows,
  * the extraction core F1-F10/C1-C5/G1-G6 via ExtractQueries) plus the
  * training-data operators (dedup, similarity search, text analysis,
  * multimodal plumbing). Every SQL-expressible query has a DuckDB oracle
  * with matching column names and a deterministic ORDER BY.
  */
object SparkEntry {

  /** Flagship: full extraction over a docs table derived from the sf0.001
    * documents test table; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    ExtractQueries.extractFull(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // extraction core over driver data
    "x1_chunk_sections" -> (ExtractQueries.chunkSectionCounts _),
    "x2_extract_full" -> (ExtractQueries.extractFull _),
    "x3_extract_spans" -> (ExtractQueries.extractSpans _),
    "x4_rule_fields" -> (ExtractQueries.ruleFields _),
    "x5_block_classify" -> (ExtractQueries.blockClassify _),
    "a3_signature_stats" -> (ExtractQueries.signatureStats _),
    "a4_usage_snapshot" -> (ExtractQueries.usageSnapshot _),
    "a4b_usage_counters" -> (ExtractQueries.usageCounters _),
    "a5_rules_stats" -> (ExtractQueries.rulesStats _),
    "a6_field_accuracy" -> (ExtractQueries.fieldAccuracy _),
    "a7_eval_prf" -> (ExtractQueries.evalPrf _),
    // relational / repository analytics
    "q1_pricing_summary" -> (RelationalOps.q1PricingSummary _),
    "q2_top_customers" -> (RelationalOps.q2TopCustomers _),
    "q3_region_revenue" -> (RelationalOps.q3RegionRevenue _),
    "q4_filter_project" -> (RelationalOps.q4FilterProject _),
    "q5_distinct" -> (RelationalOps.q5Distinct _),
    "q6_window_top_order" -> (RelationalOps.q6WindowTopOrder _),
    "q7_eval_ratios" -> (RelationalOps.q7EvalRatios _),
    "q8_events_daily" -> (RelationalOps.q8EventsDaily _),
    "q9_orders_by_month" -> (RelationalOps.q9OrdersByMonth _),
    "q10_anti_join" -> (RelationalOps.q10AntiJoin _),
    "q11_semi_join" -> (RelationalOps.q11SemiJoin _),
    "q12_fact_join" -> (RelationalOps.q12FactJoin _),
    "p3_library_search" -> (RelationalOps.p3LibrarySearch _),
    "p1_doc_lookup" -> (RelationalOps.p1DocLookup _),
    "p5_retention" -> (RelationalOps.p5Retention _),
    "a2_repo_stats" -> (RelationalOps.a2RepoStats _),
    // dedup
    "d1_exact_dedup" -> (DedupOps.exactDedup _),
    "d2_ngram_jaccard" -> (DedupOps.ngramJaccardPairs _),
    "d3_minhash" -> (DedupOps.minhash _),
    "d4_lsh_pairs" -> (DedupOps.lshPairs _),
    "d5_simhash" -> (DedupOps.simhash _),
    "d8_lsh_clusters" -> (DedupOps.lshClusters _),
    "d6_embed_neardup" -> (DedupOps.embedNearDup _),
    "d7_lsh_neardup" -> (DedupOps.lshNearDup _),
    "d9_decontaminate" -> (DedupOps.decontaminate _),
    "d10_boilerplate" -> (DedupOps.boilerplate _),
    "d11_semdedup" -> (DedupOps.semDedup _),
    // similarity search
    "v1_ann_topk" -> (VectorOps.annTopK _),
    "v2_lsh_buckets" -> (VectorOps.lshBuckets _),
    "v4_lsh_ann_topk" -> (VectorOps.lshAnnTopK _),
    "v3_cluster_stats" -> (VectorOps.clusterStats _),
    "v5_ivf_topk" -> (VectorOps.ivfTopK _),
    "v6_kmeans" -> (VectorOps.kmeansRefine _),
    // text analysis
    "t1_langid" -> (TextOps.langId _),
    "c1_curation_funnel" -> (CurationOps.curationFunnel _),
    "c2_curated_docs" -> (CurationOps.curatedDocs _),
    "c3_curated_mixture" -> (CurationOps.curatedMixture _),
    "t2_quality" -> (TextOps.quality _),
    "t3_token_count" -> (TextOps.tokenCount _),
    "t4_fingerprint" -> (TextOps.fingerprint _),
    "t5_repetition" -> (TextOps.repetition _),
    "t6_vocab" -> (TextOps.vocab _),
    "t7_pii_scrub" -> (TextOps.piiScrub _),
    "t8_rarity" -> (TextOps.rarity _),
    "t9_bigram_merge" -> (TextOps.bigramMerge _),
    // dataset mixing / sampling
    "s1_hash_sample" -> (SamplingOps.hashSample _),
    "s2_mixture_quota" -> (SamplingOps.mixtureQuota _),
    "s3_temperature_weights" -> (SamplingOps.temperatureWeights _),
    "s4_shard_shuffle" -> (SamplingOps.shardShuffle _),
    "s5_split_manifest" -> (SamplingOps.splitManifest _),
    "s6_dsir_weights" -> (SamplingOps.dsirWeights _),
    // multimodal
    "m1_media_features" -> (MultimodalOps.mediaFeatures _),
    "m2_media_decode" -> (MultimodalOps.mediaPpmDecode _),
    "m3_frame_sample" -> (MultimodalOps.frameSampleStats _))

  def oracleSql: Map[String, String] = Map(
    "x1_chunk_sections" -> ExtractQueries.chunkSectionCountsSql,
    "x2_extract_full" -> ExtractQueries.extractFullSql,
    "x3_extract_spans" -> ExtractQueries.extractSpansSql,
    "x4_rule_fields" -> ExtractQueries.ruleFieldsSql,
    "x5_block_classify" -> ExtractQueries.blockClassifySql,
    "a4b_usage_counters" -> ExtractQueries.usageCountersSql,
    "a5_rules_stats" -> ExtractQueries.rulesStatsSql,
    "a6_field_accuracy" -> ExtractQueries.fieldAccuracySql,
    "a7_eval_prf" -> ExtractQueries.evalPrfSql,
    "q1_pricing_summary" -> RelationalOps.q1Sql,
    "q2_top_customers" -> RelationalOps.q2Sql,
    "q3_region_revenue" -> RelationalOps.q3Sql,
    "q4_filter_project" -> RelationalOps.q4Sql,
    "q5_distinct" -> RelationalOps.q5Sql,
    "q6_window_top_order" -> RelationalOps.q6Sql,
    "q7_eval_ratios" -> RelationalOps.q7Sql,
    "q8_events_daily" -> RelationalOps.q8Sql,
    "q9_orders_by_month" -> RelationalOps.q9Sql,
    "q10_anti_join" -> RelationalOps.q10Sql,
    "q11_semi_join" -> RelationalOps.q11Sql,
    "q12_fact_join" -> RelationalOps.q12Sql,
    "p3_library_search" -> RelationalOps.p3Sql,
    "p1_doc_lookup" -> RelationalOps.p1Sql,
    "p5_retention" -> RelationalOps.p5Sql,
    "a2_repo_stats" -> RelationalOps.a2Sql,
    "d1_exact_dedup" -> DedupOps.exactDedupSql,
    "d2_ngram_jaccard" -> DedupOps.ngramJaccardSql,
    "d3_minhash" -> DedupOps.minhashSql,
    "d4_lsh_pairs" -> DedupOps.lshPairsSql,
    "d5_simhash" -> DedupOps.simhashSql,
    "d8_lsh_clusters" -> DedupOps.lshClustersSql,
    "d6_embed_neardup" -> DedupOps.embedNearDupSql,
    "d7_lsh_neardup" -> DedupOps.lshNearDupSql,
    "d9_decontaminate" -> DedupOps.decontaminateSql,
    "d10_boilerplate" -> DedupOps.boilerplateSql,
    "d11_semdedup" -> DedupOps.semDedupSql,
    "v1_ann_topk" -> VectorOps.annTopKSql,
    "v2_lsh_buckets" -> VectorOps.lshBucketsSql,
    "v3_cluster_stats" -> VectorOps.clusterStatsSql,
    "v4_lsh_ann_topk" -> VectorOps.lshAnnTopKSql,
    "v5_ivf_topk" -> VectorOps.ivfTopKSql,
    "v6_kmeans" -> VectorOps.kmeansRefineSql,
    "t1_langid" -> TextOps.langIdSql,
    "c1_curation_funnel" -> CurationOps.curationFunnelSql,
    "c2_curated_docs" -> CurationOps.curatedDocsSql,
    "c3_curated_mixture" -> CurationOps.curatedMixtureSql,
    "t2_quality" -> TextOps.qualitySql,
    "t3_token_count" -> TextOps.tokenCountSql,
    "t4_fingerprint" -> TextOps.fingerprintSql,
    "t5_repetition" -> TextOps.repetitionSql,
    "t6_vocab" -> TextOps.vocabSql,
    "t7_pii_scrub" -> TextOps.piiScrubSql,
    "t8_rarity" -> TextOps.raritySql,
    "t9_bigram_merge" -> TextOps.bigramMergeSql,
    "s1_hash_sample" -> SamplingOps.hashSampleSql,
    "s2_mixture_quota" -> SamplingOps.mixtureQuotaSql,
    "s3_temperature_weights" -> SamplingOps.temperatureWeightsSql,
    "s4_shard_shuffle" -> SamplingOps.shardShuffleSql,
    "s5_split_manifest" -> SamplingOps.splitManifestSql,
    "s6_dsir_weights" -> SamplingOps.dsirWeightsSql,
    "m1_media_features" -> MultimodalOps.mediaFeaturesSql,
    "m2_media_decode" -> MultimodalOps.mediaPpmDecodeSql,
    "m3_frame_sample" -> MultimodalOps.frameSampleStatsSql)
}
