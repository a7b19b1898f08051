package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every entry in [[queries]] has a DuckDB oracle in [[oracleSql]] (same
  * column names in lower_snake_case, total ORDER BY); the driver
  * hash-compares them at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TaxiQueries.q1Tumble(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + the
    * LLM-pipeline extensions (dedup / similarity / text / multimodal /
    * relational).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference parity (SURVEY §2.1-2.7)
    "src_rides" -> (TaxiQueries.srcRides _),
    "src_docs_jsonl" -> (graft.sources.DocsJsonl.srcDocsJsonl _),
    "q1_tumble" -> (TaxiQueries.q1Tumble _),
    "q2_tumble_sql" -> (TaxiQueries.q2TumbleSql _),
    "q3_over_window" -> (TaxiQueries.q3OverWindow _),
    "q3_over_recent" -> (TaxiQueries.q3OverRecent _),
    "q4_cnt_freq" -> (TaxiQueries.q4CntFreq _),
    "q5_geo_hour" -> (TaxiQueries.q5GeoHour _),
    "q6_sliding" -> (TaxiQueries.q6Sliding _),
    "q7_session" -> (TaxiQueries.q7Session _),
    "q8_pair_join" -> (TaxiQueries.q8PairJoin _),
    // streaming layer under the hard gate: real micro-batch execution of
    // the streaming operators over deterministic chunk replays, checked
    // against the SAME batch oracles (graft.streaming.StreamGate)
    "stream_q1_tumble" -> (graft.streaming.StreamGate.q1Tumble _),
    "stream_q4_cascade" -> (graft.streaming.StreamGate.q4Cascade _),
    "stream_q7_session" -> (graft.streaming.StreamGate.q7Session _),
    "stream_q3_over" -> (graft.streaming.StreamGate.q3Over _),
    "stream_funnel" -> (graft.streaming.StreamGate.funnel _),
    "stream_substring_incr" -> (graft.streaming.StreamGate.substringIncr _),
    "stream_q8_pair" -> (graft.streaming.StreamGate.q8Pair _),
    "stream_ingest_admit" -> (graft.streaming.StreamGate.ingestAdmit _),
    // text analysis
    "txt_stats" -> (TextAnalysis.textStats _),
    "txt_lang_id" -> (TextAnalysis.langId _),
    "txt_token_count" -> (TextAnalysis.tokenCount _),
    "txt_fingerprint" -> (TextAnalysis.fingerprint _),
    "txt_tfidf" -> (TextAnalysis.tfidf _),
    "txt_pii_scrub" -> (TextAnalysis.piiScrub _),
    "txt_repetition" -> (TextAnalysis.repetition _),
    "txt_vocab_build" -> (TextAnalysis.vocabBuild _),
    "txt_oov_rate" -> (TextAnalysis.oovRate _),
    "txt_norm_dedup" -> (TextAnalysis.normalizedDedup _),
    "txt_boilerplate" -> (TextAnalysis.boilerplate _),
    "txt_boilerplate_scrub" -> (TextAnalysis.boilerplateScrub _),
    // dedup
    "dedup_exact" -> (Dedup.exact _),
    "dedup_near_key" -> (Dedup.nearKey _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_minhash_lsh" -> (Dedup.minhashLsh _),
    "dedup_simhash" -> (Dedup.simhash _),
    "dedup_cluster" -> (Dedup.cluster _),
    "dedup_incremental" -> (Dedup.incremental _),
    "dedup_editdist" -> (Dedup.editDistance _),
    "dedup_substring" -> (Dedup.substring _),
    "pipe_substring_scrub" -> (Dedup.substringScrub _),
    "dedup_substring_incr" -> (Dedup.substringIncremental _),
    // similarity search
    "sim_topk_bf" -> (Similarity.topkBruteforce _),
    "sim_lsh_neardup" -> (Similarity.lshNearDup _),
    "sim_ivf_topk" -> (Similarity.ivfTopk _),
    "sim_multiprobe_lsh" -> (Similarity.multiprobeTopk _),
    "dedup_semantic" -> (Similarity.semanticDedup _),
    // multimodal plumbing
    "mm_features" -> (Multimodal.features _),
    "mm_frame_sample" -> (Multimodal.frameSample _),
    // corpus-curation pipeline compositions
    "pipe_corpus_filter" -> (Pipeline.corpusFilter _),
    "pipe_stratified_sample" -> (Pipeline.stratifiedSample _),
    "pipe_contamination" -> (Training.contamination _),
    "pipe_contamination_bloom" -> (Training.contaminationBloom _),
    "pipe_pack_chunks" -> (Training.packChunks _),
    "pipe_leakage_split" -> (Training.leakageSplit _),
    "pipe_chunk_overlap" -> (Training.chunkOverlap _),
    "pipe_manifest" -> (Pipeline.manifest _),
    "pipe_dq_report" -> (Pipeline.dqReport _),
    "pipe_zorder_layout" -> (Pipeline.zorderLayout _),
    "pipe_shuffle_shards" -> ((s: SparkSession, d: String) => Pipeline.shuffleShards(s, d)),
    "pipe_mixture_sample" -> (Pipeline.mixtureSample _),
    "pipe_dataset_diff" -> (Pipeline.datasetDiff _),
    "pipe_quality_classify" -> (Pipeline.qualityClassify _),
    "pipe_source_caps" -> (Pipeline.sourceCaps _),
    "emb_quantize" -> (Training.quantize _),
    "emb_kmeans" -> (Clustering.kmeans _),
    "emb_dim_stats" -> (Clustering.dimStats _),
    // relational / analytics
    "rel_pricing" -> (Relational.pricingSummary _),
    "rel_revenue_nation" -> (Relational.revenueByNation _),
    "rel_top_customers" -> (Relational.topCustomers _),
    "rel_grouping_sets" -> (Relational.segmentNationRollup _),
    "rel_sessionize" -> (Relational.sessionize _),
    "rel_json_extract" -> (Relational.jsonExtract _),
    "rel_order_coverage" -> (Relational.orderCoverage _),
    "rel_asof_attribution" -> (Relational.asofAttribution _),
    "rel_shipping_priority" -> (Relational.shippingPriority _),
    "rel_segment_set_ops" -> (Relational.segmentSetOps _),
    "rel_interval_join" -> (Relational.intervalJoin _),
    "rel_window_suite" -> (Relational.windowSuite _),
    "rel_percentiles" -> (Relational.percentiles _),
    "rel_pivot" -> (Relational.pivotEventCounts _),
    "rel_unpivot" -> (Relational.unpivotEventCounts _),
    "rel_scalar_subquery" -> (Relational.scalarSubquery _),
    "rel_cube" -> (Relational.segmentNationCube _),
    "rel_full_outer" -> (Relational.fullOuterActivity _),
    "rel_funnel" -> (Relational.funnel _),
    "rel_retention" -> (Relational.retention _),
    "rel_gapfill" -> (Relational.gapfill _),
    "skew_salted_agg" -> (Relational.saltedEventCount _),
    // sketch aggregates, restated deterministically: exact counts + order
    // statistics (oracle-matchable) plus per-sketch error-bound booleans
    // the oracle asserts as literal TRUE
    "rel_approx_stats" -> (Relational.approxStats _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "src_rides" -> TaxiQueries.srcRidesOracleSql,
    "q1_tumble" -> TaxiQueries.q1OracleSql,
    "q2_tumble_sql" -> TaxiQueries.q2OracleSql,
    "q3_over_window" -> TaxiQueries.q3OracleSql,
    "q3_over_recent" -> TaxiQueries.q3RecentOracleSql,
    "q4_cnt_freq" -> TaxiQueries.q4OracleSql,
    "q5_geo_hour" -> TaxiQueries.q5OracleSql,
    "q6_sliding" -> TaxiQueries.q6OracleSql,
    "q7_session" -> TaxiQueries.q7OracleSql,
    "q8_pair_join" -> TaxiQueries.q8OracleSql,
    // streaming gate rows reuse the batch oracles: the replay is
    // time-ordered (nothing late), so micro-batch execution must land
    // exactly on the batch answer
    "stream_q1_tumble" -> TaxiQueries.q1OracleSql,
    "stream_q4_cascade" -> TaxiQueries.q4OracleSql,
    "stream_q7_session" -> TaxiQueries.q7OracleSql,
    "stream_q3_over" -> TaxiQueries.q3RecentOracleSql,
    "stream_funnel" -> Relational.funnelOracle,
    "stream_substring_incr" -> Dedup.substringIncrementalOracle,
    "stream_q8_pair" -> TaxiQueries.q8OracleSql,
    "stream_ingest_admit" -> Dedup.ingestAdmitOracle,
    "rel_percentiles" -> Relational.percentilesOracle,
    "rel_pivot" -> Relational.pivotEventCountsOracle,
    "txt_tfidf" -> TextAnalysis.tfidfOracle,
    "txt_pii_scrub" -> TextAnalysis.piiScrubOracle,
    "txt_repetition" -> TextAnalysis.repetitionOracle,
    "pipe_contamination" -> Training.contaminationOracle,
    // bloom pre-filter changes the plan, not the answer: same oracle
    "pipe_contamination_bloom" -> Training.contaminationOracle,
    "pipe_pack_chunks" -> Training.packChunksOracle,
    "pipe_leakage_split" -> Training.leakageSplitOracle,
    "pipe_chunk_overlap" -> Training.chunkOverlapOracle,
    "pipe_manifest" -> Pipeline.manifestOracle,
    "pipe_dq_report" -> Pipeline.dqReportOracle,
    "emb_quantize" -> Training.quantizeOracle,
    "emb_kmeans" -> Clustering.kmeansOracle,
    "emb_dim_stats" -> Clustering.dimStatsOracle,
    "rel_interval_join" -> Relational.intervalJoinOracle,
    "rel_window_suite" -> Relational.windowSuiteOracle,
    "skew_salted_agg" -> Relational.saltedEventCountOracle,
    "txt_stats" -> TextAnalysis.textStatsOracle,
    "txt_lang_id" -> TextAnalysis.langIdOracle,
    "txt_token_count" -> TextAnalysis.tokenCountOracle,
    "txt_fingerprint" -> TextAnalysis.fingerprintOracle,
    "dedup_exact" -> Dedup.exactOracle,
    "dedup_near_key" -> Dedup.nearKeyOracle,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardOracle,
    "dedup_minhash_lsh" -> Dedup.minhashLshOracle,
    "dedup_simhash" -> Dedup.simhashOracle,
    "dedup_cluster" -> Dedup.clusterOracle,
    "dedup_incremental" -> Dedup.incrementalOracle,
    "src_docs_jsonl" -> graft.sources.DocsJsonl.srcDocsJsonlOracle,
    "pipe_zorder_layout" -> Pipeline.zorderLayoutOracle,
    "pipe_shuffle_shards" -> Pipeline.shuffleShardsOracle,
    "pipe_mixture_sample" -> Pipeline.mixtureSampleOracle,
    "dedup_editdist" -> Dedup.editDistanceOracle,
    "dedup_substring" -> Dedup.substringOracle,
    "pipe_substring_scrub" -> Dedup.substringScrubOracle,
    "dedup_substring_incr" -> Dedup.substringIncrementalOracle,
    "mm_frame_sample" -> Multimodal.frameSampleOracle,
    "rel_unpivot" -> Relational.unpivotEventCountsOracle,
    "rel_scalar_subquery" -> Relational.scalarSubqueryOracle,
    "rel_cube" -> Relational.segmentNationCubeOracle,
    "rel_full_outer" -> Relational.fullOuterActivityOracle,
    "rel_funnel" -> Relational.funnelOracle,
    "rel_retention" -> Relational.retentionOracle,
    "rel_gapfill" -> Relational.gapfillOracle,
    "sim_topk_bf" -> Similarity.topkBruteforceOracle,
    "sim_lsh_neardup" -> Similarity.lshNearDupOracle,
    "sim_ivf_topk" -> Similarity.ivfTopkOracle,
    "sim_multiprobe_lsh" -> Similarity.multiprobeTopkOracle,
    "dedup_semantic" -> Similarity.semanticDedupOracle,
    "pipe_dataset_diff" -> Pipeline.datasetDiffOracle,
    "pipe_quality_classify" -> Pipeline.qualityClassifyOracle,
    "pipe_source_caps" -> Pipeline.sourceCapsOracle,
    "txt_vocab_build" -> TextAnalysis.vocabBuildOracle,
    "txt_oov_rate" -> TextAnalysis.oovRateOracle,
    "txt_norm_dedup" -> TextAnalysis.normalizedDedupOracle,
    "txt_boilerplate" -> TextAnalysis.boilerplateOracle,
    "txt_boilerplate_scrub" -> TextAnalysis.boilerplateScrubOracle,
    "mm_features" -> Multimodal.featuresOracle,
    "pipe_corpus_filter" -> Pipeline.corpusFilterOracle,
    "pipe_stratified_sample" -> Pipeline.stratifiedSampleOracle,
    "rel_pricing" -> Relational.pricingSummaryOracle,
    "rel_revenue_nation" -> Relational.revenueByNationOracle,
    "rel_top_customers" -> Relational.topCustomersOracle,
    "rel_grouping_sets" -> Relational.segmentNationRollupOracle,
    "rel_sessionize" -> Relational.sessionizeOracle,
    "rel_json_extract" -> Relational.jsonExtractOracle,
    "rel_order_coverage" -> Relational.orderCoverageOracle,
    "rel_asof_attribution" -> Relational.asofAttributionOracle,
    "rel_shipping_priority" -> Relational.shippingPriorityOracle,
    "rel_segment_set_ops" -> Relational.segmentSetOpsOracle,
    "rel_approx_stats" -> Relational.approxStatsOracle,
  )
}
