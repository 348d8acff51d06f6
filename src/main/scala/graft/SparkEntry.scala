package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each key in [[queries]] is one operator from SURVEY.md §2 (or an [EXT]
  * LLM-pipeline operator); [[oracleSql]] carries its DuckDB twin for the
  * driver's hash-compare at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Revenue(spark, "/root/testdata/sf0.001")

  /** Store-LIFECYCLE verification lanes among [[queries]] — rows whose
    * timed work is dominated by building/maintaining a persistent store
    * in-query (split-build + maintain + read must hash-equal
    * from-scratch) or by the from-scratch equivalent of one, each with a
    * separately-gated fast production twin (`x3_ann_ivf_served`,
    * `dag_corpus_build_stored`) or being the production loop itself.
    * The bench reports their subtotal separately from the pure
    * query-compute surface: the gates are ~half the wall total by
    * design, and one combined number lets gate noise hide a real query
    * regression (and vice versa).
    */
  val lifecycleGates: Set[String] = Set(
    "s11_date_rollup", "s11_date_evolve", "s11_date_dpp", "s11_date_ingest",
    "x3_ann_ivf_store", "x3_ann_ivf_inc", "x3_ann_ivf_del",
    "x3_ann_ivf_ingest", "x3_ann_ivf_served",
    "x2_labels_incremental", "x2_labels_delete",
    "x2_evict_readmit", "x2_incremental",
    "dag_corpus_build", "dag_corpus_build_stored",
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_revenue_agg" -> (Relational.q1Revenue _),
    "q3_shipping_priority" -> (Analytics.q3ShippingPriority _),
    "q5_local_supplier" -> (Analytics.q5LocalSupplier _),
    "q10_returned_items" -> (Analytics.q10ReturnedItems _),
    "q4_order_priority" -> (Analytics.q4OrderPriority _),
    "q18_large_orders" -> (Analytics.q18LargeOrders _),
    "q6_forecast" -> (Analytics.q6Forecast _),
    "q7_volume_shipping" -> (Analytics.q7VolumeShipping _),
    "q8_market_share" -> (Analytics.q8MarketShare _),
    "q9_profit_shape" -> (Analytics.q9ProfitShape _),
    "q14_promo_revenue" -> (Analytics.q14PromoRevenue _),
    "q15_top_supplier" -> (Analytics.q15TopSupplier _),
    "q19_disjunctive" -> (Analytics.q19Disjunctive _),
    "q21_waiting_supplier" -> (Analytics.q21WaitingSupplier _),
    "q22_idle_rich" -> (Analytics.q22IdleRich _),
    "q12_priority_class" -> (Analytics.q12Priority _),
    "q13_custdist" -> (Analytics.q13CustDist _),
    "q17_small_qty" -> (Analytics.q17SmallQty _),
    "q2_min_cost_supplier" -> (Analytics.q2MinCostSupplier _),
    "q11_important_stock" -> (Analytics.q11ImportantStock _),
    "q16_supplier_cnt" -> (Analytics.q16SupplierCnt _),
    "q20_promo_part_supp" -> (Analytics.q20PromoPartSupp _),
    "r4_range_join_binned" -> (graft.plans.RangeJoin.r4bBinnedRangeJoin _),
    "r8_topk_grouped" -> (graft.plans.TopKPerGroup.r8gTopKGrouped _),
    "a5_funnel" -> (Analytics.a5Funnel _),
    "a6_retention" -> (Analytics.a6Retention _),
    "a7_anomaly" -> (Analytics.a7Anomaly _),
    "x3_sq8_recall" -> (Similarity.x3Sq8Recall _),
    "s10_orc_scan" -> (graft.sources.Sources.s10OrcScan _),
    // date-partitioned store round trip: write events partitioned by
    // event_date, aggregate one week through the partition-pruned scan
    "s11_date_rollup" -> (graft.sources.DateStore.s11DateRollup _),
    // day-grain store maintenance under the gate: build on the first 24
    // days, append the rest incrementally, roll up across the seam
    "s11_date_evolve" -> (graft.sources.DateStore.s11DateEvolve _),
    // runtime partition pruning: the served day set is decided by a
    // dim aggregate at runtime — DPP must prune the store scan
    "s11_date_dpp" -> (graft.sources.DateStore.s11DateDpp _),
    // log-driven ingestion: three micro-batch deltas (incl. a mixed
    // late-data restate) merged by day; corpus fingerprint must noop
    "s11_date_ingest" -> (graft.sources.DateStore.s11DateIngest _),
    "x6_pack_sequences" -> (Sampling.x6PackSequences _),
    "x6_mixture" -> (Sampling.x6Mixture _),
    "x6_export_shards" -> (Sampling.x6ExportShards _),
    "x4_ngram_lm" -> (TextAnalysis.x4NgramLm _),
    "x2_simhash_portable" -> (Dedup.x2SimHashPortable _),
    "dag_etl_clean" -> (Dags.dagEtlClean _),
    "dag_etl_json_roundtrip" -> (Dags.dagEtlJsonRoundtrip _),
    "dag_complex_union_gate" -> (Dags.dagComplexUnionGate _),
    "dag_kafka_validate_enrich_upsert" -> (Dags.dagKafkaValidateEnrichUpsert _),
    "dag_scrape_tag_upper" -> (Dags.dagScrapeTagUpper _),
    "dag_training_prep" -> (Dags.dagTrainingPrep _),
    "dag_corpus_build" -> (Dags.dagCorpusBuild _),
    // the production read path: near-dup labels served from the
    // materialized LabelStore (ensureCurrent → fingerprint-gated build)
    "dag_corpus_build_stored" -> (Dags.dagCorpusBuildStored _),
    "p1_dropna_any" -> (Pipeline.p1DropnaAny _),
    "p2_dropna_all" -> (Pipeline.p2DropnaAll _),
    "p3_validate" -> (Pipeline.p3Validate _),
    "p4_upper" -> (Pipeline.p4Upper _),
    "p5_enrich" -> (Pipeline.p5Enrich _),
    "p6_envelope" -> (Pipeline.p6Envelope _),
    "p7_tag_index" -> (Pipeline.p7TagIndex _),
    "p8_trim" -> (Pipeline.p8Trim _),
    "p9_to_json" -> (Pipeline.p9ToJson _),
    "p10_from_json" -> (Pipeline.p10FromJson _),
    "p11_head" -> (Pipeline.p11Head _),
    "u1_union_by_name" -> (Pipeline.u1UnionByName _),
    "a1_count" -> (Pipeline.a1Count _),
    "a2_branch_gate" -> (Pipeline.a2Branch _),
    "a4_dlq_routing" -> (Pipeline.a4DlqRouting _),
    "l5_upsert_last_wins" -> (Pipeline.l5Upsert _),
    "r1_join_multi" -> (Relational.r1JoinMulti _),
    "r1_outer_join" -> (Relational.r1OuterJoin _),
    "r14_sql_entry" -> (Relational.r14SqlEntry _),
    "r2_broadcast_join" -> (Relational.r2BroadcastJoin _),
    "r3_semi_join" -> (Relational.r3Semi _),
    "r3_anti_join" -> (Relational.r3Anti _),
    "r4_range_join" -> (Relational.r4RangeJoin _),
    "r5_multi_agg" -> (Relational.r5Agg _),
    "r5_salted_agg" -> (Relational.r5SaltedAgg _),
    "r5_percentiles" -> (Relational.r5Percentiles _),
    "r5_approx_percentiles" -> (Relational.r5ApproxPercentiles _),
    "r6_distinct" -> (Relational.r6Distinct _),
    "r6_approx_distinct" -> (Relational.r6Approx _),
    "r6_distinct_count" -> (Relational.r6DistinctCount _),
    // mergeable per-shard HLL sketches unioned without a rescan
    "r6_hll_shards" -> (Relational.r6HllShards _),
    "r6_theta_setops" -> (Relational.r6ThetaSetops _),
    "r6_kll_shards" -> (Relational.r6KllShards _),
    "r6_cm_freq" -> (Relational.r6CmHeavyHitters _),
    "r7_rollup" -> (Relational.r7Rollup _),
    "r7_cube" -> (Relational.r7Cube _),
    "r7_grouping_sets" -> (Relational.r7GroupingSets _),
    "r8_topk" -> (Relational.r8TopK _),
    "r9_window" -> (Relational.r9Window _),
    "r9_frames" -> (Relational.r9Frames _),
    "r9_ranks" -> (Relational.r9Ranks _),
    "r13_pivot" -> (Relational.r13Pivot _),
    "r13_unpivot" -> (Relational.r13Unpivot _),
    "r10_intersect" -> (Relational.r10Intersect _),
    "r10_except" -> (Relational.r10Except _),
    "r10_union_distinct" -> (Relational.r10UnionDistinct _),
    "r11_functions" -> (Relational.r11Functions _),
    "r11_datetime" -> (Relational.r11DateTime _),
    "r11_array_struct" -> (Relational.r11ArrayStruct _),
    "r11_map" -> (Relational.r11Map _),
    "r11_strings" -> (Relational.r11Strings _),
    "r11_nulls" -> (Relational.r11Nulls _),
    "r12_asof_join" -> (Temporal.r12AsofJoin _),
    "r15_scd2" -> (Temporal.r15Scd2 _),
    "t12_resample_locf" -> (Temporal.t12ResampleLocf _),
    "s1_http_scan" -> (graft.sources.Sources.s1HttpScan _),
    "s3_csv_scan" -> (graft.sources.Sources.s3CsvScan _),
    "s4_json_scan" -> (graft.sources.Sources.s4JsonScan _),
    "t8_sessionize_batch" -> (Temporal.t8SessionizeBatch _),
    "t1_bounded_consume" -> (Streamy.t1BoundedConsume _),
    "t5_dedup_first" -> (Streamy.t5DedupFirst _),
    "t7_tumbling_window" -> (Streamy.t7Tumbling _),
    "t7_sliding_window" -> (Streamy.t7Sliding _),
    "t7_session_window" -> (Streamy.t7Session _),
    "x1_dedup_exact" -> (Dedup.x1Exact _),
    "x2_jaccard_neardup" -> (Dedup.x2Jaccard _),
    "x2_minhash_lsh" -> (Dedup.x2MinHashLsh _),
    "x2_simhash" -> (Dedup.x2SimHash _),
    "x2_embedding_neardup" -> (Dedup.x2EmbeddingNearDup _),
    "x2_dup_clusters" -> (Dedup.x2DupClusters _),
    // label maintenance under append: split build + incremental merge
    // must reproduce the from-scratch clusters, hash-exactly
    "x2_labels_incremental" -> (LabelStore.x2LabelsIncremental _),
    // label maintenance under delete: full build + tombstone delete must
    // reproduce the from-scratch clusters of the REDUCED corpus
    "x2_labels_delete" -> (LabelStore.x2LabelsDelete _),
    "x2_dedup_keep" -> (Dedup.x2DedupKeep _),
    "x2_incremental" -> (Dedup.x2IncrementalLsh _),
    "x2_evict_readmit" -> (Dedup.x2EvictReadmit _),
    "x7_decontaminate" -> (Dedup.x7Decontaminate _),
    "x7_decontam_keep" -> (Dedup.x7DecontamKeep _),
    "x2_embedding_lsh" -> (Dedup.x2EmbeddingLsh _),
    "x2_embedding_lsh_auto" -> (Dedup.x2EmbeddingLshAuto _),
    // the banded arm pinned directly (at fixture corpus sizes the
    // cost-based crossover sends both law-driven entries to the exact
    // arm — this row keeps the banding machinery itself under the
    // hash gate at a geometry that clears the pruning bar)
    "x2_embedding_lsh_banded" -> ((s, dir) => Dedup.x2EmbeddingLshAt(s, dir, 8, 8, 0.9)),
    "x3_cosine_topk" -> (Similarity.x3CosineTopK _),
    "x3_ann_lsh" -> (Similarity.x3AnnLsh _),
    "x3_ann_ivf" -> (Similarity.x3AnnIvf _),
    // the materialized-index round trip: build the IVF store, serve the
    // probe from it — bit-identical to the self-contained query
    "x3_ann_ivf_store" -> (IvfStore.x3AnnIvfStore _),
    // index maintenance under append: split build + incremental append
    // (frozen centroids, delta-only assignment) probed end-to-end
    "x3_ann_ivf_inc" -> (IvfStore.x3AnnIvfIncremental _),
    // log-driven vector ingestion: cold-start train + frozen-centroid
    // upsert + replay skip + re-delivery noop, corpus check must noop
    "x3_ann_ivf_ingest" -> (IvfStore.x3AnnIvfIngest _),
    // index maintenance under delete: full build + tombstone delete must
    // serve the reduced corpus (frozen centroids, touched cells masked)
    "x3_ann_ivf_del" -> (IvfStore.x3AnnIvfDelete _),
    // the production serve path: fingerprint-gated ensureCurrent against
    // the canonical store, then the partition-pruned probe
    "x3_ann_ivf_served" -> (IvfStore.x3AnnIvfServed _),
    "x3_ann_recall" -> (Similarity.x3AnnRecall _),
    "x4_text_stats" -> (TextAnalysis.x4Stats _),
    "x4_token_count" -> (TextAnalysis.x4TokenCount _),
    "x4_lang_id" -> (TextAnalysis.x4LangId _),
    "x4_quality_score" -> (TextAnalysis.x4Quality _),
    "x4_fingerprint" -> (TextAnalysis.x4Fingerprint _),
    "x4_tfidf" -> (TextAnalysis.x4TfIdf _),
    "x4_redact" -> (TextAnalysis.x4Redact _),
    "x4_chunk" -> (TextAnalysis.x4Chunk _),
    "x4_repetition" -> (TextAnalysis.x4Repetition _),
    "x4_prep_funnel" -> (TextAnalysis.x4PrepFunnel _),
    "x6_stratified_sample" -> (Sampling.x6StratifiedSample _),
    "x6_hash_split" -> (Sampling.x6HashSplit _),
    "x5_nested_hof" -> (Multimodal.x5Nested _),
    "x5_media_features" -> (Multimodal.x5MediaFeatures _),
    "x5_frame_sample" -> (Multimodal.x5FrameSample _),
    "x5_resize" -> (Multimodal.x5Resize _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_revenue_agg" -> Relational.q1RevenueSql,
    "q3_shipping_priority" -> Analytics.q3Sql,
    "q5_local_supplier" -> Analytics.q5Sql,
    "q10_returned_items" -> Analytics.q10Sql,
    "q4_order_priority" -> Analytics.q4Sql,
    "q18_large_orders" -> Analytics.q18Sql,
    "q6_forecast" -> Analytics.q6Sql,
    "q7_volume_shipping" -> Analytics.q7Sql,
    "q8_market_share" -> Analytics.q8Sql,
    "q9_profit_shape" -> Analytics.q9Sql,
    "q14_promo_revenue" -> Analytics.q14Sql,
    "q15_top_supplier" -> Analytics.q15Sql,
    "q19_disjunctive" -> Analytics.q19Sql,
    "q21_waiting_supplier" -> Analytics.q21Sql,
    "q22_idle_rich" -> Analytics.q22Sql,
    "q12_priority_class" -> Analytics.q12Sql,
    "q13_custdist" -> Analytics.q13Sql,
    "q17_small_qty" -> Analytics.q17Sql,
    "q2_min_cost_supplier" -> Analytics.q2Sql,
    "q11_important_stock" -> Analytics.q11Sql,
    "q16_supplier_cnt" -> Analytics.q16Sql,
    "q20_promo_part_supp" -> Analytics.q20Sql,
    "r4_range_join_binned" -> graft.plans.RangeJoin.r4bSql,
    "r8_topk_grouped" -> graft.plans.TopKPerGroup.r8gSql,
    "a5_funnel" -> Analytics.a5FunnelSql,
    "a6_retention" -> Analytics.a6RetentionSql,
    "a7_anomaly" -> Analytics.a7AnomalySql,
    "x3_sq8_recall" -> Similarity.x3Sq8RecallSql,
    "s10_orc_scan" -> graft.sources.Sources.s10OrcScanSql,
    // the twin recomputes the rollup from the fixture table directly —
    // the partitioned write + pruned read round trip is under the gate
    "s11_date_rollup" -> graft.sources.DateStore.s11DateRollupSql,
    "s11_date_evolve" -> graft.sources.DateStore.s11DateEvolveSql,
    "s11_date_dpp" -> graft.sources.DateStore.s11DateDppSql,
    "s11_date_ingest" -> graft.sources.DateStore.s11DateIngestSql,
    "x6_pack_sequences" -> Sampling.x6PackSequencesSql,
    "x6_mixture" -> Sampling.x6MixtureSql,
    "x6_export_shards" -> Sampling.x6ExportShardsSql,
    "x4_ngram_lm" -> TextAnalysis.x4NgramLmSql,
    "x4_repetition" -> TextAnalysis.x4RepetitionSql,
    "x2_simhash_portable" -> Dedup.x2SimHashPortableSql,
    "dag_etl_clean" -> Dags.dagEtlCleanSql,
    "dag_etl_json_roundtrip" -> Dags.dagEtlJsonRoundtripSql,
    "dag_complex_union_gate" -> Dags.dagComplexUnionGateSql,
    "dag_kafka_validate_enrich_upsert" -> Dags.dagKafkaValidateEnrichUpsertSql,
    "dag_scrape_tag_upper" -> Dags.dagScrapeTagUpperSql,
    "dag_training_prep" -> Dags.dagTrainingPrepSql,
    "dag_corpus_build" -> Dags.dagCorpusBuildSql,
    // store-backed composite: store proven equal to the pipeline, so the
    // SAME oracle gates the production read path
    "dag_corpus_build_stored" -> Dags.dagCorpusBuildSql,
    "p1_dropna_any" -> Pipeline.p1Sql,
    "p2_dropna_all" -> Pipeline.p2Sql,
    "p3_validate" -> Pipeline.p3Sql,
    "p4_upper" -> Pipeline.p4Sql,
    "p5_enrich" -> Pipeline.p5Sql,
    "p6_envelope" -> Pipeline.p6Sql,
    "p7_tag_index" -> Pipeline.p7Sql,
    "p8_trim" -> Pipeline.p8Sql,
    "p9_to_json" -> Pipeline.p9Sql,
    "p10_from_json" -> Pipeline.p10Sql,
    "p11_head" -> Pipeline.p11Sql,
    "u1_union_by_name" -> Pipeline.u1Sql,
    "a1_count" -> Pipeline.a1Sql,
    "a2_branch_gate" -> Pipeline.a2Sql,
    "a4_dlq_routing" -> Pipeline.a4Sql,
    "l5_upsert_last_wins" -> Pipeline.l5Sql,
    "r1_join_multi" -> Relational.r1Sql,
    "r1_outer_join" -> Relational.r1OuterJoinSql,
    "r14_sql_entry" -> Relational.r14SqlEntrySql,
    "r2_broadcast_join" -> Relational.r2Sql,
    "r3_semi_join" -> Relational.r3SemiSql,
    "r3_anti_join" -> Relational.r3AntiSql,
    "r4_range_join" -> Relational.r4Sql,
    "r5_multi_agg" -> Relational.r5Sql,
    "r5_salted_agg" -> Relational.r5SaltedSql,
    // r5_approx_percentiles gates itself: exact value + in-query
    // |approx−exact| ≤ 1% boolean; the oracle asserts the boolean TRUE
    "r5_approx_percentiles" -> Relational.r5ApproxPercentilesSql,
    "r5_percentiles" -> Relational.r5PercentilesSql,
    "r6_distinct" -> Relational.r6Sql,
    // r6_approx_distinct gates itself: exact count + in-query
    // |approx−exact| ≤ 2×rsd boolean; the oracle asserts the boolean TRUE
    "r6_approx_distinct" -> Relational.r6ApproxSql,
    "r6_distinct_count" -> Relational.r6DistinctCountSql,
    // sketch union isn't reproducible in DuckDB — the oracle asserts the
    // in-query tolerance boolean plus the exact count (r6_approx style)
    "r6_hll_shards" -> Relational.r6HllShardsSql,
    "r6_theta_setops" -> Relational.r6ThetaSetopsSql,
    "r6_kll_shards" -> Relational.r6KllShardsSql,
    "r6_cm_freq" -> Relational.r6CmHeavyHittersSql,
    "r7_rollup" -> Relational.r7Sql,
    "r7_cube" -> Relational.r7CubeSql,
    "r7_grouping_sets" -> Relational.r7GroupingSetsSql,
    "r8_topk" -> Relational.r8Sql,
    "r9_window" -> Relational.r9Sql,
    "r9_frames" -> Relational.r9FramesSql,
    "r9_ranks" -> Relational.r9RanksSql,
    "r13_pivot" -> Relational.r13PivotSql,
    "r13_unpivot" -> Relational.r13UnpivotSql,
    "r10_intersect" -> Relational.r10IntersectSql,
    "r10_except" -> Relational.r10ExceptSql,
    "r10_union_distinct" -> Relational.r10UnionDistinctSql,
    "r11_functions" -> Relational.r11Sql,
    "r11_datetime" -> Relational.r11DateTimeSql,
    "r11_array_struct" -> Relational.r11ArrayStructSql,
    "r11_map" -> Relational.r11MapSql,
    "r11_strings" -> Relational.r11StringsSql,
    "r11_nulls" -> Relational.r11NullsSql,
    "r12_asof_join" -> Temporal.r12AsofJoinSql,
    "r15_scd2" -> Temporal.r15Scd2Sql,
    "t12_resample_locf" -> Temporal.t12ResampleLocfSql,
    "s1_http_scan" -> graft.sources.Sources.s1HttpScanSql,
    "s3_csv_scan" -> graft.sources.Sources.s3CsvScanSql,
    "s4_json_scan" -> graft.sources.Sources.s4JsonScanSql,
    "t8_sessionize_batch" -> Temporal.t8SessionizeBatchSql,
    "t1_bounded_consume" -> Streamy.t1Sql,
    "t5_dedup_first" -> Streamy.t5Sql,
    "t7_tumbling_window" -> Streamy.t7TumblingSql,
    "t7_sliding_window" -> Streamy.t7SlidingSql,
    "t7_session_window" -> Streamy.t7SessionSql,
    "x1_dedup_exact" -> Dedup.x1Sql,
    "x2_jaccard_neardup" -> Dedup.x2JaccardSql,
    // x2_minhash_lsh verifies candidates exactly, so its output equals
    // the exact all-pairs query — same oracle.
    "x2_minhash_lsh" -> Dedup.x2JaccardSql,
    // x2_simhash self-gates (the r5_approx_percentiles discipline): the
    // portable md5 fingerprint + its banded hamming partner counts are
    // hash-checked against DuckDB; the non-portable native digest is
    // gated in-query against the independent HOF formulation (oracle
    // asserts the boolean TRUE).
    "x2_simhash" -> Dedup.x2SimHashSql,
    "x2_embedding_neardup" -> Dedup.x2EmbeddingSql,
    "x2_dup_clusters" -> Dedup.x2DupClustersSql,
    // the incremental path must land on the same clusters as the
    // from-scratch pipeline — same oracle by design
    "x2_labels_incremental" -> Dedup.x2DupClustersSql,
    // the tombstone-delete path must land on the from-scratch clusters
    // of the REDUCED corpus — the twin reruns the CTE over it
    "x2_labels_delete" -> LabelStore.x2LabelsDeleteSql,
    "x2_dedup_keep" -> Dedup.x2DedupKeepSql,
    "x2_incremental" -> Dedup.x2IncrementalSql,
    "x2_evict_readmit" -> Dedup.x2EvictReadmitSql,
    "x7_decontaminate" -> Dedup.x7DecontaminateSql,
    "x7_decontam_keep" -> Dedup.x7DecontamKeepSql,
    // x2_embedding_lsh: at fixture corpus sizes the cost-based crossover
    // (lshBeatsBrute — threshold 0.5 banding cannot prune) takes the
    // exact arm, which IS the exact twin's computation; when the banded
    // arm engages it verifies candidates exactly (subset-of-exact, full
    // fixture recall pinned in LlmOpsSpec) — same oracle either way.
    "x2_embedding_lsh" -> Dedup.x2EmbeddingSql,
    // x2_embedding_lsh_auto runs at the cosine-0.9 operating threshold
    // with corpus-size-derived geometry (exact arm at fixture n by the
    // same crossover); on the structureless fixtures the exact ≥0.9
    // answer is empty, so the oracle pins the no-false-positive
    // direction — the positive (planted-twin) path is pinned in
    // Round7Spec
    "x2_embedding_lsh_auto" -> Dedup.x2EmbeddingAutoSql,
    // x2_embedding_lsh_banded forces the banded arm (8 bands × 8 planes,
    // far fraction 0.03 — clears the pruning bar) at the ≥0.9 threshold:
    // subset-of-exact ⇒ empty on the fixtures ⇒ hash-equal to the exact
    // twin; its positive path is the planted-twin spec in Round7Spec
    "x2_embedding_lsh_banded" -> Dedup.x2EmbeddingAutoSql,
    "x3_cosine_topk" -> Similarity.x3Sql,
    // x3_ann_recall: the DuckDB twin recomputes the banded-LSH pipeline
    // from the same deterministic plane constants — recall is an
    // oracle-checked number, not a rows-only claim.
    "x3_ann_recall" -> Similarity.x3AnnRecallSql,
    // x3_ann_lsh / x3_ann_ivf: the twins regenerate the FULL approximate
    // pipelines (deterministic planes / md5 seed order + exact-decimal
    // centroid means), so the ANN outputs themselves are hash-checked.
    "x3_ann_lsh" -> Similarity.x3AnnLshSql,
    "x3_ann_ivf" -> Similarity.x3AnnIvfSql,
    // the store round trip is bit-deterministic (md5 seed order, exact
    // decimal means, lossless double round-trip) — same oracle
    "x3_ann_ivf_store" -> Similarity.x3AnnIvfSql,
    // the maintained index equals a from-scratch construction with the
    // same frozen centroids — the twin derives them from the base subset
    "x3_ann_ivf_inc" -> Similarity.x3AnnIvfIncSql,
    // identical final index state to x3_ann_ivf_inc (same base subset
    // trains the centroids, same full corpus assigned) — same twin
    "x3_ann_ivf_ingest" -> Similarity.x3AnnIvfIncSql,
    // the tombstone-deleted index equals a from-scratch assignment of the
    // reduced corpus to the same (full-corpus) centroids
    "x3_ann_ivf_del" -> Similarity.x3AnnIvfDelSql,
    // served probe is bit-identical to the in-query build — same oracle
    "x3_ann_ivf_served" -> Similarity.x3AnnIvfSql,
    "x4_text_stats" -> TextAnalysis.x4StatsSql,
    "x4_token_count" -> TextAnalysis.x4TokenCountSql,
    "x4_lang_id" -> TextAnalysis.x4LangIdSql,
    "x4_quality_score" -> TextAnalysis.x4QualitySql,
    "x4_fingerprint" -> TextAnalysis.x4FingerprintSql,
    "x4_tfidf" -> TextAnalysis.x4TfIdfSql,
    "x4_redact" -> TextAnalysis.x4RedactSql,
    "x4_chunk" -> TextAnalysis.x4ChunkSql,
    "x4_prep_funnel" -> TextAnalysis.x4PrepFunnelSql,
    "x6_stratified_sample" -> Sampling.x6StratifiedSampleSql,
    "x6_hash_split" -> Sampling.x6HashSplitSql,
    "x5_nested_hof" -> Multimodal.x5NestedSql,
    "x5_media_features" -> Multimodal.x5MediaSql,
    "x5_frame_sample" -> Multimodal.x5FrameSampleSql,
    // x5_resize carries the kernel's exact byte product as an md5 the
    // oracle rebuilds character-by-character (ASCII fixture)
    "x5_resize" -> Multimodal.x5ResizeSql
  )
}
