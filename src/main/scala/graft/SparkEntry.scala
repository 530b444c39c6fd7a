package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.profiling.{FreqProfiler, Profiler}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * unless the operator is not SQL-expressible (then rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * single-scan full profile of `lineitem`. */
  def entry(spark: SparkSession): DataFrame =
    Profiler.profile(spark, "/root/testdata/sf0.001", "lineitem")

  private def profiled(table: String): (String, (SparkSession, String) => DataFrame) =
    s"profile_$table" -> ((s: SparkSession, dir: String) => Profiler.profile(s, dir, table))

  /** Tables that have at least one A-typed (string) column. */
  private val aTables: Seq[String] = Tables.names.filter { t =>
    Tables.schemas(t).fields.exists(f =>
      graft.profiling.GeneralType.of(f.dataType) == "A")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Tables.names.map(profiled).toMap ++
      aTables.map { t =>
        s"freq_profile_$t" ->
          ((s: SparkSession, dir: String) => FreqProfiler.profile(s, dir, t))
      }.toMap ++
      graft.cat.CatSuite.suites.keys.map { t =>
        s"cat_tests_$t" ->
          ((s: SparkSession, dir: String) => graft.cat.CatSuite.run(s, dir, t))
      }.toMap ++
      graft.querytests.QueryTests.tests.map { qt =>
        s"query_${qt.name}" ->
          ((s: SparkSession, dir: String) => graft.querytests.QueryTests.run(s, dir, qt.name))
      }.toMap ++
      Seq[(String, (SparkSession, String) => DataFrame)](
      ("functional_datatype" ->
        ((s: SparkSession, dir: String) => graft.inference.FunctionalType.infer(s, dir))),
      ("hygiene_screens" ->
        ((s: SparkSession, dir: String) => graft.inference.HygieneScreens.run(s, dir))),
      ("test_generation" ->
        ((s: SparkSession, dir: String) => graft.generation.TestGenerator.run(s, dir))),
      ("test_prevalence" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runTestPrevalence(s, dir))),
      ("observability_export" ->
        ((s: SparkSession, dir: String) => graft.scoring.Observability.run(s, dir))),
      ("freq_heavy_hitters" ->
        ((s: SparkSession, dir: String) => graft.profiling.HeavyHitters.run(s, dir))),
      ("sample_priority_k" ->
        ((s: SparkSession, dir: String) => graft.pipeline.PrioritySample.run(s, dir))),
      ("event_day_pruned" ->
        ((s: SparkSession, dir: String) => graft.core.TimeLayout.runDayRollup(s, dir))),
      ("dq_scores" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runScoreRollup(s, dir))),
      ("text_analysis" ->
        ((s: SparkSession, dir: String) => graft.pipeline.TextAnalysis.run(s, dir))),
      ("text_repetition" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Repetition.run(s, dir))),
      ("corpus_stats" ->
        ((s: SparkSession, dir: String) => graft.pipeline.CorpusStats.run(s, dir))),
      ("pii_scrub" ->
        ((s: SparkSession, dir: String) => graft.pipeline.PiiScrub.run(s, dir))),
      ("sample_stratified" ->
        ((s: SparkSession, dir: String) => graft.pipeline.StratifiedSample.run(s, dir))),
      ("embedding_stats" ->
        ((s: SparkSession, dir: String) => graft.pipeline.EmbeddingStats.run(s, dir))),
      ("chunk_documents" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Chunker.run(s, dir))),
      ("pack_chunks" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Packer.run(s, dir))),
      ("pack_chunks_exact" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Packer.runExact(s, dir))),
      ("dedup_chunks" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Chunker.runDup(s, dir))),
      ("dedup_chunks_fuzzy" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runFuzzyChunks(s, dir))),
      ("doc_keywords" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Keywords.run(s, dir))),
      ("dedup_exact" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runExact(s, dir))),
      ("dedup_jaccard" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runJaccard(s, dir))),
      ("dedup_minhash" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runMinhash(s, dir))),
      ("dedup_simhash" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runSimhash(s, dir))),
      ("dedup_winnow" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runWinnow(s, dir))),
      ("dedup_clusters" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runClusters(s, dir))),
      ("dedup_source_matrix" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runSourceMatrix(s, dir))),
      ("dedup_containment" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runContainment(s, dir))),
      ("dedup_lsh_recall" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runLshRecall(s, dir))),
      ("dedup_semantic" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runSemantic(s, dir))),
      ("corpus_percentiles" ->
        ((s: SparkSession, dir: String) => graft.pipeline.CorpusStats.runPercentiles(s, dir))),
      ("corpus_drift" ->
        ((s: SparkSession, dir: String) => graft.pipeline.CorpusDrift.run(s, dir))),
      ("pack_epochs" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Packer.runEpochs(s, dir))),
      ("quality_classifier" ->
        ((s: SparkSession, dir: String) => graft.pipeline.QualityClassifier.run(s, dir))),
      ("chunk_cdc" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Chunker.runCdc(s, dir))),
      ("event_sessions" ->
        ((s: SparkSession, dir: String) => graft.streaming.Sessions.run(s, dir))),
      ("vocab_coverage" ->
        ((s: SparkSession, dir: String) => graft.pipeline.VocabCoverage.run(s, dir))),
      ("bm25_retrieval" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Retrieval.runBm25(s, dir))),
      ("hybrid_retrieval" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Retrieval.runHybrid(s, dir))),
      ("retrieval_quality" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Retrieval.runQuality(s, dir))),
      ("knn_filtered" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runFiltered(s, dir))),
      ("event_funnel" ->
        ((s: SparkSession, dir: String) => graft.streaming.EventAnalytics.runFunnel(s, dir))),
      ("event_retention" ->
        ((s: SparkSession, dir: String) => graft.streaming.EventAnalytics.runRetention(s, dir))),
      ("event_pattern" ->
        ((s: SparkSession, dir: String) => graft.streaming.EventAnalytics.runPattern(s, dir))),
      ("source_mixture" ->
        ((s: SparkSession, dir: String) => graft.pipeline.SourceMixture.run(s, dir))),
      ("boilerplate_ngrams" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Boilerplate.run(s, dir))),
      ("quality_gate" ->
        ((s: SparkSession, dir: String) => graft.pipeline.QualityGate.run(s, dir))),
      ("corpus_kept_stats" ->
        ((s: SparkSession, dir: String) => graft.pipeline.CorpusStats.runKept(s, dir))),
      ("lang_id_confusion" ->
        ((s: SparkSession, dir: String) => graft.pipeline.CorpusStats.runConfusion(s, dir))),
      ("token_histogram" ->
        ((s: SparkSession, dir: String) => graft.pipeline.TokenHistogram.run(s, dir))),
      ("chunk_lang_consistency" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Chunker.runLangConsistency(s, dir))),
      ("decontaminate" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runDecontaminate(s, dir))),
      ("dedup_incremental" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runIncremental(s, dir))),
      ("decontaminate_report" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runDecontaminateReport(s, dir))),
      ("batch_novelty" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runBatchNovelty(s, dir))),
      ("knn_bruteforce" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runBruteForce(s, dir))),
      ("knn_ivf" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runIvf(s, dir))),
      ("knn_ivf_seeded" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runIvfSeeded(s, dir))),
      ("knn_ivf_probe" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runIvfProbe(s, dir))),
      ("knn_quantized" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runQuantized(s, dir))),
      ("knn_recall" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runRecall(s, dir))),
      ("monitor_volume_bands" ->
        ((s: SparkSession, dir: String) => graft.streaming.Monitors.runVolumeBands(s, dir))),
      ("monitor_freshness" ->
        ((s: SparkSession, dir: String) => graft.streaming.Monitors.runFreshness(s, dir))),
      ("multimodal_features" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Multimodal.run(s, dir))),
      ("lookup_duplicates" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runDuplicates(s, dir))),
      ("lookup_duplicates_sampled" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runDuplicatesSampled(s, dir))),
      ("lookup_min_date_sampled" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runMinDateSampled(s, dir))),
      ("lookup_max_length" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runMaxLength(s, dir))),
      ("lookup_masked" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runMasked(s, dir))),
      ("profile_masked" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runProfileMasked(s, dir))),
      ("lookup_recency" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runRecency(s, dir))),
      ("lookup_outliers" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runOutliers(s, dir))),
      ("dedup_embedding" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runEmbedding(s, dir))),
      ("dedup_embedding_lsh" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runEmbeddingLsh(s, dir))),
      ("monitor_trend_forecast" ->
        ((s: SparkSession, dir: String) => graft.streaming.Monitors.runTrendForecast(s, dir))),
      ("monitor_metric_trend" ->
        ((s: SparkSession, dir: String) => graft.streaming.Monitors.runMetricTrend(s, dir))),
      ("monitor_freshness_gaps" ->
        ((s: SparkSession, dir: String) => graft.streaming.Monitors.runFreshnessGaps(s, dir))),
      ("contingency_rules" ->
        ((s: SparkSession, dir: String) => graft.inference.Contingency.run(s, dir))),
      ("score_cards" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runScoreCard(s, dir))),
      ("schema_drift" ->
        ((s: SparkSession, dir: String) => graft.inference.SchemaDrift.run(s, dir))),
      ("monitor_sarimax" ->
        ((s: SparkSession, dir: String) => graft.streaming.Monitors.runSarimax(s, dir))),
      ("profile_sampled" ->
        ((s: SparkSession, dir: String) => graft.profiling.SampledProfiler.run(s, dir))),
      ("profile_approx_report" ->
        ((s: SparkSession, dir: String) =>
          graft.profiling.ApproxProfiler.report(s, dir, "lineitem"))),
      ("profile_incremental" ->
        ((s: SparkSession, dir: String) =>
          graft.pipeline.IncrementalProfile.run(s, dir))),
      ("knn_hard_negatives" ->
        ((s: SparkSession, dir: String) =>
          graft.pipeline.Similarity.runHardNegatives(s, dir))),
      ("event_asof_order" ->
        ((s: SparkSession, dir: String) =>
          graft.operators.AsofJoin.run(s, dir))),
      ("doc_signals" ->
        ((s: SparkSession, dir: String) =>
          graft.pipeline.QualityGate.runDocSignals(s, dir))),
      ("event_range_burst" ->
        ((s: SparkSession, dir: String) =>
          graft.operators.RangeJoin.run(s, dir))),
      ("corpus_ngram_novelty" ->
        ((s: SparkSession, dir: String) =>
          graft.pipeline.NgramNovelty.run(s, dir))),
      ("dedup_minhash_calibration" ->
        ((s: SparkSession, dir: String) =>
          graft.pipeline.Dedup.runMinhashCalibration(s, dir))),
      ("data_chars" ->
        ((s: SparkSession, dir: String) => graft.core.DataChars.run(s, dir))),
      // include/exclude LIKE masks (refresh_data_chars_query.py:67-101):
      // keep tables containing 'e', drop tables ending in 's'
      ("data_chars_masked" ->
        ((s: SparkSession, dir: String) =>
          graft.core.DataChars.run(s, dir, Some("%e%"), Some("%s")))),
      ("test_validation" ->
        ((s: SparkSession, dir: String) => graft.generation.TestValidation.runChecked(s, dir))),
      ("functional_tabletype" ->
        ((s: SparkSession, dir: String) => graft.generation.TestGenerator.runTableType(s, dir))),
      ("lookup_dupe_rows" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runDupeRows(s, dir))),
      ("lookup_email_format" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runEmailFormat(s, dir))),
      ("lookup_min_date" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runMinDate(s, dir))),
      ("lookup_failed_tests" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runFailedTests(s, dir))),
      ("lookup_query_tests" ->
        ((s: SparkSession, dir: String) => graft.querytests.QueryTests.runLookupAll(s, dir))),
      ("lookup_hygiene" ->
        ((s: SparkSession, dir: String) => graft.lookup.DrillDown.runHygieneLookup(s, dir))),
      ("knn_lsh" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runLsh(s, dir))),
      // production-dims bucket form (Spark HOFs — no DuckDB oracle;
      // PipelineSpec asserts bit-identity with the oracle-checked form)
      ("knn_lsh_fold" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runLshFold(s, dir))),
      ("monitor_schedule" ->
        ((s: SparkSession, dir: String) => graft.streaming.Monitors.runSchedule(s, dir))),
      ("monitor_history_thresholds" ->
        ((s: SparkSession, dir: String) => graft.streaming.Monitors.runHistoryThresholds(s, dir))),
      // PREDICT-mode SARIMAX tolerances over landed signal history —
      // iterative model fit, not SQL-expressible (rows-only check,
      // MonitorsSpec parity + RunHistorySpec multi-run landing)
      ("monitor_predict_thresholds" ->
        ((s: SparkSession, dir: String) => graft.streaming.Monitors.runPredictThresholds(s, dir))),
      ("dq_scores_weighted" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runWeightedScoreRollup(s, dir))),
      ("score_card_columns" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runScoreCardColumns(s, dir))),
      ("score_card_dimensions" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runScoreCardDimensions(s, dir))),
      ("score_card_history" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runScoreHistory(s, dir))),
      ("score_card_issues" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runScoreCardIssues(s, dir))),
      ("score_card_issues_dimensions" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runScoreCardIssuesDimensions(s, dir))),
      ("score_card_issues_impact" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runScoreCardIssuesImpact(s, dir))),
      ("score_card_history_columns" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runScoreHistoryColumns(s, dir))),
      ("score_card_categories" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runScoreCardCategories(s, dir))),
      ("query_test_prevalence" ->
        ((s: SparkSession, dir: String) => graft.scoring.Scoring.runQueryPrevalence(s, dir))),
      ("doc_outliers" ->
        ((s: SparkSession, dir: String) => graft.pipeline.DocStats.runOutliers(s, dir))),
      ("readability" ->
        ((s: SparkSession, dir: String) => graft.pipeline.DocStats.runReadability(s, dir))),
      ("bpe_pairs" ->
        ((s: SparkSession, dir: String) => graft.pipeline.BpeMerges.run(s, dir))),
      ("embedding_outliers" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runOutliers(s, dir))),
      ("decontaminate_semantic" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runDecontaminateSemantic(s, dir))),
      ("decontaminate_semantic_stack" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runDecontaminateStack(s, dir))),
      ("dedup_band_geometry" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runBandGeometry(s, dir))),
      ("graph_domain_rank" ->
        ((s: SparkSession, dir: String) => graft.pipeline.DomainRank.runDomainRank(s, dir))),
      ("select_rank_budget" ->
        ((s: SparkSession, dir: String) => graft.pipeline.DomainRank.runRankBudget(s, dir))),
      ("graph_harmonic" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Harmonic.runHarmonic(s, dir))),
      ("graph_cocitation" ->
        ((s: SparkSession, dir: String) => graft.pipeline.CoCitation.runCocitation(s, dir))),
      ("graph_communities" ->
        ((s: SparkSession, dir: String) => graft.pipeline.GraphCommunities.runCommunities(s, dir))),
      ("event_rate_anomaly" ->
        ((s: SparkSession, dir: String) => graft.streaming.EventAnalytics.runRateAnomaly(s, dir))),
      ("event_props_stats" ->
        ((s: SparkSession, dir: String) => graft.streaming.EventAnalytics.runPropsStats(s, dir))),
      ("lookup_rate_anomaly" ->
        ((s: SparkSession, dir: String) => graft.streaming.EventAnalytics.runLookupRateAnomaly(s, dir))),
      ("skew_report" ->
        ((s: SparkSession, dir: String) => graft.core.SkewReport.run(s, dir))),
      ("pack_curriculum" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Packer.runCurriculum(s, dir))),
      ("bpe_apply" ->
        ((s: SparkSession, dir: String) => graft.pipeline.BpeMerges.runApply(s, dir))),
      ("profile_correlations" ->
        ((s: SparkSession, dir: String) => graft.profiling.Correlations.run(s, dir))),
      ("dedup_survivor_audit" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runSurvivorAudit(s, dir))),
      ("knn_pq" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runPq(s, dir))),
      ("dsir_scores" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Selection.runDsir(s, dir))),
      ("dsir_token_budget" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Selection.runBudget(s, dir))),
      ("media_phash_dedup" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Multimodal.runPhashDedup(s, dir))),
      ("media_audio_dedup" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Multimodal.runAudioDedup(s, dir))),
      ("media_video_framesample" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Multimodal.runVideoFrameSample(s, dir))),
      ("media_video_dedup" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Multimodal.runVideoDedup(s, dir))),
      ("media_container_meta" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Multimodal.runContainerMeta(s, dir))),
      ("lm_perplexity" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Perplexity.run(s, dir))),
      ("decontaminate_bloom" ->
        ((s: SparkSession, dir: String) => graft.pipeline.BloomDecontam.run(s, dir))),
      ("embedding_gram" ->
        ((s: SparkSession, dir: String) => graft.pipeline.EmbeddingAlgebra.runGram(s, dir))),
      ("embedding_jl_projection" ->
        ((s: SparkSession, dir: String) => graft.pipeline.EmbeddingAlgebra.runJlProjection(s, dir))),
      ("sample_mixture" ->
        ((s: SparkSession, dir: String) => graft.pipeline.SourceMixture.runSample(s, dir))),
      ("embedding_standardized" ->
        ((s: SparkSession, dir: String) => graft.pipeline.EmbeddingAlgebra.runStandardized(s, dir))),
      ("curation_ledger" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Selection.runLedger(s, dir))),
      ("substring_duplication" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Selection.runSubstringDup(s, dir))),
      ("kmeans_refine" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runKmeansRefine(s, dir))),
      ("sample_cluster_balanced" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runClusterSample(s, dir))),
      ("dedup_canonical" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runCanonical(s, dir))),
      ("tokenizer_fertility" ->
        ((s: SparkSession, dir: String) => graft.pipeline.TokenizerFertility.run(s, dir))),
      ("substring_rewrite" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Selection.runSubstringRewrite(s, dir))),
      ("corpus_doc_drift" ->
        ((s: SparkSession, dir: String) => graft.pipeline.DocDrift.run(s, dir))),
      ("split_leakage_free" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Selection.runSplit(s, dir))),
      ("quality_calibration" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Selection.runCalibration(s, dir))),
      ("dedup_threshold_sweep" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runThresholdSweep(s, dir))),
      ("decontaminate_ngram" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Selection.runNgramDecontaminate(s, dir))),
      ("ann_occupancy" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Similarity.runOccupancy(s, dir))),
      ("lookup_dedup_pairs" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runPairLookup(s, dir))),
      ("curation_funnel" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Selection.runFunnel(s, dir))),
      ("dedup_embedding_sweep" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runEmbeddingSweep(s, dir))),
      ("dedup_embedding_stack" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runEmbeddingStack(s, dir))),
      ("event_attribution" ->
        ((s: SparkSession, dir: String) => graft.streaming.EventAnalytics.runAttribution(s, dir))),
      ("url_normalize" ->
        ((s: SparkSession, dir: String) => graft.pipeline.UrlOps.runNormalize(s, dir))),
      ("url_domain_cap" ->
        ((s: SparkSession, dir: String) => graft.pipeline.UrlOps.runDomainCap(s, dir))),
      ("event_zorder_pruned" ->
        ((s: SparkSession, dir: String) => graft.core.ZOrderLayout.runRectPruned(s, dir))),
      ("corpus_grouping_sets" ->
        ((s: SparkSession, dir: String) => graft.pipeline.CorpusCube.run(s, dir))),
      ("sample_weighted_k" ->
        ((s: SparkSession, dir: String) => graft.pipeline.PrioritySample.runWeighted(s, dir))),
      ("sketch_distinct_union" ->
        ((s: SparkSession, dir: String) => graft.profiling.SketchStore.run(s, dir))),
      ("privacy_k_anonymity" ->
        ((s: SparkSession, dir: String) => graft.inference.KAnonymity.run(s, dir))),
      ("profile_benford" ->
        ((s: SparkSession, dir: String) => graft.profiling.Benford.run(s, dir))),
      ("event_attribution_multitouch" ->
        ((s: SparkSession, dir: String) => graft.streaming.EventAnalytics.runMultiTouch(s, dir))),
      ("fk_integrity" ->
        ((s: SparkSession, dir: String) => graft.inference.Referential.run(s, dir))),
      ("scd2_build" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Scd2.run(s, dir))),
      ("drift_ks" ->
        ((s: SparkSession, dir: String) => graft.profiling.KsDrift.run(s, dir))),
      ("privacy_l_diversity" ->
        ((s: SparkSession, dir: String) => graft.inference.LDiversity.run(s, dir))),
      ("event_changepoint" ->
        ((s: SparkSession, dir: String) => graft.streaming.Changepoint.run(s, dir))),
      ("reconcile_tables" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Reconcile.run(s, dir))),
      ("drift_psi" ->
        ((s: SparkSession, dir: String) => graft.profiling.PsiDrift.run(s, dir))),
      ("drift_chisq" ->
        ((s: SparkSession, dir: String) => graft.profiling.ChisqDrift.run(s, dir))),
      ("text_encoding_screen" ->
        ((s: SparkSession, dir: String) => graft.pipeline.EncodingScreen.run(s, dir))),
      ("entity_match" ->
        ((s: SparkSession, dir: String) => graft.pipeline.EntityMatch.run(s, dir))),
      ("retrieval_mmr" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Retrieval.runMmr(s, dir))),
      ("bpe_train" ->
        ((s: SparkSession, dir: String) => graft.pipeline.BpeMerges.runTrain(s, dir))),
      ("event_interval_overlap" ->
        ((s: SparkSession, dir: String) => graft.operators.IntervalJoin.run(s, dir))),
      ("bpe_train_compression" ->
        ((s: SparkSession, dir: String) =>
          graft.pipeline.BpeMerges.runTrainCompression(s, dir))),
      ("dedup_simhash_sweep" ->
        ((s: SparkSession, dir: String) => graft.pipeline.Dedup.runSimhashSweep(s, dir))),
      ("classifier_train" ->
        ((s: SparkSession, dir: String) => graft.pipeline.ClassifierTrain.runTrain(s, dir))),
      ("classifier_eval" ->
        ((s: SparkSession, dir: String) => graft.pipeline.ClassifierTrain.runEval(s, dir)))
      ).toMap

  def oracleSql: Map[String, String] =
    Tables.names.map { t =>
      s"profile_$t" -> Profiler.duckSql(t, Tables.schemas(t))
    }.toMap ++
      Map("profile_approx_report" ->
        graft.profiling.ApproxProfiler.reportDuckSql(
          "lineitem", Tables.schemas("lineitem"))) ++
      aTables.map { t =>
        s"freq_profile_$t" -> FreqProfiler.duckSql(t, Tables.schemas(t))
      }.toMap ++
      graft.cat.CatSuite.suites.keys.map { t =>
        s"cat_tests_$t" -> graft.cat.CatSuite.duckSql(t)
      }.toMap ++
      graft.querytests.QueryTests.tests.map { qt =>
        s"query_${qt.name}" -> graft.querytests.QueryTests.duckSql(qt.name)
      }.toMap ++
      Seq[(String, String)](
      ("functional_datatype" -> graft.inference.FunctionalType.duckSql()),
      ("hygiene_screens" -> graft.inference.HygieneScreens.duckSql()),
      ("test_generation" -> graft.generation.TestGenerator.duckSql()),
      ("test_prevalence" -> graft.scoring.Scoring.duckTestPrevalenceSql()),
      ("observability_export" -> graft.scoring.Observability.duckSql()),
      ("freq_heavy_hitters" -> graft.profiling.HeavyHitters.duckSql()),
      ("sample_priority_k" -> graft.pipeline.PrioritySample.duckSql()),
      ("event_day_pruned" -> graft.core.TimeLayout.duckSql()),
      ("dq_scores" -> graft.scoring.Scoring.duckScoreRollupSql()),
      ("text_analysis" -> graft.pipeline.TextAnalysis.duckSql()),
      ("text_repetition" -> graft.pipeline.Repetition.duckSql()),
      ("corpus_stats" -> graft.pipeline.CorpusStats.duckSql()),
      ("pii_scrub" -> graft.pipeline.PiiScrub.duckSql()),
      ("sample_stratified" -> graft.pipeline.StratifiedSample.duckSql()),
      ("embedding_stats" -> graft.pipeline.EmbeddingStats.duckSql()),
      ("chunk_documents" -> graft.pipeline.Chunker.duckSql()),
      ("pack_chunks" -> graft.pipeline.Packer.duckSql()),
      ("pack_chunks_exact" -> graft.pipeline.Packer.duckExactSql()),
      ("dedup_chunks" -> graft.pipeline.Chunker.duckDupSql()),
      ("dedup_chunks_fuzzy" -> graft.pipeline.Dedup.fuzzyChunksSql("documents")(graft.oracle.DuckDialect)),
      ("doc_keywords" -> graft.pipeline.Keywords.duckSql()),
      ("dedup_exact" -> graft.pipeline.Dedup.exactSql("documents")(graft.oracle.DuckDialect)),
      ("dedup_jaccard" -> graft.pipeline.Dedup.jaccardSql("documents")(graft.oracle.DuckDialect)),
      ("dedup_minhash" -> graft.pipeline.Dedup.minhashSql("documents")(graft.oracle.DuckDialect)),
      ("dedup_simhash" -> graft.pipeline.Dedup.simhashSql("documents")(graft.oracle.DuckDialect)),
      ("dedup_winnow" -> graft.pipeline.Dedup.winnowSql("documents")(graft.oracle.DuckDialect)),
      // dedup_clusters: the oracle resolves connected components with a
      // recursive transitive closure; the engine runs distributed
      // min-label propagation — same deterministic fixpoint.
      ("dedup_clusters" -> graft.pipeline.Dedup.clustersSql("documents")(graft.oracle.DuckDialect)),
      ("dedup_source_matrix" -> graft.pipeline.Dedup.sourceMatrixSql("documents")(graft.oracle.DuckDialect)),
      ("dedup_containment" -> graft.pipeline.Dedup.containmentSql("documents")(graft.oracle.DuckDialect)),
      ("dedup_lsh_recall" -> graft.pipeline.Dedup.lshRecallSql("documents")(graft.oracle.DuckDialect)),
      ("dedup_semantic" -> graft.pipeline.Similarity.semanticSql("embeddings")(graft.oracle.DuckDialect)),
      ("corpus_percentiles" -> graft.pipeline.CorpusStats.duckPercentilesSql()),
      // corpus_drift: like schema_drift, the Spark run lands both
      // snapshots first; DuckDB diffs the same landed files.
      ("corpus_drift" -> graft.pipeline.CorpusDrift.duckSql()),
      ("pack_epochs" -> graft.pipeline.Packer.duckEpochsSql()),
      ("quality_classifier" -> graft.pipeline.QualityClassifier.duckSql()),
      ("chunk_cdc" -> graft.pipeline.Chunker.duckCdcSql()),
      ("event_sessions" -> graft.streaming.Sessions.duckSql()),
      ("vocab_coverage" -> graft.pipeline.VocabCoverage.duckSql()),
      ("bm25_retrieval" -> graft.pipeline.Retrieval.duckBm25Sql()),
      ("hybrid_retrieval" -> graft.pipeline.Retrieval.duckHybridSql()),
      ("retrieval_quality" -> graft.pipeline.Retrieval.duckQualitySql()),
      ("knn_filtered" -> graft.pipeline.Similarity.filteredSql("embeddings")(graft.oracle.DuckDialect)),
      ("event_funnel" -> graft.streaming.EventAnalytics.duckFunnelSql()),
      ("event_retention" -> graft.streaming.EventAnalytics.duckRetentionSql()),
      ("event_pattern" -> graft.streaming.EventAnalytics.duckPatternSql()),
      ("source_mixture" -> graft.pipeline.SourceMixture.duckSql()),
      ("boilerplate_ngrams" -> graft.pipeline.Boilerplate.duckSql()),
      ("quality_gate" -> graft.pipeline.QualityGate.duckSql()),
      ("corpus_kept_stats" -> graft.pipeline.CorpusStats.duckKeptSql()),
      ("lang_id_confusion" -> graft.pipeline.CorpusStats.duckConfusionSql()),
      ("token_histogram" -> graft.pipeline.TokenHistogram.duckSql()),
      ("chunk_lang_consistency" -> graft.pipeline.Chunker.duckLangConsistencySql()),
      ("decontaminate" -> graft.pipeline.Dedup.decontaminateSql("documents")(graft.oracle.DuckDialect)),
      ("dedup_incremental" -> graft.pipeline.Dedup.incrementalSql("documents")(graft.oracle.DuckDialect)),
      ("decontaminate_report" -> graft.pipeline.Dedup.decontaminateReportFullSql("documents")(graft.oracle.DuckDialect)),
      ("batch_novelty" -> graft.pipeline.Dedup.batchNoveltyFullSql("documents")(graft.oracle.DuckDialect)),
      ("knn_bruteforce" -> graft.pipeline.Similarity.bruteForceSql("embeddings")(graft.oracle.DuckDialect)),
      ("knn_ivf" -> graft.pipeline.Similarity.ivfSql("embeddings")(graft.oracle.DuckDialect)),
      ("knn_ivf_seeded" -> graft.pipeline.Similarity.ivfSeededSql("embeddings")(graft.oracle.DuckDialect)),
      ("knn_ivf_probe" -> graft.pipeline.Similarity.ivfSeededSql("embeddings", nProbe = 2)(graft.oracle.DuckDialect)),
      ("knn_quantized" -> graft.pipeline.Similarity.quantizedSql("embeddings")(graft.oracle.DuckDialect)),
      ("knn_recall" -> graft.pipeline.Similarity.recallSql("embeddings")(graft.oracle.DuckDialect)),
      ("monitor_volume_bands" -> graft.streaming.Monitors.duckVolumeBandsSql()),
      ("monitor_freshness" -> graft.streaming.Monitors.duckFreshnessSql()),
      ("multimodal_features" -> graft.pipeline.Multimodal.duckSql()),
      ("lookup_duplicates" -> graft.lookup.DrillDown.duckDuplicatesSql()),
      ("lookup_duplicates_sampled" -> graft.lookup.DrillDown.duckDuplicatesSampledSql()),
      ("lookup_min_date_sampled" -> graft.lookup.DrillDown.duckMinDateSampledSql()),
      ("lookup_max_length" -> graft.lookup.DrillDown.duckMaxLengthSql()),
      ("lookup_masked" -> graft.lookup.DrillDown.duckMaskedSql()),
      ("profile_masked" -> graft.lookup.DrillDown.duckProfileMaskedSql()),
      ("lookup_recency" -> graft.lookup.DrillDown.duckRecencySql()),
      ("lookup_failed_tests" -> graft.lookup.DrillDown.duckFailedTestsSql()),
      ("lookup_query_tests" -> graft.querytests.QueryTests.duckLookupAllSql()),
      ("lookup_hygiene" -> graft.lookup.DrillDown.duckHygieneLookupSql()),
      ("monitor_history_thresholds" -> graft.streaming.Monitors.duckHistoryThresholdsSql()),
      ("lookup_outliers" -> graft.lookup.DrillDown.duckOutliersSql()),
      ("dedup_embedding" -> graft.pipeline.Dedup.embeddingSql("embeddings")(graft.oracle.DuckDialect)),
      ("dedup_embedding_lsh" -> graft.pipeline.Dedup.embeddingLshSql("embeddings")(graft.oracle.DuckDialect)),
      ("monitor_trend_forecast" -> graft.streaming.Monitors.duckTrendForecastSql()),
      ("monitor_metric_trend" -> graft.streaming.Monitors.duckMetricTrendSql()),
      ("monitor_freshness_gaps" -> graft.streaming.Monitors.duckFreshnessGapsSql()),
      ("contingency_rules" -> graft.inference.Contingency.duckSql()),
      // schema_drift: the Spark run lands both data_chars snapshots as
      // parquet (Verify executes queries before the driver runs the
      // oracle), so DuckDB diffs the same landed files.
      ("schema_drift" -> graft.inference.SchemaDrift.duckSql()),
      // The iterative-fit monitors are not SQL-expressible, but each is a
      // deterministic function of the fixed gate fixture — frozen VALUES
      // oracles (cross-validated by FreshnessSpec / TimeSeriesSpec /
      // MonitorsSpec model parity tests) let rows+schema+hash all check.
      ("monitor_schedule" -> graft.streaming.Monitors.duckScheduleSql()),
      ("monitor_sarimax" -> graft.streaming.Monitors.duckSarimaxSql()),
      ("monitor_predict_thresholds" -> graft.streaming.Monitors.duckPredictThresholdsSql()),
      // knn_lsh_fold emits BIT-IDENTICAL rows to knn_lsh (PipelineSpec
      // asserts it), so the unrolled form's DuckDB rendering is its oracle
      ("knn_lsh_fold" -> graft.pipeline.Similarity.lshSql("embeddings")(graft.oracle.DuckDialect)),
      ("score_cards" -> graft.scoring.Scoring.duckScoreCardSql()),
      ("profile_sampled" -> graft.profiling.SampledProfiler.duckSql()),
      ("data_chars" -> graft.core.DataChars.duckSql()),
      ("data_chars_masked" -> graft.core.DataChars.duckSql(Some("%e%"), Some("%s"))),
      ("test_validation" -> graft.generation.TestValidation.duckSql()),
      ("functional_tabletype" -> graft.generation.TestGenerator.duckTableTypeSql()),
      ("lookup_dupe_rows" -> graft.lookup.DrillDown.duckDupeRowsSql()),
      ("lookup_email_format" -> graft.lookup.DrillDown.duckEmailFormatSql()),
      ("lookup_min_date" -> graft.lookup.DrillDown.duckMinDateSql()),
      ("knn_lsh" -> graft.pipeline.Similarity.lshSql("embeddings")(graft.oracle.DuckDialect)),
      ("dq_scores_weighted" -> graft.scoring.Scoring.duckWeightedScoreRollupSql()),
      ("score_card_columns" -> graft.scoring.Scoring.duckScoreCardColumnsSql()),
      ("score_card_dimensions" -> graft.scoring.Scoring.duckScoreCardDimensionsSql()),
      // score_card_history: the oracle recomputes both runs' score detail
      // from first principles (raw tables + the same dismissal list), so
      // the landed trend values are independently verified
      ("score_card_history" -> graft.scoring.Scoring.duckScoreHistorySql()),
      ("score_card_issues" -> graft.scoring.Scoring.duckScoreCardIssuesSql()),
      ("score_card_issues_dimensions" -> graft.scoring.Scoring.duckScoreCardIssuesDimensionsSql()),
      ("score_card_issues_impact" -> graft.scoring.Scoring.duckScoreCardIssuesImpactSql()),
      ("score_card_history_columns" -> graft.scoring.Scoring.duckScoreHistoryColumnsSql()),
      ("score_card_categories" -> graft.scoring.Scoring.duckScoreCardCategoriesSql()),
      ("query_test_prevalence" -> graft.scoring.Scoring.duckQueryPrevalenceSql()),
      ("doc_outliers" -> graft.pipeline.DocStats.duckOutliersSql()),
      ("readability" -> graft.pipeline.DocStats.duckReadabilitySql()),
      ("bpe_pairs" -> graft.pipeline.BpeMerges.duckSql()),
      ("embedding_outliers" -> graft.pipeline.Similarity.outliersSql("embeddings")(graft.oracle.DuckDialect)),
      ("decontaminate_semantic" -> graft.pipeline.Dedup.decontaminateSemanticSql("embeddings")(graft.oracle.DuckDialect)),
      ("decontaminate_semantic_stack" -> graft.pipeline.Dedup.decontaminateStackSql("embeddings")(graft.oracle.DuckDialect)),
      ("dedup_band_geometry" -> graft.pipeline.Dedup.bandGeometrySql("documents")(graft.oracle.DuckDialect)),
      ("graph_domain_rank" -> graft.pipeline.DomainRank.duckSql()),
      ("select_rank_budget" -> graft.pipeline.DomainRank.duckRankBudgetSql()),
      ("graph_harmonic" -> graft.pipeline.Harmonic.duckSql()),
      ("graph_cocitation" -> graft.pipeline.CoCitation.duckSql()),
      ("graph_communities" -> graft.pipeline.GraphCommunities.duckSql()),
      ("event_rate_anomaly" -> graft.streaming.EventAnalytics.duckRateAnomalySql()),
      ("event_props_stats" -> graft.streaming.EventAnalytics.duckPropsStatsSql()),
      ("lookup_rate_anomaly" -> graft.streaming.EventAnalytics.duckLookupRateAnomalySql()),
      ("skew_report" -> graft.core.SkewReport.duckSql()),
      ("pack_curriculum" -> graft.pipeline.Packer.duckCurriculumSql()),
      ("bpe_apply" -> graft.pipeline.BpeMerges.duckApplySql()),
      ("profile_correlations" -> graft.profiling.Correlations.duckSql()),
      ("dedup_survivor_audit" -> graft.pipeline.Dedup.survivorAuditSql("documents")(graft.oracle.DuckDialect)),
      ("knn_pq" -> graft.pipeline.Similarity.pqSql("embeddings", trained = true)(graft.oracle.DuckDialect)),
      ("dsir_scores" -> graft.pipeline.Selection.dsirDuckSql()),
      ("dsir_token_budget" -> graft.pipeline.Selection.budgetDuckSql()),
      ("media_phash_dedup" -> graft.pipeline.Multimodal.phashPairsDuckSql()),
      ("media_audio_dedup" -> graft.pipeline.Multimodal.audioPairsDuckSql()),
      ("media_video_framesample" -> graft.pipeline.Multimodal.videoFramesDuckSql()),
      ("media_video_dedup" -> graft.pipeline.Multimodal.videoPairsDuckSql()),
      ("media_container_meta" -> graft.pipeline.Multimodal.containerMetaDuckSql()),
      ("lm_perplexity" -> graft.pipeline.Perplexity.duckSql()),
      ("decontaminate_bloom" -> graft.pipeline.BloomDecontam.duckSql()),
      ("embedding_gram" -> graft.pipeline.EmbeddingAlgebra.gramDuckSql()),
      ("embedding_jl_projection" -> graft.pipeline.EmbeddingAlgebra.jlProjectionDuckSql()),
      ("sample_mixture" -> graft.pipeline.SourceMixture.sampleDuckSql()),
      ("embedding_standardized" -> graft.pipeline.EmbeddingAlgebra.standardizedDuckSql()),
      ("curation_ledger" -> graft.pipeline.Selection.ledgerDuckSql()),
      ("substring_duplication" -> graft.pipeline.Selection.substringDupDuckSql()),
      ("kmeans_refine" -> graft.pipeline.Similarity.kmeansRefineSql("embeddings")(graft.oracle.DuckDialect)),
      ("sample_cluster_balanced" -> graft.pipeline.Similarity.clusterSampleSql("embeddings")(graft.oracle.DuckDialect)),
      ("dedup_canonical" -> graft.pipeline.Dedup.canonicalSql("documents")(graft.oracle.DuckDialect)),
      ("tokenizer_fertility" -> graft.pipeline.TokenizerFertility.duckSql()),
      ("substring_rewrite" -> graft.pipeline.Selection.substringRewriteDuckSql()),
      ("corpus_doc_drift" -> graft.pipeline.DocDrift.duckSql()),
      ("profile_incremental" -> graft.pipeline.IncrementalProfile.duckSql()),
      ("knn_hard_negatives" ->
        graft.pipeline.Similarity.hardNegativesSql("embeddings")(graft.oracle.DuckDialect)),
      ("event_asof_order" ->
        graft.operators.AsofJoin.duckSql("events", "orders")),
      ("doc_signals" -> graft.pipeline.QualityGate.docSignalsDuckSql()),
      ("event_range_burst" -> graft.operators.RangeJoin.duckSql("events")),
      ("corpus_ngram_novelty" -> graft.pipeline.NgramNovelty.duckSql()),
      ("dedup_minhash_calibration" ->
        graft.pipeline.Dedup.minhashCalibrationSql("documents")(graft.oracle.DuckDialect)),
      ("split_leakage_free" -> graft.pipeline.Selection.splitSql("documents")(graft.oracle.DuckDialect)),
      ("quality_calibration" -> graft.pipeline.Selection.calibrationSql("documents")(graft.oracle.DuckDialect)),
      ("dedup_threshold_sweep" -> graft.pipeline.Dedup.thresholdSweepSql("documents")(graft.oracle.DuckDialect)),
      ("decontaminate_ngram" -> graft.pipeline.Selection.ngramDecontaminateDuckSql()),
      ("ann_occupancy" -> graft.pipeline.Similarity.occupancySql("embeddings")(graft.oracle.DuckDialect)),
      ("lookup_dedup_pairs" -> graft.pipeline.Dedup.pairLookupSql("documents")(graft.oracle.DuckDialect)),
      ("curation_funnel" -> graft.pipeline.Selection.funnelSql("documents")(graft.oracle.DuckDialect)),
      ("dedup_embedding_sweep" -> graft.pipeline.Dedup.embeddingSweepSql("embeddings")(graft.oracle.DuckDialect)),
      ("dedup_embedding_stack" -> graft.pipeline.Dedup.embeddingStackSql("embeddings")(graft.oracle.DuckDialect)),
      ("event_attribution" -> graft.streaming.EventAnalytics.duckAttributionSql()),
      ("url_normalize" -> graft.pipeline.UrlOps.duckNormalizeSql()),
      ("url_domain_cap" -> graft.pipeline.UrlOps.duckDomainCapSql()),
      ("event_zorder_pruned" -> graft.core.ZOrderLayout.duckSql()),
      ("corpus_grouping_sets" -> graft.pipeline.CorpusCube.duckSql()),
      ("sample_weighted_k" -> graft.pipeline.PrioritySample.duckWeightedSql()),
      ("sketch_distinct_union" -> graft.profiling.SketchStore.duckSql()),
      ("privacy_k_anonymity" -> graft.inference.KAnonymity.duckSql()),
      ("profile_benford" -> graft.profiling.Benford.duckSql()),
      ("event_attribution_multitouch" ->
        graft.streaming.EventAnalytics.duckMultiTouchSql()),
      ("fk_integrity" -> graft.inference.Referential.duckSql()),
      ("scd2_build" -> graft.pipeline.Scd2.duckSql()),
      ("drift_ks" -> graft.profiling.KsDrift.duckSql()),
      ("privacy_l_diversity" -> graft.inference.LDiversity.duckSql()),
      ("event_changepoint" -> graft.streaming.Changepoint.duckSql()),
      ("reconcile_tables" -> graft.pipeline.Reconcile.duckSql()),
      ("drift_psi" -> graft.profiling.PsiDrift.duckSql()),
      ("drift_chisq" -> graft.profiling.ChisqDrift.duckSql()),
      ("text_encoding_screen" -> graft.pipeline.EncodingScreen.duckSql()),
      ("entity_match" -> graft.pipeline.EntityMatch.duckSql()),
      ("retrieval_mmr" -> graft.pipeline.Retrieval.duckMmrSql()),
      ("bpe_train" -> graft.pipeline.BpeMerges.duckTrainSql()),
      ("event_interval_overlap" -> graft.operators.IntervalJoin.duckSql()),
      ("bpe_train_compression" ->
        graft.pipeline.BpeMerges.duckTrainCompressionSql()),
      ("dedup_simhash_sweep" ->
        graft.pipeline.Dedup.simhashSweepSql("documents")(graft.oracle.DuckDialect)),
      ("classifier_train" -> graft.pipeline.ClassifierTrain.duckTrainSql()),
      ("classifier_eval" -> graft.pipeline.ClassifierTrain.duckEvalSql())
      ).toMap
}
