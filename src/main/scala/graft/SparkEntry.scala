package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.streaming.EventStreams

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each key maps to. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the full reference dataflow
    * (parse → convert → country stats → world deviation → iso/geo joins →
    * EU propagation). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    SteamOps.steamPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference-derived (#1–12 + sink)
    "price_parse" -> (SteamOps.priceParse(_, _)),
    "currency_convert" -> (SteamOps.currencyConvert(_, _)),
    "country_avg" -> (SteamOps.countryAvg(_, _)),
    "world_avg_dev" -> (SteamOps.worldAvgDev(_, _)),
    "code_normalize" -> (SteamOps.codeNormalize(_, _)),
    "iso_join" -> (SteamOps.isoJoin(_, _)),
    "geo_enrich_join" -> (SteamOps.geoEnrichJoin(_, _)),
    "eu_propagate" -> (SteamOps.euPropagate(_, _)),
    "latest_partition" -> (SteamOps.latestPartition(_, _)),
    "json_extract" -> (SteamOps.jsonExtract(_, _)),
    "null_handling" -> (SteamOps.nullHandling(_, _)),
    "steam_pipeline" -> (SteamOps.steamPipeline(_, _)),
    "parquet_sink" -> (SteamOps.parquetSinkRoundtrip(_, _)),
    // analytics core (#13–23)
    "q1_agg" -> (CoreOps.q1Agg(_, _)),
    "q3_join_agg" -> (CoreOps.q3JoinAgg(_, _)),
    "q5_multijoin" -> (CoreOps.q5Multijoin(_, _)),
    "q17_small_qty" -> (CoreOps.q17SmallQty(_, _)),
    "window_rank" -> (CoreOps.windowRank(_, _)),
    "window_running" -> (CoreOps.windowRunning(_, _)),
    "topk" -> (CoreOps.topK(_, _)),
    "distinct_agg" -> (CoreOps.distinctAgg(_, _)),
    "approx_distinct" -> (CoreOps.approxDistinct(_, _)),
    "hll_distinct" -> ((s, d) => SketchOps.hllDistinct(s, d)),
    "quantile_sketch" -> (SketchOps.quantileSketch(_, _)),
    "quantiles" -> (CoreOps.quantiles(_, _)),
    "approx_quantiles" -> (CoreOps.approxQuantiles(_, _)),
    "corr_agg" -> (CoreOps.corrAgg(_, _)),
    "outliers" -> ((s, d) => CoreOps.outliers(s, d)),
    "histogram" -> ((s, d) => CoreOps.histogram(s, d)),
    "latest_by_key" -> (CoreOps.latestByKey(_, _)),
    "profile_table" -> (CoreOps.profileTable(_, _)),
    "incremental_stats" -> (CoreOps.incrementalStats(_, _)),
    "funnel_steps" -> (CoreOps.funnelSteps(_, _)),
    "semi_anti_join" -> (CoreOps.semiAntiJoin(_, _)),
    "skew_join_salted" -> (JoinOps.skewJoinSalted(_, _)),
    "bloom_prune_join" -> (JoinOps.bloomPruneJoin(_, _)),
    "set_ops" -> (CoreOps.setOps(_, _)),
    "rollup_agg" -> (CoreOps.rollupAgg(_, _)),
    "cube_agg" -> (CoreOps.cubeAgg(_, _)),
    "grouping_sets" -> (CoreOps.groupingSets(_, _)),
    "monthly_revenue" -> (CoreOps.monthlyRevenue(_, _)),
    "scd2_history" -> (CoreOps.scd2History(_, _)),
    "gap_fill" -> (CoreOps.gapFill(_, _)),
    "rolling_revenue" -> (CoreOps.rollingRevenue(_, _)),
    "mode_agg" -> (CoreOps.modeAgg(_, _)),
    "retention" -> (CoreOps.retention(_, _)),
    "cumulative_reach" -> (CoreOps.cumulativeReach(_, _)),
    "daily_active" -> (CoreOps.dailyActive(_, _)),
    "hourly_profile" -> (CoreOps.hourlyProfile(_, _)),
    "quantile_buckets" -> (CoreOps.quantileBuckets(_, _)),
    "event_path" -> (CoreOps.eventPath(_, _)),
    "pivot_events" -> (CoreOps.pivotEvents(_, _)),
    "unpivot_events" -> (CoreOps.unpivotEvents(_, _)),
    "window_time_range" -> (CoreOps.windowTimeRange(_, _)),
    "rolling_median" -> (CoreOps.rollingMedian(_, _)),
    "rolling_mad_outliers" -> ((s, d) => CoreOps.rollingMadOutliers(s, d)),
    "sessionize" -> (CoreOps.sessionize(_, _)),
    "sessionize_stats" -> (CoreOps.sessionizeStats(_, _)),
    "session_window_agg" -> (CoreOps.sessionWindowAgg(_, _)),
    "asof_join" -> (TemporalOps.asofClickPurchase(_, _)),
    "asof_join_native" -> (TemporalOps.asofClickPurchaseNative(_, _)),
    "range_join" -> (TemporalOps.rangeClickInPurchaseWindow(_, _)),
    "merge_intervals" -> (TemporalOps.mergeIntervals(_, _)),
    "asof_nearest" -> (TemporalOps.asofNearest(_, _)),
    "asof_nearest_native" -> (TemporalOps.asofClickPurchaseNearestNative(_, _)),
    "time_weighted_avg" -> (TemporalOps.timeWeightedAvg(_, _)),
    "event_transitions" -> (CoreOps.eventTransitions(_, _)),
    // ML feature generation / mining
    "lag_features" -> (FeatureOps.lagFeatures(_, _)),
    "rank_normalize" -> (FeatureOps.rankNormalize(_, _)),
    "string_sim_join" -> (FeatureOps.stringSimJoin(_, _)),
    "cooccurrence_pairs" -> (FeatureOps.cooccurrencePairs(_, _)),
    "attribution_last_touch" -> (FeatureOps.attributionLastTouch(_, _)),
    "char_diversity" -> (TextOps.charDiversity(_, _)),
    "trend_agg" -> (FeatureOps.trendAgg(_, _)),
    "spatial_join" -> (GeoOps.spatialJoin(_, _)),
    "ab_test" -> (FeatureOps.abTest(_, _)),
    "snapshot_diff" -> (QualityOps.snapshotDiff(_, _)),
    "key_skew_report" -> ((s, d) => QualityOps.keySkewReport(s, d)),
    "embedding_norm_stats" -> (SimilarityOps.embeddingNormStats(_, _)),
    // LLM-training-data (#24–35)
    "dedup_exact" -> (DedupOps.dedupExact(_, _)),
    "dedup_normalized" -> (DedupOps.dedupNormalized(_, _)),
    "gopher_gates" -> (TextOps.gopherGates(_, _)),
    "dedup_incremental" -> (DedupOps.dedupIncremental(_, _)),
    "dedup_minhash_incremental" -> ((s, d) => DedupOps.dedupMinhashIncremental(s, d)),
    "decontaminate_overlap" -> (CurationOps.decontaminateOverlap(_, _)),
    "contamination_report" -> (CurationOps.contaminationReport(_, _)),
    "text_familiarity" -> (TextOps.textFamiliarity(_, _)),
    "rare_token_stats" -> (TextOps.rareTokenStats(_, _)),
    "repeated_spans" -> (TextOps.repeatedSpans(_, _)),
    "span_scrub" -> (TextOps.spanScrub(_, _)),
    "graph_pagerank" -> (GraphOps.graphPagerank(_, _)),
    "token_histogram" -> (CurationOps.tokenHistogram(_, _)),
    "dedup_minhash_lsh" -> (DedupOps.dedupMinhashLsh(_, _)),
    "dedup_minhash_verified" -> ((s, d) => DedupOps.dedupMinhashVerified(s, d)),
    "dedup_clusters" -> (DedupOps.dedupClusters(_, _)),
    "dedup_survivors" -> (DedupOps.dedupSurvivors(_, _)),
    "dedup_report" -> (DedupOps.dedupReport(_, _)),
    "dedup_simhash" -> (DedupOps.dedupSimhash(_, _)),
    "dedup_containment" -> ((s, d) => DedupOps.dedupContainment(s, d)),
    "dedup_ngram_jaccard" -> (DedupOps.dedupNgramJaccard(_, _)),
    "dedup_embedding" -> (DedupOps.dedupEmbedding(_, _)),
    "dedup_embedding_lsh" -> ((s, d) => DedupOps.dedupEmbeddingLsh(s, d)),
    "ann_cosine_topk" -> (SimilarityOps.annCosineTopK(_, _)),
    "knn_classify" -> ((s, d) => SimilarityOps.knnClassify(s, d)),
    "hard_negatives" -> ((s, d) => SimilarityOps.hardNegatives(s, d)),
    "dq_checks" -> (QualityOps.dqChecks(_, _)),
    "ann_lsh" -> (SimilarityOps.annLsh(_, _)),
    "ann_ivf" -> ((s, d) => SimilarityOps.annIvf(s, d)),
    "text_langid" -> (TextOps.textLangid(_, _)),
    "text_quality" -> (TextOps.textQuality(_, _)),
    "text_tokens" -> (TextOps.textTokens(_, _)),
    "text_fingerprint" -> (TextOps.textFingerprint(_, _)),
    "text_pii_scrub" -> (TextOps.textPiiScrub(_, _)),
    "text_tfidf" -> ((s, d) => TextOps.textTfidf(s, d)),
    "heavy_hitters" -> ((s, d) => TextOps.heavyHitters(s, d)),
    "group_heavy_hitters" -> ((s, d) => TextOps.groupHeavyHitters(s, d)),
    "ngram_counts" -> ((s, d) => TextOps.ngramCounts(s, d)),
    "doc_chunk" -> (TextOps.docChunk(_, _)),
    "chunk_embed" -> (TextOps.chunkEmbed(_, _)),
    "chunk_neighbors" -> ((s, d) => TextOps.chunkNeighbors(s, d)),
    "text_winnow" -> (TextOps.textWinnow(_, _)),
    "repetition_stats" -> (TextOps.repetitionStats(_, _)),
    "bm25_topk" -> ((s, d) => RetrievalOps.bm25Topk(s, d)),
    "lexical_neighbors" -> ((s, d) => RetrievalOps.lexicalNeighbors(s, d)),
    "hybrid_retrieval" -> ((s, d) => RetrievalOps.hybridRetrieval(s, d)),
    "retrieval_index_probe" -> (RetrievalIndexOps.retrievalIndexProbe(_, _)),
    "retrieval_index_probe_admitted" -> (RetrievalIndexOps.retrievalIndexProbeAdmitted(_, _)),
    "source_mix" -> (CurationOps.sourceMix(_, _)),
    "mixture_sample" -> ((s, d) => CurationOps.mixtureSample(s, d)),
    "embedding_centroids" -> (SimilarityOps.embeddingCentroids(_, _)),
    "embedding_project" -> (SimilarityOps.embeddingProject(_, _)),
    "embedding_kmeans" -> (ClusterOps.embeddingKmeans(_, _)),
    "embedding_pq" -> (ClusterOps.embeddingPq(_, _)),
    "ann_pq" -> ((s, d) => ClusterOps.annPq(s, d)),
    "ann_ivf_pq" -> ((s, d) => ClusterOps.annIvfPq(s, d)),
    "ann_index_probe" -> (AnnIndexOps.annIndexProbe(_, _)),
    "ann_index_admit" -> (AnnIndexOps.annIndexAdmit(_, _)),
    "ann_index_stats" -> (AnnIndexOps.annIndexStats(_, _)),
    "ann_index_probe_admitted" -> (AnnIndexOps.annIndexProbeAdmitted(_, _)),
    "semantic_dedup" -> ((s, d) => ClusterOps.semanticDedup(s, d)),
    "semantic_dedup_incremental" -> ((s, d) => ClusterOps.semanticDedupIncremental(s, d)),
    "semantic_clusters" -> (DedupOps.semanticClusters(_, _)),
    "semantic_dedup_text" -> ((s, d) => ClusterOps.semanticDedupText(s, d)),
    "quality_model_score" -> (TextOps.qualityModelScore(_, _)),
    "curriculum_stages" -> (CurationOps.curriculumStages(_, _)),
    "doc_embed" -> (TextOps.docEmbed(_, _)),
    "doc_neighbors" -> ((s, d) => TextOps.docNeighbors(s, d)),
    "pack_sequences" -> (CurationOps.packSequences(_, _)),
    "pack_sequences_bpe" -> (CurationOps.packSequencesBpe(_, _)),
    "bpe_fertility" -> (TokenizerOps.bpeFertility(_, _)),
    "decontaminate" -> (CurationOps.decontaminate(_, _)),
    "dataset_split" -> ((s, d) => CurationOps.datasetSplit(s, d)),
    "mm_metadata" -> (MultimodalOps.mmMetadata(_, _)),
    "mm_features" -> (MultimodalOps.mmFeatures(_, _)),
    "mm_frames" -> (MultimodalOps.mmFrameSample(_, _)),
    "corpus_filter" -> ((s, d) => CurationOps.corpusFilter(s, d)),
    "curation_report" -> (CurationOps.curationReport(_, _)),
    "mix_drift" -> (CurationOps.mixDrift(_, _)),
    "target_affinity" -> (CurationOps.targetAffinity(_, _)),
    "stratified_sample" -> ((s, d) => CurationOps.stratifiedSample(s, d)),
    // layout (write-path; rows-only — emits the landed pruning geometry)
    "zorder_layout" -> ((s, d) => LayoutOps.zorderLayout(s, d)),
    // trained BPE tokenizer (rows-only — iterative argmax training loop)
    "bpe_merges" -> (TokenizerOps.bpeMerges(_, _)),
    "bpe_tokens" -> (TokenizerOps.bpeTokens(_, _)),
    // choropleth render frame (rows-only — geometry from the in-code
    // boundary dim, the naturalearth analog)
    "world_map_features" -> (Jobs.worldMapFeatures(_, _)),
    // streaming (#36, batch twin — streaming path in EventStreams + spec)
    "stream_window_agg" -> (EventStreams.streamWindowAggBatch(_, _)))

  /** DuckDB-runnable ANSI SQL twin for every oracle-checkable query.
    * Rows-only ops (not ANSI-expressible: seeded LSH, wrap-around hashes,
    * binary decode, sinks, approx sketches) are intentionally absent —
    * each one's contract is recorded in [[rowsOnly]]. */
  def oracleSql: Map[String, String] = OracleSql.all

  /** Machine-readable contract for every `queries` key that has NO
    * [[oracleSql]] twin: why an ANSI oracle is impossible, and which
    * ScalaTest verifies the key's semantics (not just its shape).
    * [[Verify]] dumps this as `rows_only.json` next to `oracle_sql.json`,
    * so a `no_oracle` row in the driver's correctness report reads as
    * "by design, spec-verified" rather than untested. A PlanQualitySpec
    * meta-check enforces queries.keySet == oracleSql.keySet ∪ this. */
  def rowsOnly: Map[String, (String, String)] = Map(
    "parquet_sink" -> ("write path: the deliverable is a landed snappy parquet drop, not a SQL-expressible result",
      "SteamOpsSpec: 'parquet sink: snappy + date-stamped path roundtrip'"),
    "approx_distinct" -> ("HLL++ sketch estimate; DuckDB's approx_count_distinct runs a different sketch, so values legitimately differ",
      "CoreOpsSpec: 'approx_distinct tracks exact distinct within HLL tolerance'"),
    "approx_quantiles" -> ("Greenwald–Khanna sketch quantiles; DuckDB's approximate quantile algorithm differs",
      "CoreOpsSpec: 'approx_quantiles stay within GK error bounds of the exact percentiles'"),
    "hll_distinct" -> ("Spark HLL sketch binaries (hll_sketch_agg/hll_union_agg) have no DuckDB twin",
      "SketchSpec: 'hll_distinct: merging daily partials loses nothing vs the direct sketch'"),
    "quantile_sketch" -> ("DDSketch bucket estimates are sketch-specific (no DuckDB twin); the α-error and merge contracts are the spec",
      "SketchSpec: 'quantile_sketch: merged == direct, every estimate within α of the exact percentile'"),
    "world_map_features" -> ("boundary geometry comes from the in-code WorldBoundaries dim (the naturalearth analog) — no DuckDB twin table to query",
      "WorldBoundariesSpec (ring/area/bbox/alias invariants) + JobsSpec: 'geojson export: ...' known-shape asserts"),
    "zorder_layout" -> ("write-path layout job: the result is landed file pruning geometry, not a SQL-expressible query",
      "LayoutSpec: 'z-ordered files bound BOTH dimensions; sorted layout only one'"))
}
