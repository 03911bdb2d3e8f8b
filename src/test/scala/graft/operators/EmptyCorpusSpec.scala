package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Empty-input robustness: a pipeline stage upstream may legitimately
  * emit zero rows (a filter that matched nothing, a day with no data) —
  * every operator must then return an empty (or summary) result, not
  * throw. Runs the batch operators with non-trivial empty-input paths
  * (iterative CC, per-user spines, sequence explodes, window ranks,
  * ratio divisions) over schema-identical empty copies of the tables.
  * Streaming and ML-training queries are excluded: file streams need a
  * data file and MLlib fit() on zero rows throws by contract.
  */
class EmptyCorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val emptyDir: String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_empty_corpus"
    val src = "/root/testdata/sf0.001"
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      // events.ts is normalized to epoch-nanos BIGINT by Tables.events
      // (whatever the file's physical encoding), so the empty copy
      // round-trips as the BIGINT the operators expect
      val df = if (t == "events") graft.Tables.events(spark, src)
               else graft.Tables(spark, src, t)
      df.limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private val queries = Seq(
    "q1_pricing_summary", "q_gap_fill", "q_doc_chunks", "q_dedup_clusters",
    "q_dedup_incremental", "q_dedup_minhash_lsh", "q_funnel_stages",
    "q_asof_nearest", "q_median_cont", "q_rate_window_sliding",
    "q_rank_family", "q_topk_users_per_type", "q_sessionize",
    "q_tfidf_top_terms", "q_knn_classify", "q_corpus_build",
    "q_value_histogram", "q_hll_sketch_merge", "q_welford_variance",
    "q_json_extract", "q_collect_types", "q_grouping_sets",
    "q_salted_join", "q_full_outer_join", "q_interval_join",
    "q_bloom_semi_join", "q_cms_heavy_hitters", "q_zorder_curve",
    "q_scd2_upsert", "q_key_skew", "q_compaction_plan",
    "q_embedding_quantize", "q_cdc_apply",
    // round 6: packing prefix sum, mix ratios, hash-rank sample,
    // containment pair join, MRL rank overlap, normalize projection,
    // capped simhash bands
    "q_sequence_pack", "q_corpus_mix", "q_reservoir_sample",
    "q_doc_containment", "q_mrl_recall", "q_text_normalize",
    "q_dedup_simhash64", "q_pagerank_dup", "q_weighted_sample",
    "q_source_boilerplate", "q_split_leakage_safe", "q_ann_ivf_recall",
    "q_vocab_coverage", "q_weighted_median",
    // round 8: adaptive-modulus embedding dedup + its incremental form
    "q_dedup_embedding", "q_dedup_embedding_incremental",
    // round 9: BPE-ish tokens, winnowing fingerprints, edit-distance
    // verify, LSH-bucketed ANN + its recall gate
    "q_text_tokens_bpe", "q_text_winnow_fingerprint",
    "q_dedup_edit_distance", "q_ann_lsh", "q_ann_lsh_recall",
    "q_dedup_embedding_clusters",
    // round 11: substring-window dup stats, per-source token quota,
    // minhash estimate audit, HLL intersection, market share
    "q_substring_dup", "q_domain_token_cap", "q_minhash_est_error",
    "q_hll_intersect", "q_market_share", "q_ngram_novelty",
    "q_ip_prefix_agg", "q_bucketed_join", "q_variant_extract",
    "q_hof_vector_math",
    // round 12: evolving-schema variant classification (the planted
    // malformed row keeps the output non-empty), parameterized rate
    // anomaly, integer-bit surprisal, cluster-size histogram
    "q_variant_shapes", "q_rate_anomaly", "q_text_surprisal",
    "q_dedup_cluster_sizes", "q_cohort_retention", "q_hierarchy_rollup",
    // round 12c: the mitigation/analytics additions — sweep-line phases,
    // histogram ranks, iterative peels, and the LPM join must all
    // degrade to empty output, never throw, on a zero-row corpus
    "q_cidr_block_match", "q_peak_concurrency", "q_daily_coverage",
    "q_rolling_distinct_users", "q_new_vs_returning", "q_activity_streaks",
    "q_lifecycle_segments", "q_item_cooccurrence", "q_kcore_copurchase",
    "q_basket_rules", "q_table_profile", "q_benford_audit",
    "q_spend_deciles", "q_revenue_concentration", "q_rfm_segments",
    "q_ewma_burst", "q_seasonal_anomaly", "q_port_scan",
    "q_fulfillment_sla", "q_bounce_rate", "q_time_to_convert",
    "q_bot_cadence", "q_ab_lift")

  queries.foreach { name =>
    test(s"$name completes on an empty corpus") {
      val n = graft.SparkEntry.queries(name)(spark, emptyDir).count()
      assert(n >= 0)
    }
  }
}
