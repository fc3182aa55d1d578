"""Registration-order contract for the correctness driver.

The driver verifies a bounded prefix (~50 queries) of ``queries()`` per
round; ``registry._PRIORITY`` is therefore the verification schedule.
These tests pin the invariants the schedule depends on.
"""

from weather_data_data_pipeline_spark import registry

# The judge's round-2/3 minimum set (VERDICT.md "Next round" #1) plus the
# north-star families: all must sit inside the driver's 50-query window.
MUST_BE_IN_WINDOW = {
    # round 3: the 15 never-driver-verified queries + the new rows
    "doc_fingerprint",
    "doc_quality_filter",
    "term_cooccurrence_lift",
    "vocab_top_terms",
    "embedding_kmeans_assign",
    "training_mix_rates",
    "sequence_packing",
    "span_dedup_profile",
    "ann_lsh_topk",
    "frequent_tokens_mg",
    "ann_ivf_topk",
    "embedding_kmeans_clusters",
    "embedding_pca_project",
    "embedding_pca_variance",
    "doc_pagerank",
    "minhash_dedup_pairs_portable",
    "jdbc_roundtrip",
    "semantic_dedup_keep",
    "corpus_drift_psi",
    "scd2_point_in_time_join",
    "data_expectations_report",
    "dataset_card_by_source",
    "doc_unigram_logppl",
    "contrastive_triplets",
    "training_pipeline_e2e",
    "events_locf_15min",
    "events_interp_15min",
    "weekly_cohort_retention",
    "conversion_funnel",
    "value_changepoint_cusum",
    "video_frame_dedup",
    "audio_dedup_fingerprint",
    "customer_rfm_segments",
    "simhash_near_dup_portable",
    "vocab_zipf_fit",
    "source_vocab_divergence",
    "part_basket_lift",
    "ann_ivf_topk_seeded",
    "embedding_health_report",
    # queries whose PLANS changed this round: re-earn the green row
    "minhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "embedding_near_dup",
    "doc_paragraph_dedup",
    "dedup_incremental_batch",
    "simhash_near_dup",
}
# Already-driver-verified queries (green rows in r1/r2) rotate through
# whatever window space remains after the never-verified + new + changed
# head — they are deliberately NOT in the must-be-inside set, because a
# round that adds many new queries pushes the rotation tail out and
# that is the correct trade (verify the unverified first).

WINDOW = 50


def test_priority_names_all_registered():
    names = set(registry.query_names())
    missing = [n for n in registry._PRIORITY if n not in names]
    assert not missing, f"_PRIORITY references unregistered queries: {missing}"


def test_priority_has_no_duplicates():
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))


def test_minimum_set_inside_driver_window():
    window = set(registry.query_names()[:WINDOW])
    missing = MUST_BE_IN_WINDOW - window
    assert not missing, f"outside the driver's first-{WINDOW} window: {missing}"


def test_ordering_preserves_full_surface():
    # Reordering must not drop or duplicate anything.
    names = registry.query_names()
    assert len(names) == len(set(names))
    assert set(names) == set(registry.queries())
    # every oracle key is a registered query
    assert set(registry.oracle_sql()) <= set(names)
