"""Named-query registry: the engine's public query surface.

Every operator from SURVEY.md §2 (and every north-star extension) registers
here as a (spark_fn, oracle_sql) pair. ``__spark_entry__.py`` re-exports
this for the correctness driver; tests iterate it for local oracle parity.

Contract (driver): each spark_fn takes (spark, sf_dir) and returns a
DataFrame whose column NAMES match the oracle SQL's output columns —
the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL twin for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "weather_data_data_pipeline_spark.plans.reference_queries",
    "weather_data_data_pipeline_spark.plans.relational_queries",
    "weather_data_data_pipeline_spark.plans.tpch_remaining",
    "weather_data_data_pipeline_spark.plans.llm_queries",
    "weather_data_data_pipeline_spark.plans.corpus_queries",
    "weather_data_data_pipeline_spark.plans.maintenance_queries",
    "weather_data_data_pipeline_spark.plans.timeseries_queries",
    "weather_data_data_pipeline_spark.plans.weather_queries",
)

_loaded = False

# Driver-facing registration order. The correctness driver verifies a
# bounded prefix of the registry (~50 queries per round), so ordering is
# the verification schedule: queries without a green CORRECTNESS row from
# a prior round list first, previously-verified ones rotate to the back.
# Round 3 (VERDICT r2 #1): the 15 queries that sat at positions 51+ both
# rounds lead — oracle-bearing first — followed by queries NEW this round
# and queries whose plans CHANGED this round (re-verification), then the
# previously-green rotation. Names absent from this list keep their
# module registration order after the prioritized prefix.
_PRIORITY: tuple[str, ...] = (
    # --- never driver-verified (r1+r2 window overflow), oracles first
    "doc_fingerprint",
    "doc_quality_filter",
    "term_cooccurrence_lift",
    "vocab_top_terms",
    "embedding_kmeans_assign",
    "training_mix_rates",
    "sequence_packing",
    "span_dedup_profile",
    "ann_lsh_topk",  # flipped rows-only → oracle this round (plane replay)
    # --- never driver-verified, rows-only
    "frequent_tokens_mg",
    "ann_ivf_topk",
    "embedding_kmeans_clusters",
    "embedding_pca_project",
    "embedding_pca_variance",
    "doc_pagerank",
    # --- new queries this round
    "minhash_dedup_pairs_portable",  # md5-portable MinHash, full oracle
    "jdbc_roundtrip",  # Derby append + idempotent re-append + read-back
    "semantic_dedup_keep",  # SemDeDup: cluster → within-cell cosine → CC
    "corpus_drift_psi",  # PSI distribution drift between time windows
    "scd2_point_in_time_join",  # PIT lookup via merge-scan as-of join
    "data_expectations_report",  # Deequ-style batch expectation suite
    "dataset_card_by_source",  # per-source release-card summary
    "doc_unigram_logppl",  # model-free perplexity-filter proxy
    "contrastive_triplets",  # anchor/positive/portable-negative mining
    "training_pipeline_e2e",  # whole curation pipeline, one plan, audit rows
    "events_locf_15min",  # gap-fill resampling (LOCF via merge-scan as-of)
    "events_interp_15min",  # linear interpolation between bracketing obs
    "weekly_cohort_retention",  # cohort triangle: first-week × offset
    "conversion_funnel",  # ordered view→click→purchase completion
    "value_changepoint_cusum",  # CUSUM level-shift detection
    "video_frame_dedup",  # real demux → frame hash → global dedup
    "audio_dedup_fingerprint",  # real WAV decode → window-sum fingerprint
    "customer_rfm_segments",  # RFM quartiles on the distributed ntile
    "simhash_near_dup_portable",  # md5 two-half 64-bit family, full oracle
    "vocab_zipf_fit",  # Zipf slope of the vocabulary (collection health)
    "source_vocab_divergence",  # per-source KL vs corpus unigram dist
    "part_basket_lift",  # market-basket co-purchase lift (top-k head)
    "ann_ivf_topk_seeded",  # IVF with seed centroids — full oracle
    "embedding_health_report",  # embedding-table pre-flight screening
    # --- plans changed this round: re-earn the green row
    "embedding_near_dup",  # chunked bucket verify
    "doc_paragraph_dedup",  # O(p) fallback branch for pathological docs
    "minhash_dedup_pairs",  # verification stage factored out
    "dedup_incremental_batch",
    "ngram_jaccard_pairs",
    "simhash_near_dup",
    # --- previously-green rotation. North-star families (dedup /
    # similarity / multimodal / reference-e2e) stay INSIDE the ~50-query
    # window every round (tests/test_registry_order.py pins this);
    # twice-verified relational/timeseries greens rotate to the back.
    "embedding_cosine_topk",
    "dedup_clusters",
    "dedup_kept_corpus",
    "doc_chunks",
    "multimodal_decode_stats",
    "multimodal_frame_counts",
    "multimodal_real_decode",
    "weather_weekly_avg_temp",
    "weather_avg_humidity_range",
    "bm25_search_topk",
    "pii_scrub_events",
    "user_sessions",
    "asof_click_view",
    "bloom_pruned_urgent_revenue",
    "training_mix_weighted_sample",
    "dedup_exact_normalized",
    "source_quota_sample",
    "doc_quality_deciles",
    "tfidf_top_terms",
    "training_mix_sample_portable",
    "training_mix_sample",
    "lang_source_rollup",
    "language_id_pred",
    "corpus_contamination",
    "doc_repetition_quality",
    "range_join_incidents",
    "daily_distinct_users_hll",
    "daily_distinct_users_exact",
    "events_15min_rollup",
    "latest_event_per_user",
    "rolling_hour_user_avg",
    "event_value_quantiles_exact",
    "event_value_quantiles",
    "event_value_robust_stats",
    "weekly_distinct_users_hll_merge",
    "user_event_counts_cms",
    "top_events_per_user_pruned",
    "merge_upsert_orders",
    "scd2_user_values",
    "referential_integrity_checks",
    "window_function_suite",
    "table_diff_orders",
    "event_value_stats",
    "event_value_histogram",
)


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True


def _ordered() -> list[Query]:
    """Registry values in driver-facing order: _PRIORITY prefix, then the rest."""
    prioritized = [_REGISTRY[n] for n in _PRIORITY if n in _REGISTRY]
    rest = [q for q in _REGISTRY.values() if q.name not in set(_PRIORITY)]
    return prioritized + rest


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


def query_names() -> list[str]:
    _ensure_loaded()
    return [q.name for q in _ordered()]


def get_query(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]
