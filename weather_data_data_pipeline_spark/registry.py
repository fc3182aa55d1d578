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
# Round 2: the 56 queries unverified in CORRECTNESS_r01.json lead, with
# the LLM-pipeline north-star operators (dedup/similarity/text/multimodal)
# packed inside the window. Names absent from this list (including any
# not-yet-registered name left here across refactors) keep their module
# registration order after the prioritized prefix.
_PRIORITY: tuple[str, ...] = (
    # reference weather pipeline e2e (SURVEY §2.8)
    "weather_weekly_avg_temp",
    "weather_avg_humidity_range",
    # timeseries / event-stream operators
    "asof_click_view",
    "range_join_incidents",
    "user_sessions",
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
    # maintenance / mutation operators
    "merge_upsert_orders",
    "scd2_user_values",
    "referential_integrity_checks",
    "window_function_suite",
    "table_diff_orders",
    # corpus search / quality
    "bm25_search_topk",
    "corpus_contamination",
    "pii_scrub_events",
    "doc_repetition_quality",
    "event_value_stats",
    "event_value_histogram",
    # LLM-pipeline north star: dedup / similarity / text / multimodal
    "ngram_jaccard_pairs",
    "minhash_dedup_pairs",
    "simhash_near_dup",
    "embedding_cosine_topk",
    "embedding_near_dup",
    "dedup_clusters",
    "dedup_kept_corpus",
    "doc_chunks",
    "multimodal_decode_stats",
    "multimodal_frame_counts",
    "multimodal_real_decode",
    "bloom_pruned_urgent_revenue",
    "dedup_incremental_batch",
    "training_mix_weighted_sample",
    "dedup_exact_normalized",
    "doc_paragraph_dedup",
    "source_quota_sample",
    "doc_quality_deciles",
    "tfidf_top_terms",
    "training_mix_sample_portable",
    "training_mix_sample",
    "lang_source_rollup",
    "language_id_pred",
    "doc_fingerprint",
    "doc_quality_filter",
    "term_cooccurrence_lift",
    "vocab_top_terms",
    "frequent_tokens_mg",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_kmeans_assign",
    "embedding_kmeans_clusters",
    "embedding_pca_project",
    # still-unverified overflow (positions 51+): next in line if the
    # driver's window is wider than 50
    "embedding_pca_variance",
    "training_mix_rates",
    "doc_pagerank",
    "sequence_packing",
    "span_dedup_profile",
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
