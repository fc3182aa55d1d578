#!/usr/bin/env python
"""Bench-drift bisect (VERDICT r2 "What's wrong" #1): time the 24 queries
shared between BENCH_r01 and BENCH_r02 under the current session config,
optionally with specific confs removed, to attribute the +15% drift.

Usage:
    python scripts/bench_bisect.py                  # current config
    python scripts/bench_bisect.py --without spark.sql.python.filterPushdown.enabled

Methodology identical to bench.py (3 warmup + 3 timed runs, min,
transients released between runs, warm table cache, AQE policy from
working-set size) so numbers are comparable to the recorded rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from weather_data_data_pipeline_spark import registry  # noqa: E402
from weather_data_data_pipeline_spark.session import (  # noqa: E402
    get_spark,
    tune_for_working_set,
)
from weather_data_data_pipeline_spark.sources.tables import (  # noqa: E402
    DOC_FANOUT,
    warm_cache,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the 24 queries present in both BENCH_r01.json and BENCH_r02.json
SHARED = [
    "dedup_exact", "doc_chunks", "doc_repetition_quality", "doc_token_stats",
    "embedding_cosine_topk", "embedding_pca_project",
    "event_value_global_deciles", "event_value_robust_stats",
    "latest_event_per_user", "merge_upsert_orders", "minhash_dedup_pairs",
    "ngram_jaccard_pairs", "order_priority_count", "pii_scrub_events",
    "q17_small_quantity_revenue", "q1_pricing_summary",
    "q3_top_revenue_orders", "q5_nation_revenue", "range_join_incidents",
    "scd2_user_values", "sequence_packing", "training_mix_rates",
    "user_sessions", "window_function_suite",
]

WARM_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
)


def main() -> None:
    removed = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--without":
            removed.append(args.pop(0))
        else:
            raise SystemExit(f"unknown arg {a}")

    # The removed keys must be absent at session BUILD (static confs), so
    # filter them where get_spark applies its conf dict: wrap the builder's
    # config method for the duration of the one get_spark call.
    spark = None
    if removed:
        import pyspark.sql.session as pss

        orig_config = pss.SparkSession.Builder.config

        def filtering_config(self, key=None, value=None, conf=None, **kw):
            if key in removed:
                return self
            return orig_config(self, key=key, value=value, conf=conf, **kw)

        pss.SparkSession.Builder.config = filtering_config
        try:
            spark = get_spark(app_name="bench_bisect")
        finally:
            pss.SparkSession.Builder.config = orig_config
    else:
        spark = get_spark(app_name="bench_bisect")

    spark.sparkContext.setLogLevel("ERROR")
    for k in removed:
        try:
            got = spark.conf.get(k)
        except Exception:
            got = "<unset>"
        print(f"# {k} = {got}", file=sys.stderr)

    t0 = time.perf_counter()
    warm_cache(spark, SF_DIR, WARM_TABLES)
    warm_cache(spark, SF_DIR, ("documents",), partitions=DOC_FANOUT)
    warm_sec = round(time.perf_counter() - t0, 3)
    working_set = sum(
        os.path.getsize(os.path.join(SF_DIR, f"{t}.parquet"))
        for t in (*WARM_TABLES, "documents")
    )
    aqe_on = tune_for_working_set(spark, working_set)

    from bench import persistent_ids, release_transients, run_query

    keep = persistent_ids(spark)
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    timings: dict[str, float] = {}
    for name in SHARED:
        q = registry.get_query(name)
        wide = next((t for t in q.tags if t.startswith("shuffle")), None)
        if wide and not aqe_on:
            spark.conf.set("spark.sql.shuffle.partitions", wide[len("shuffle"):])
        try:
            for _ in range(3):
                run_query(spark, q.fn, SF_DIR)
                release_transients(spark, keep)
            runs = []
            for _ in range(3):
                runs.append(run_query(spark, q.fn, SF_DIR))
                release_transients(spark, keep)
        finally:
            if wide and not aqe_on:
                spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        timings[name] = round(min(runs), 3)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "bench_bisect_shared24_seconds",
        "value": total,
        "unit": "sec",
        "removed_confs": removed,
        "queries": timings,
        "warm_cache_sec": warm_sec,
        "aqe": aqe_on,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
