#!/usr/bin/env python
"""Benchmark harness: runs the headline queries (registry tag 'bench') at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with total and per-query wall seconds.

Each query executes via a noop sink (full plan execution, no driver
collect) — the number measures the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from weather_data_data_pipeline_spark import registry
from weather_data_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def run_query(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    bench_queries = {
        name: q.fn
        for name, q in (
            (n, registry.get_query(n)) for n in registry.query_names()
        )
        if "bench" in q.tags
    }
    timings: dict[str, float] = {}
    # Warm the JVM/parquet footer caches once with the cheapest query so the
    # first measured number isn't dominated by session warmup.
    warm = next(iter(bench_queries))
    run_query(spark, bench_queries[warm], SF_DIR)
    for name, fn in bench_queries.items():
        timings[name] = round(run_query(spark, fn, SF_DIR), 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
