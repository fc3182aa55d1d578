#!/usr/bin/env python
"""Same-session interleaved Spark-vs-Spark A/B for PLAN-SHAPE changes.

The round-8/round-12 lesson (BASELINE.md) is that single-shot bench
numbers drift ±15-30% between sessions, so a shape change is accepted
only on a SAME-SESSION interleaved comparison: both variants run under
bench.py conditioning (warm table cache, stats-tuned AQE policy, noop
sink, transients released between runs), 3 warmups each, then N
alternating (A, B) timed reps, median per side.

Usage:
    python scripts/shape_ab.py <module:callable_a> <module:callable_b> \
        [--reps 7] [--label-a old] [--label-b new]

Each callable is (spark, sf_dir) -> DataFrame. Variants live in a
scratch module (e.g. scripts/r15_variants.py) so both shapes exist in
one interpreter; the registered query function itself is importable as
`weather_data_data_pipeline_spark.registry:<name>` via --query.

    python scripts/shape_ab.py --query dedup_clusters \
        scripts.r15_variants:dedup_clusters_new --reps 7
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
WARM_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
)


def _resolve(spec: str):
    mod, _, attr = spec.partition(":")
    return getattr(importlib.import_module(mod), attr)


def main() -> None:
    args = list(sys.argv[1:])
    reps = 7
    label_a, label_b = "A", "B"
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--query" in args:
        i = args.index("--query")
        qname = args[i + 1]
        del args[i : i + 2]
        fn_a = registry.get_query(qname).fn
        label_a = f"registered:{qname}"
    else:
        fn_a = _resolve(args.pop(0))
        label_a = getattr(fn_a, "__name__", label_a)
    fn_b = _resolve(args.pop(0))
    label_b = getattr(fn_b, "__name__", label_b)

    spark = get_spark(app_name="shape_ab")
    spark.sparkContext.setLogLevel("ERROR")
    warm_cache(spark, SF_DIR, WARM_TABLES)
    warm_cache(spark, SF_DIR, ("documents",), partitions=DOC_FANOUT)
    working_set = sum(
        os.path.getsize(os.path.join(SF_DIR, f"{t}.parquet"))
        for t in (*WARM_TABLES, "documents")
    )
    tune_for_working_set(spark, working_set)
    keep = {
        int(rid)
        for rid in spark.sparkContext._jsc.getPersistentRDDs().keySet()
    }

    def release() -> None:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet()):
            if int(rid) not in keep:
                jmap.get(rid).unpersist(False)
        spark.sparkContext._jvm.System.gc()

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release()
        return dt

    for fn in (fn_a, fn_b):
        for _ in range(3):
            run(fn)
    t_a, t_b = [], []
    for _ in range(reps):
        t_a.append(run(fn_a))
        t_b.append(run(fn_b))
    med_a = statistics.median(t_a)
    med_b = statistics.median(t_b)
    print(json.dumps({
        "a": label_a, "b": label_b,
        "a_median": round(med_a, 3), "b_median": round(med_b, 3),
        "b_over_a": round(med_b / med_a, 3) if med_a else None,
        "a_reps": [round(t, 3) for t in t_a],
        "b_reps": [round(t, 3) for t in t_b],
        "sf_dir": SF_DIR,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
