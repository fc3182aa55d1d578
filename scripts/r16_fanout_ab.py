#!/usr/bin/env python
"""Same-session interleaved A/B of the documents-cache fanout width.

DOC_FANOUT is a GLOBAL layout choice (the warmed documents cache), so
shape_ab.py's per-query variant harness cannot A/B it — this script
instead alternates the whole cache layout in blocks inside one session:
warm documents at width A, time the query set (3 warmups + K timed, min),
drop ONLY the documents cache, rewarm at width B, repeat, for
--blocks alternating rounds per side. Everything else matches bench.py
conditioning (warm dimension tables, stats-tuned AQE policy, noop sink,
transients released between runs).

Motivation (VERDICT r15 #4/#5): the md5×32 signature stage and the
gram-explode stages are map-side CPU on the documents scan; a fixed
8-partition cache caps them at 8 cores no matter the cluster width.

Usage: python scripts/r16_fanout_ab.py [--a 8] [--b 32] [--reps 3]
           [--blocks 2] [query ...]
"""

from __future__ import annotations

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
from weather_data_data_pipeline_spark.sources import tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
)

DEFAULT_QUERIES = (
    "minhash_dedup_pairs_portable",
    "minhash_dedup_pairs",
    "rho_excess_loss_select",
    "ngram_containment_pairs",
    "simhash_near_dup_portable",
    "dedup_clusters",
    "doc_bigram_kn_logppl",
    "span_dedup_profile",
    "exact_substring_self_removal",
    "tfidf_top_terms",
    # small doc rows: watch for task-overhead regressions
    "doc_fingerprint",
    "doc_sampling_weights",
    "length_debias_sample",
)


def main() -> None:
    args = list(sys.argv[1:])

    def _opt(name: str, default: int) -> int:
        if name in args:
            i = args.index(name)
            v = int(args[i + 1])
            del args[i : i + 2]
            return v
        return default

    width_a = _opt("--a", 8)
    width_b = _opt("--b", 32)
    reps = _opt("--reps", 3)
    blocks = _opt("--blocks", 2)
    names = args or list(DEFAULT_QUERIES)

    spark = get_spark(app_name="r16_fanout_ab")
    spark.sparkContext.setLogLevel("ERROR")
    tables.warm_cache(spark, SF_DIR, WARM_TABLES)
    working_set = sum(
        os.path.getsize(os.path.join(SF_DIR, f"{t}.parquet"))
        for t in (*WARM_TABLES, "documents")
    )
    tune_for_working_set(spark, working_set)

    def rewarm_documents(width: int) -> None:
        key = (SF_DIR, "documents")
        df = tables._CACHE.pop(key, None)
        if df is not None:
            df.unpersist(True)
        tables.warm_cache(spark, SF_DIR, ("documents",), partitions=width)

    def keep_ids() -> set[int]:
        return {
            int(rid)
            for rid in spark.sparkContext._jsc.getPersistentRDDs().keySet()
        }

    def release(keep: set[int]) -> None:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet()):
            if int(rid) not in keep:
                jmap.get(rid).unpersist(False)
        spark.sparkContext._jvm.System.gc()

    fns = {n: registry.get_query(n).fn for n in names}
    results: dict[str, dict[int, list[float]]] = {
        n: {width_a: [], width_b: []} for n in names
    }

    for block in range(blocks):
        for width in (width_a, width_b):
            rewarm_documents(width)
            keep = keep_ids()
            for n in names:
                fn = fns[n]
                for _ in range(3):  # warmup
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    release(keep)
                runs = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    fn(spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    runs.append(time.perf_counter() - t0)
                    release(keep)
                results[n][width].append(min(runs))
                print(
                    f"block {block} width {width} {n}: "
                    f"{min(runs):.3f}s",
                    file=sys.stderr,
                    flush=True,
                )

    out = {}
    for n in names:
        a = statistics.median(results[n][width_a])
        b = statistics.median(results[n][width_b])
        out[n] = {
            f"w{width_a}": round(a, 3),
            f"w{width_b}": round(b, 3),
            "speedup_b_over_a": round(a / b, 3) if b else None,
            "raw": {
                str(w): [round(x, 3) for x in results[n][w]]
                for w in (width_a, width_b)
            },
        }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
