#!/usr/bin/env python
"""Same-session interleaved Spark-vs-DuckDB A/B for named bench queries.

The accepted evidence standard for weak-list dispositions (BASELINE.md
round-8 lesson, VERDICT r10 ask #4): single-shot driver-bench ratios
drift ±15-30% between sessions, so a query is judged only on
SAME-SESSION interleaved medians — warmups on both sides, then N
alternating (Spark, DuckDB) timed reps, median per side. Alternation
cancels slow environment drift (GC pressure, page cache, thermal)
because both sides sample the same timeline.

Usage:
    python scripts/interleave_ab.py q1 [q2 ...] [--reps 5]

Methodology per query: bench.py conditions on the Spark side (warm
table cache, stats-tuned AQE policy, noop sink, transients released
between runs, 3 warmup runs) and bench_oracle.py conditions on the
DuckDB side (same parquet views, SPARK_GRAFT_CPUS threads, 1 warmup),
then `--reps` alternating timed pairs. Prints one JSON line per query
plus a summary line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_data_pipeline_spark import registry  # noqa: E402
from weather_data_data_pipeline_spark.session import (  # noqa: E402
    get_spark,
    tune_for_working_set,
)
from weather_data_data_pipeline_spark.sources.tables import (  # noqa: E402
    DOC_FANOUT,
    TABLES,
    warm_cache,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 5
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    names = args
    if not names:
        print("usage: interleave_ab.py <query> [<query>...] [--reps N]")
        sys.exit(2)

    spark = get_spark(app_name="interleave_ab")
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

    con = duckdb.connect()
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    con.execute(f"SET threads={threads}")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )

    def run_spark(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def run_duck(sql: str) -> float:
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        return time.perf_counter() - t0

    def release() -> None:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet()):
            if int(rid) not in keep:
                jmap.get(rid).unpersist(False)
        spark.sparkContext._jvm.System.gc()

    summary = {}
    for name in names:
        q = registry.get_query(name)
        if q.oracle is None:
            # rows-only query: no DuckDB side to alternate with, but a
            # same-session REPEATED-median wall still settles whether a
            # single-shot driver-bench number was drift (VERDICT r12
            # ask #5: quality_classifier_scores has no oracle pairing —
            # MLlib L-BFGS training is not SQL-expressible).
            for _ in range(3):
                run_spark(q.fn)
                release()
            s_times = []
            for _ in range(reps):
                s_times.append(run_spark(q.fn))
                release()
            s_med = round(statistics.median(s_times), 3)
            summary[name] = {
                "spark_median": s_med,
                "duckdb_median": None,
                "ratio": None,
                "spark_reps": [round(t, 3) for t in s_times],
                "note": "rows-only: spark-only repeated median",
            }
            print(json.dumps({"query": name, **summary[name]}))
            continue
        for _ in range(3):  # Spark warmup (C2/codegen)
            run_spark(q.fn)
            release()
        run_duck(q.oracle)  # DuckDB warmup (catalog + page cache)
        s_times, d_times = [], []
        for _ in range(reps):
            s_times.append(run_spark(q.fn))
            release()
            d_times.append(run_duck(q.oracle))
        s_med = round(statistics.median(s_times), 3)
        d_med = round(statistics.median(d_times), 3)
        summary[name] = {
            "spark_median": s_med,
            "duckdb_median": d_med,
            "ratio": round(s_med / d_med, 2) if d_med > 0 else None,
            "spark_reps": [round(t, 3) for t in s_times],
            "duckdb_reps": [round(t, 3) for t in d_times],
        }
        print(json.dumps({"query": name, **summary[name]}))
    print(
        json.dumps(
            {
                "metric": "interleaved_ab",
                "sf_dir": SF_DIR,
                "reps": reps,
                "queries": summary,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
