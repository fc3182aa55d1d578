#!/usr/bin/env python
"""DuckDB-side timing for the bench queries' oracle SQL — the operative
baseline per BASELINE.md ("within 2x of the DuckDB oracle's runtime on
identical data").

Runs every bench-tagged query that has an oracle twin against the same
parquet tables bench.py uses (default /root/testdata/sf0.1), one warmup
+ min of 3 timed runs (mirror of bench.py's methodology), and prints one
JSON line:

    {"metric": "oracle_total_wall_seconds", "value": N, "unit": "sec",
     "queries": {...}, "threads": T, "sf": ...}

Compare against bench.py's line to audit the 2x target per query. Note
DuckDB executes single-process over files on an NVMe-local path — the
honest single-node baseline; Spark carries JVM/driver overhead that
amortizes on a cluster.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_data_pipeline_spark import registry  # noqa: E402
from weather_data_data_pipeline_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    con = duckdb.connect()
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    con.execute(f"SET threads={threads}")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    oracles = registry.oracle_sql()
    bench = [
        n
        for n in registry.query_names()
        if "bench" in registry.get_query(n).tags and n in oracles
    ]
    timings: dict[str, float] = {}
    for name in bench:
        sql = oracles[name]
        con.execute(sql).fetchall()  # warmup (I/O cache, plan)
        best = min(
            _timed(con, sql) for _ in range(3)
        )
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "oracle_total_wall_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "threads": threads,
                "sf": _sf(SF_DIR),
            }
        )
    )


def _timed(con: duckdb.DuckDBPyConnection, sql: str) -> float:
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    return time.perf_counter() - t0


def _sf(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


if __name__ == "__main__":
    main()
