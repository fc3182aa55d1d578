#!/usr/bin/env python
"""Driver-gate mirror: runs every queries() entry with a VANILLA
SparkSession (as the driver does) at sf0.01 and compares against
oracle_sql() via DuckDB — row count, column names, and order-insensitive
values. Exit 1 on any mismatch. Usage: python scripts/driver_mirror.py [sf_dir]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def _sort_key(row):
    # NULLs sort apart from every typed value (Python refuses None < float)
    return tuple((v is None, type(v).__name__, str(v)) for v in row)


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            cols = sorted(df.columns)
            s_rows = sorted(
                [tuple(norm(r[c]) for c in cols) for r in df.collect()],
                key=_sort_key,
            )
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(s_rows)} rows "
                  f"({time.perf_counter()-t0:.2f}s)")
            continue
        o = con.execute(oracles[name])
        o_cols = [d[0] for d in o.description]
        idx = [o_cols.index(c) for c in cols] if sorted(o_cols) == cols else None
        if idx is None:
            failures.append((name, f"cols spark={cols} oracle={sorted(o_cols)}"))
            print(f"FAIL {name}: column mismatch")
            continue
        o_rows = sorted(
            [tuple(norm(r[i]) for i in idx) for r in o.fetchall()], key=_sort_key
        )
        if len(s_rows) != len(o_rows):
            failures.append((name, f"rows spark={len(s_rows)} oracle={len(o_rows)}"))
            print(f"FAIL {name}: row count spark={len(s_rows)} oracle={len(o_rows)}")
            continue
        bad = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ]
        if bad:
            failures.append((name, f"{len(bad)} value mismatches, first: {bad[0]}"))
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}")
        else:
            print(f"ok   {name}: {len(s_rows)} rows hash-equal "
                  f"({time.perf_counter()-t0:.2f}s)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries ok; "
          f"{len(oracles)} oracle-checked")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
