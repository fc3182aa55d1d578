#!/usr/bin/env python
"""Driver-gate mirror: runs every queries() entry with a VANILLA
SparkSession (as the driver does) at sf0.01 and compares against
oracle_sql() via DuckDB — row count, column names, TYPES, and
order-insensitive values. Exit 1 on any mismatch.

Type faithfulness (VERDICT r3 ask #2): the round-3 `audio_dedup_fingerprint`
red row shipped because this mirror fetched oracle rows with `fetchall()`,
which flattens DuckDB HUGEINT (sum(BIGINT) widens) into Python int — erasing
exactly the distinction the driver's typed value-hash checks. The mirror now
fetches the oracle result as an Arrow table and

  1. compares a canonicalized Arrow schema against the Spark schema —
     decimal128(38,0) vs int64 is a MISMATCH, not a coercion (integer and
     float WIDTHS are collapsed, because both engines surface them to the
     driver as Python int/float and the driver's hash can't tell them
     apart; decimal vs integer it CAN tell apart);
  2. converts values via `to_pylist()`, which preserves `decimal.Decimal`,
     and norm() keeps Decimal distinct from int even though Python's
     `Decimal(5) == 5`.

Usage: python scripts/driver_mirror.py [sf_dir]
"""

from __future__ import annotations

import decimal
import math
import struct
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402
from weather_data_data_pipeline_spark.oracle_types import (  # noqa: E402
    type_mismatches,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def norm(v):
    if isinstance(v, decimal.Decimal):
        # distinct from int on purpose: the driver's typed hash diverges
        # on Decimal(123) vs 123 even though Python says they're equal
        return ("decimal", str(v))
    if isinstance(v, float):
        # BIT-strict (VERDICT r7 ask #2): the driver hashes exact values,
        # so the mirror must too — the old round(v, 9) passed any
        # sub-1e-9 double divergence, which is exactly the class that
        # flips a gate value-hash while every local check stays green.
        # struct.pack distinguishes -0.0 from 0.0 and every NaN payload;
        # collapse all NaNs to one token (engines surface one qNaN).
        if math.isnan(v):
            return "NaN"
        return ("f64", struct.pack("<d", v))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
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
    only = set(sys.argv[2:])  # optional query names to restrict the run
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 1
        qs = {n: f for n, f in qs.items() if n in only}
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
        otbl = con.execute(oracles[name]).arrow()
        o_cols = list(otbl.schema.names)
        if sorted(o_cols) != cols:
            failures.append((name, f"cols spark={cols} oracle={sorted(o_cols)}"))
            print(f"FAIL {name}: column mismatch")
            continue
        tmis = type_mismatches(df.schema, otbl.schema, cols)
        if tmis:
            failures.append((name, f"type mismatch: {tmis}"))
            print(f"FAIL {name}: type mismatch: {tmis}")
            continue
        o_rows = sorted(
            [tuple(norm(d[c]) for c in cols) for d in otbl.to_pylist()],
            key=_sort_key,
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
