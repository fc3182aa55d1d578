"""Thin job-runner CLI — the engine's analog of the reference's script
entrypoints (SURVEY §2.7 keeps real orchestration out of scope).

    python -m weather_data_data_pipeline_spark list [--tag TAG]
    python -m weather_data_data_pipeline_spark run QUERY [--sf-dir DIR] [--show N]
    python -m weather_data_data_pipeline_spark explain QUERY [--sf-dir DIR]
    python -m weather_data_data_pipeline_spark full-load [--sf-dir DIR] [--dest DIR]

`run` executes one registered query and prints a sample; `explain` prints
the formatted physical plan (what the plan audit captures for the bench
set, available here for every query). `full-load` drives the reference's
EP1 pipeline end-to-end against canned payloads into a parquet
destination, twice — demonstrating the anti-join idempotency contract.
"""

from __future__ import annotations

import argparse
import sys

from weather_data_data_pipeline_spark import registry

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _spark(app: str):
    from weather_data_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=app)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_list(args: argparse.Namespace) -> int:
    for name in registry.query_names():
        q = registry.get_query(name)
        if args.tag and args.tag not in q.tags:
            continue
        gate = "oracle" if q.oracle else "rows-only"
        print(f"{name:40s} [{gate}] tags={','.join(q.tags)}")
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    q = registry.get_query(args.query)
    spark = _spark(f"run-{args.query}")
    df = q.fn(spark, args.sf_dir)
    n = df.count()
    df.show(args.show, truncate=False)
    print(f"{args.query}: {n} rows (showing up to {args.show})")
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    q = registry.get_query(args.query)
    spark = _spark(f"explain-{args.query}")
    q.fn(spark, args.sf_dir).explain("formatted")
    return 0


def cmd_full_load(args: argparse.Namespace) -> int:
    from weather_data_data_pipeline_spark.pipeline.weather import run_full_load
    from weather_data_data_pipeline_spark.plans.weather_queries import (
        _CITIES,
        _payload,
    )

    spark = _spark("weather-full-load")
    payloads = [_payload(*c) for c in _CITIES]

    def fact_rows() -> int:
        try:
            return spark.read.parquet(f"{args.dest}/weather_report_data").count()
        except Exception:
            return 0

    run_full_load(spark, payloads, args.dest, "2023-12-28", "2024-01-01")
    after_first = fact_rows()
    run_full_load(spark, payloads, args.dest, "2023-12-28", "2024-01-01")
    after_second = fact_rows()
    print(
        f"fact rows after first run: {after_first}; after rerun: {after_second} "
        f"({'idempotent' if after_first == after_second else 'NOT IDEMPOTENT'})"
    )
    return 0 if after_first == after_second else 1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="weather_data_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--tag", default=None)
    lp.set_defaults(fn=cmd_list)

    for name, fn in (("run", cmd_run), ("explain", cmd_explain)):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        if name == "run":
            sp.add_argument("--show", type=int, default=10)
        sp.set_defaults(fn=fn)

    fp = sub.add_parser("full-load", help="reference EP1 pipeline, run twice")
    fp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    fp.add_argument("--dest", required=True)
    fp.set_defaults(fn=cmd_full_load)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except KeyError as exc:
        print(f"unknown query {exc}; `list` shows all", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
