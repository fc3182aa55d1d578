#!/usr/bin/env python
"""AQE-on plan audit (VERDICT r6 #6): the bench runs with AQE disabled
below the working-set payoff threshold (session.tune_for_working_set),
but a 100 TB cluster runs AQE on — so the shapes we pin statically must
be re-checked under adaptive execution.

For every bench-tagged query this script captures

- the STATIC physical plan (adaptive off, compile only), and
- the FINAL adaptive plan (adaptive on, executed to a noop sink so
  AdaptiveSparkPlan reaches isFinalPlan=true),

counts the load-bearing node types in each (joins, WindowGroupLimit,
Exchange), and writes ``scripts/aqe_audit.json`` plus a console diff.
Flagged regressions — the directions that would hurt at scale:

- a statically-broadcast join degrading to SortMergeJoin/ShuffledHash
  under AQE (static BHJ count drops);
- WindowGroupLimit disappearing under AQE (the top-k pushdown the
  rank<=k queries rely on — memory-pinned as fragile in r3).

AQE IMPROVEMENTS (SMJ converted to broadcast at runtime, coalesced
shuffle reads) are recorded but not flagged. Intentional diffs belong
in INTENTIONAL below with the reason.

Run: python scripts/aqe_audit.py            (compare + write JSON)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, ".")

from weather_data_data_pipeline_spark import registry  # noqa: E402
from weather_data_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(__file__), "aqe_audit.json")

NODE_TYPES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "WindowGroupLimit",
    "Exchange",
)

# (query, kind) -> reason for an expected static-vs-AQE difference.
INTENTIONAL: dict[tuple[str, str], str] = {}


def node_counts(plan: str) -> dict[str, int]:
    return {t: len(re.findall(rf"\b{t}\b", plan)) for t in NODE_TYPES}


def final_adaptive_plan(spark, df) -> str:
    # execute so every AdaptiveSparkPlan reaches its final shape; the
    # SAME DataFrame then explains with isFinalPlan=true subtrees
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def static_plan(spark, df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    spark = get_spark(app_name="aqe_audit")
    spark.sparkContext.setLogLevel("ERROR")
    names = [
        n
        for n in registry.query_names()
        if {"bench", "tpch", "scale-pattern"}
        & set(registry.get_query(n).tags)
    ]
    report: dict[str, dict] = {}
    flags: list[str] = []
    notes: list[str] = []
    for name in names:
        fn = registry.get_query(name).fn
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        static = node_counts(static_plan(spark, fn(spark, SF_DIR)))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        adaptive = node_counts(final_adaptive_plan(spark, fn(spark, SF_DIR)))
        diff = {
            t: (static[t], adaptive[t])
            for t in NODE_TYPES
            if static[t] != adaptive[t]
        }
        report[name] = {
            "static": static,
            "aqe": adaptive,
            "diff": {t: list(v) for t, v in diff.items()},
        }
        # regressions: broadcast lost, or WindowGroupLimit lost
        if adaptive["BroadcastHashJoin"] < static["BroadcastHashJoin"]:
            key = (name, "broadcast_lost")
            if key not in INTENTIONAL:
                flags.append(
                    f"{name}: BroadcastHashJoin {static['BroadcastHashJoin']}"
                    f" → {adaptive['BroadcastHashJoin']} under AQE"
                )
        if adaptive["WindowGroupLimit"] < static["WindowGroupLimit"]:
            key = (name, "windowgrouplimit_lost")
            if key not in INTENTIONAL:
                flags.append(
                    f"{name}: WindowGroupLimit "
                    f"{static['WindowGroupLimit']} → "
                    f"{adaptive['WindowGroupLimit']} under AQE"
                )
        if diff:
            notes.append(f"{name}: {diff}")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    with open(OUT, "w") as f:
        json.dump(
            {"sf_dir": SF_DIR, "flags": flags, "queries": report},
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"aqe_audit.json written: {len(names)} queries, "
          f"{len(flags)} flags, {len(notes)} diffs")
    for w in flags:
        print(f"  ⚠ {w}")
    for n in notes:
        print(f"  i {n}")
    spark.stop()
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
