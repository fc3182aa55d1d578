#!/usr/bin/env python
"""Plan-hash ledger: normalized physical-plan fingerprints per query.

Implements the plan-stable freshness amendment (VERDICT r13 ask #2): a
query whose physical plan is byte-identical (after normalizing the
session-dependent tokens below) since its last green driver stamp earns a
6-round verification budget instead of 5; plan-changed or new queries keep
the 5-round budget and must re-earn in the next gate window.

This script explains every ORACLE-BEARING registered query at sf0.01,
normalizes the formatted plan, and maintains
``scripts/plan_hashes.json``::

    {query: {"hash": sha256-hex, "since_round": R}}

where ``since_round`` is the round the CURRENT hash was first observed —
it only moves forward when the hash changes. A query is "plan-stable
since its stamp" iff ``since_round <= ledger_stamp``.

Normalization (what makes a fingerprint stable across sessions):
- expression IDs  ``#123`` / ``#123L``          → ``#x``
- plan ids        ``plan_id=42``                 → ``plan_id=x``
- filesystem paths ``file:/...`` and ``[...parquet...]`` location blobs
  (index-building queries write to per-run temp dirs) → ``<path>``
- byte/row statistics ``Statistics(...)``        → elided
Queries whose plan embeds genuinely run-varying content (random temp
table names inside SQL text, literal timestamps) will simply never look
stable — they conservatively keep the 5-round budget.

Known flap: ``embedding_drift_by_label`` hashes differently in ~1/3 of
full sweeps (its CBO join planning appears sensitive to whether the
cached embeddings table's async statistics have landed when its
predecessors finish; isolated re-runs are bit-stable). The degradation
is conservative — an occasional spurious "changed" only shortens that
one query's budget to 5 rounds.

Usage:
    python scripts/plan_hashes.py --round 14           # update the ledger
    python scripts/plan_hashes.py --round 14 --dry-run # report, no write
"""

from __future__ import annotations

import argparse
import hashlib
import json
import re
import sys

sys.path.insert(0, ".")

from weather_data_data_pipeline_spark import registry  # noqa: E402
from weather_data_data_pipeline_spark.session import get_spark  # noqa: E402

import os

HASH_FILE = os.path.join(os.path.dirname(__file__), "plan_hashes.json")
SF_DIR = "/root/testdata/sf0.01"

_NORM = (
    (re.compile(r"#\d+L?"), "#x"),
    (re.compile(r"plan_id=\d+"), "plan_id=x"),
    (re.compile(r"file:/[^\s,\]\)]+"), "<path>"),
    (re.compile(r"\[[^\[\]]*\.parquet[^\[\]]*\]"), "[<path>]"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(<elided>)"),
    (re.compile(r"Location: \S+ \[<path>?[^\]]*\]?"), "Location: <path>"),
)


def normalize(plan: str) -> str:
    for pat, rep in _NORM:
        plan = pat.sub(rep, plan)
    return plan


def formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def compute_hashes() -> dict[str, str]:
    """Fingerprint every oracle-bearing query under an ORDER-INVARIANT
    protocol: warm every table cache up front, then sweep in
    ALPHABETICAL order. A query's plan can depend on session state that
    earlier queries created (most visibly: a warm-key table caches on
    first touch, flipping later scans from parquet to
    InMemoryTableScan) — sweeping in registry order would make hashes
    depend on the per-round LRU rotation, producing spurious
    "plan changed" resets every time the ledger reshuffles. Alphabetical
    order + full pre-warm pins the predecessor state regardless of head
    or ledger churn."""
    from weather_data_data_pipeline_spark.sources.tables import warm_cache

    spark = get_spark(app_name="plan_hashes")
    spark.sparkContext.setLogLevel("ERROR")
    warm_cache(spark, SF_DIR)
    out: dict[str, str] = {}
    for name in sorted(registry.query_names()):
        q = registry.get_query(name)
        if q.oracle is None:
            continue  # rows-only queries are mirror-maintained (VERDICT r13)
        try:
            plan = formatted_plan(spark, q.fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            print(f"  ! {name}: explain failed: {e}", file=sys.stderr)
            continue
        out[name] = hashlib.sha256(
            normalize(plan).encode("utf-8")
        ).hexdigest()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    try:
        with open(HASH_FILE) as f:
            prev = json.load(f)
    except FileNotFoundError:
        prev = {}

    now = compute_hashes()
    merged: dict[str, dict] = {}
    changed, new, stable = [], [], []
    for name, h in sorted(now.items()):
        old = prev.get(name)
        if old is None:
            merged[name] = {"hash": h, "since_round": args.round}
            new.append(name)
        elif old["hash"] != h:
            merged[name] = {"hash": h, "since_round": args.round}
            changed.append(name)
        else:
            merged[name] = old
            stable.append(name)
    for name in sorted(set(prev) - set(now)):
        print(f"  dropped (no longer oracle-bearing): {name}")

    print(f"stable: {len(stable)}  changed: {len(changed)}  new: {len(new)}")
    for name in changed:
        print(f"  plan CHANGED: {name} (since_round -> {args.round})")
    if not args.dry_run:
        with open(HASH_FILE, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"wrote {HASH_FILE} ({len(merged)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
