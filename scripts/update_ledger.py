#!/usr/bin/env python
"""Regenerate the verification ledger from the driver's CORRECTNESS files.

The correctness driver verifies only a bounded prefix (~50 queries) of
``registry.query_names()`` per round, so ordering IS the verification
schedule. This script makes that schedule mechanical (VERDICT r3 ask #3):
it scans every ``CORRECTNESS_r*.json`` at the repo root and writes
``weather_data_data_pipeline_spark/verification_ledger.json`` mapping each
query name to the most recent round in which it was GREEN:

- oracle-bearing queries: ``hash_match`` is true;
- rows-only queries: the driver ran it (``err == "no_oracle"``) and got a
  row count.

Queries that have never been green (or whose only rows failed) are absent
from the ledger and therefore sort to the FRONT of the computed
``registry._PRIORITY`` — immediately after the hand-maintained
``_ROUND_HEAD`` of queries that are new or plan-changed this round.

Run after each round's CORRECTNESS_rNN.json lands:

    python scripts/update_ledger.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LEDGER = REPO / "weather_data_data_pipeline_spark" / "verification_ledger.json"


def row_is_green(row: dict) -> bool:
    if row.get("hash_match") is True:
        return True
    # rows-only queries have no oracle: the driver records spark_rows and
    # err == "no_oracle"; that is the strongest check they can get.
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def build_ledger() -> dict[str, int]:
    ledger: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if row_is_green(row):
                ledger[name] = max(ledger.get(name, 0), rnd)
    return stamp_rows_only_from_closures(ledger)


def stamp_rows_only_from_closures(ledger: dict[str, int]) -> dict[str, int]:
    """Stamp rows-only queries from their verified_by closure (VERDICT
    r10 ask #6). Rows-only queries are demoted below the gate window
    since r9, so the driver never re-samples them and their raw ledger
    dates freeze at the round they were last sampled (r5 stamps were
    standing next to r10-fresh twins). Their ACTUAL verification is the
    closure, so the ledger should say so:

    - twin closure: the rows-only query inherits the twin's last green
      round (the twin replays the same algorithm under the oracle);
    - tests/ closure: inherits the latest gate round — the suite runs
      every round and tests/test_registry_order.py asserts the closure
      file still references the query, so its verification date IS the
      suite date.
    """
    sys.path.insert(0, str(REPO))
    from weather_data_data_pipeline_spark import registry

    latest = max(ledger.values(), default=0)
    for name in registry.query_names():
        q = registry.get_query(name)
        if q.oracle is not None or not q.verified_by:
            continue
        if q.verified_by.startswith("tests/"):
            stamp = latest
        else:
            stamp = ledger.get(q.verified_by, 0)
        ledger[name] = max(ledger.get(name, 0), stamp)
    return ledger


def main() -> int:
    ledger = build_ledger()
    LEDGER.write_text(
        json.dumps(dict(sorted(ledger.items())), indent=1) + "\n"
    )
    rounds: dict[int, int] = {}
    for rnd in ledger.values():
        rounds[rnd] = rounds.get(rnd, 0) + 1
    print(f"wrote {LEDGER} ({len(ledger)} green queries; by round: {rounds})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
