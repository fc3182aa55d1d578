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
