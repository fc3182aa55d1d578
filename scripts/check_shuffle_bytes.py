#!/usr/bin/env python
"""Shuffle-VOLUME regression gate: compare a bench run's measured
per-query shuffle-write bytes (bench.py's ``shuffle_bytes`` field)
against the recorded baseline.

The plan audit (scripts/explain_audit.py) catches structural
regressions — a query growing Exchanges. This catches VOLUME
regressions the plan shape cannot see: a filter no longer pushed below
a shuffle, a truncation (WindowGroupLimit, map-side combine) silently
disabled, a broadcast flipping to shuffle — all show up as the same
Exchange count but more bytes on the wire.

Usage:
    python scripts/check_shuffle_bytes.py BENCH.json            # gate
    python scripts/check_shuffle_bytes.py BENCH.json --update   # accept

Bytes are deterministic per (plan, SF) modulo compression jitter; the
gate flags growth beyond 1.30x + 1 MB slack. New queries are reported
as info and enter the baseline only under --update.
"""

from __future__ import annotations

import json
import os
import sys

BASELINE = os.path.join(os.path.dirname(__file__), "shuffle_bytes_baseline.json")
GROWTH = 1.30
SLACK = 1 << 20  # compression/AQE jitter floor


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--update"]
    update = "--update" in sys.argv
    if not args:
        print("usage: check_shuffle_bytes.py BENCH.json [--update]")
        return 2
    bench = json.load(open(args[0]))
    now: dict[str, int] = bench.get("shuffle_bytes") or {}
    if not now:
        print("no shuffle_bytes field in bench output")
        return 2
    try:
        base = json.load(open(BASELINE))
    except FileNotFoundError:
        base, update = {}, True
    failures, infos = [], []
    for name, b in sorted(now.items()):
        prev = base.get(name)
        if prev is None:
            if not update:  # being accepted right now — not news
                infos.append(f"{name}: new query, no shuffle-bytes baseline")
        elif b > prev * GROWTH + SLACK:
            failures.append(
                f"{name}: shuffle bytes regressed {prev:,} → {b:,} "
                f"({b / max(prev, 1):.2f}x; gate {GROWTH}x + 1MB)"
            )
    for stale in sorted(set(base) - set(now)):
        infos.append(f"{stale}: in baseline but not in this bench run")
    if update:
        with open(BASELINE, "w") as f:
            json.dump(now, f, indent=1, sort_keys=True)
        print(f"baseline updated: {len(now)} queries")
    for i in infos:
        print(f"  i {i}")
    for w in failures:
        print(f"  ⚠ {w}")
    print(f"{len(now)} queries checked, {len(failures)} volume regressions")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
