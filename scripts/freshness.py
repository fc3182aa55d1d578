#!/usr/bin/env python
"""Freshness/deadline report under the plan-stable amendment (VERDICT
r13 ask #2): for every oracle-bearing query print its last green driver
stamp, its budget (6 rounds when scripts/plan_hashes.json attests the
physical plan unchanged since the stamp / r13 bootstrap, 5 otherwise),
and its deadline round; flag everything due at the next driver round
and verify it sits inside the ~50-query gate window. Rows-only queries
are mirror-maintained (no deadline, no window cost) and listed last.

Run while planning a round head:

    python scripts/freshness.py
"""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, ".")

from weather_data_data_pipeline_spark import registry  # noqa: E402

WINDOW = 50


def main() -> int:
    ledger = registry._load_ledger()
    latest = max(ledger.values(), default=0)
    next_round = latest + 1
    deadlines = registry.freshness_deadlines()
    names = registry.query_names()
    window = set(names[:WINDOW])

    due = sorted(
        (n for n, d in deadlines.items() if d <= next_round),
        key=lambda n: (deadlines[n], n),
    )
    print(f"ledger latest round: {latest}; next driver round: {next_round}")
    print(f"oracle-bearing: {len(deadlines)}; due at r{next_round}: {len(due)}")
    missing = [n for n in due if n not in window]
    for n in due:
        mark = "WINDOW" if n in window else "**OUTSIDE WINDOW**"
        print(
            f"  due  {n}: stamp r{ledger.get(n, 0)}, "
            f"budget {registry.freshness_budget(n)}, "
            f"deadline r{deadlines[n]} [{mark}]"
        )
    by_deadline = Counter(deadlines.values())
    print("deadline histogram:", dict(sorted(by_deadline.items())))
    budgets = Counter(
        registry.freshness_budget(n) for n in deadlines
    )
    print("budget mix (6 = plan-stable):", dict(sorted(budgets.items())))
    rows_only = [
        n for n in names if registry.get_query(n).oracle is None
    ]
    print(
        f"mirror-maintained rows-only (no deadline): {len(rows_only)}: "
        + ", ".join(rows_only)
    )
    if missing:
        print(f"ERROR: due queries outside the window: {missing}")
        return 1
    print("OK: every due query is inside the gate window")
    return 0


if __name__ == "__main__":
    sys.exit(main())
