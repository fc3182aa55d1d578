"""Named-query registry: the engine's public query surface.

Every operator from SURVEY.md §2 (and every north-star extension) registers
here as a (spark_fn, oracle_sql) pair. ``__spark_entry__.py`` re-exports
this for the correctness driver; tests iterate it for local oracle parity.

Contract (driver): each spark_fn takes (spark, sf_dir) and returns a
DataFrame whose column NAMES match the oracle SQL's output columns —
the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL twin for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # For oracle=None queries ONLY (engine-specific hash families, float
    # iteration): the machine-readable closure argument — either the name
    # of an oracle-checked registered TWIN query that replays the same
    # algorithm portably (e.g. minhash_dedup_pairs →
    # minhash_dedup_pairs_portable), or a "tests/<file>" path whose units
    # pin the operator to ground truth / error bounds. A unit test
    # (tests/test_registry_order.py) asserts every rows-only query
    # declares one and that it resolves.
    verified_by: str | None = None


_REGISTRY: dict[str, Query] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "weather_data_data_pipeline_spark.plans.reference_queries",
    "weather_data_data_pipeline_spark.plans.relational_queries",
    "weather_data_data_pipeline_spark.plans.tpch_remaining",
    "weather_data_data_pipeline_spark.plans.llm_queries",
    "weather_data_data_pipeline_spark.plans.corpus_queries",
    "weather_data_data_pipeline_spark.plans.maintenance_queries",
    "weather_data_data_pipeline_spark.plans.timeseries_queries",
    "weather_data_data_pipeline_spark.plans.weather_queries",
    "weather_data_data_pipeline_spark.plans.selection_queries",
    "weather_data_data_pipeline_spark.plans.curation_queries",
)

_loaded = False

# Driver-facing registration order. The correctness driver verifies a
# bounded prefix of the registry (~50 queries per round), so ordering is
# the verification schedule. Since round 4 (VERDICT r3 ask #3) the
# schedule is MECHANICAL, not hand-ordered:
#
#   _PRIORITY = _ROUND_HEAD                      (new/changed this round)
#             + never-green queries              (no ledger row)
#             + everything else, least-recently-verified first
#
# where "verified" comes from ``verification_ledger.json`` — a
# machine-derived map {query: last green driver round} regenerated from
# the repo-root CORRECTNESS_r*.json files by ``scripts/update_ledger.py``
# after each round. Ties within a round break alphabetically so the order
# is deterministic. Names the ledger and head both miss keep module
# registration order after the computed prefix (see ``_ordered``).

# Hand-maintained per round: queries that are NEW this round or whose
# PLAN/ORACLE changed this round and must (re-)earn a green row. Keep
# tests/test_registry_order.py's ROUND_HEAD copy in sync.
_ROUND_HEAD: tuple[str, ...] = (
    # r13 head stays SMALL so the LRU tail pulls the staleness cohort
    # (VERDICT r12 ask #1): all 9 oracle queries last green r8 (budget
    # expires this round) + 34 of the 44-query r9 cohort fit behind
    # this head in the ~50-slot window; the 8 r9 leftovers become the
    # oldest cohort for r14.
    #
    # r13 NEW oracle query (VERDICT r12 ask #7): ExactSubstr removal —
    # cut one copy of each maximal shared span (id_a keeps, id_b cut),
    # interval-merged per doc (functions/dedup.py:mem_span_removal)
    "exact_substring_removal",
    # r13 NEW: the applied rebuild form of the same policy (clean_text)
    "exact_substring_clean",
    # r13 NEW: PMI collocation mining (Church & Hanks 1990)
    "pmi_collocations",
    # §2 staleness pins (VERDICT r12 ask #1 / registry rule: SURVEY-§2
    # queries >3 rounds since last green must be pinned — both are
    # r9-stamped, and weekly_avg_value sorts LAST in the r9 cohort so
    # the LRU tail alone would miss it)
    "scalar_transforms",
    "weekly_avg_value",
    # plan-changed this round (ADVICE r12: canonical on-disk index
    # columns; winnow probe self-match filter) — must re-earn green
    "mem_index_probe",
    "winnowing_index_probe",
)


_LEDGER_CACHE: dict[str, int] | None = None


def _load_ledger() -> dict[str, int]:
    # the ledger only changes between rounds (scripts/update_ledger.py),
    # never within a process — cache it so queries()/query_names() in a
    # driver or bench loop don't re-read and re-parse the file per call
    global _LEDGER_CACHE
    if _LEDGER_CACHE is not None:
        return _LEDGER_CACHE
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent / "verification_ledger.json"
    try:
        _LEDGER_CACHE = {
            str(k): int(v) for k, v in json.loads(path.read_text()).items()
        }
    except (OSError, ValueError):
        _LEDGER_CACHE = {}
    return _LEDGER_CACHE


def _compute_priority(registered: list[str] | None = None) -> tuple[str, ...]:
    """Head + never-green + least-recently-verified-first.

    ``registered`` (module registration order) supplies names the ledger
    has never seen — they sort to the front (right after the head),
    because a query with no green driver row ever is the most urgent to
    verify. With ``registered=None`` only head + ledger names are ordered
    (enough for the common case where every registered query is one or
    the other).
    """
    ledger = _load_ledger()
    head = [n for n in _ROUND_HEAD]
    seen = set(head)
    never_green = [
        n for n in (registered or []) if n not in ledger and n not in seen
    ]
    seen.update(never_green)
    tail = sorted(
        (n for n in ledger if n not in seen),
        key=lambda n: (ledger[n], n),
    )
    return tuple(head + never_green + tail)


_PRIORITY: tuple[str, ...] = _compute_priority()


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    verified_by: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        for other in _REGISTRY.values():
            if other.fn is fn:
                # stacked @register decorators bind two names to ONE
                # function — the r5 bpe_token_budget/doremi mixup; each
                # registered name must map to a distinct callable
                raise ValueError(
                    f"query {name!r} would re-register the same function "
                    f"already bound to {other.name!r}"
                )
        _REGISTRY[name] = Query(
            name, fn, oracle, doc or (fn.__doc__ or ""), tags, verified_by
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True


def _ordered() -> list[Query]:
    """Registry values in driver-facing order (see _compute_priority),
    with every ORACLE-BEARING query ahead of every rows-only one.

    The driver's correctness gate verifies a bounded prefix (~50) of
    this order, and a rows-only query sampled there records
    ``err: no_oracle`` — which reads as "broken" in the gate file even
    though each rows-only query carries a ``verified_by`` closure (a
    registered oracle-checked portable twin, or an exact pinned unit
    suite). Demoting rows-only queries below the full oracle-bearing
    set (188 > the window) keeps the gate window 100% hash-checkable
    (VERDICT r8 ask #3) while the full surface stays registered and
    benchable."""
    order = _compute_priority(list(_REGISTRY))
    prioritized = [_REGISTRY[n] for n in order if n in _REGISTRY]
    rest = [q for q in _REGISTRY.values() if q.name not in set(order)]
    allq = prioritized + rest
    return [q for q in allq if q.oracle is not None] + [
        q for q in allq if q.oracle is None
    ]


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


def query_names() -> list[str]:
    _ensure_loaded()
    return [q.name for q in _ordered()]


def get_query(name: str) -> Query:
    _ensure_loaded()
    return _REGISTRY[name]
