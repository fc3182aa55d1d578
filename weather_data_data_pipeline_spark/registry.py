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
    # r14 head (44): the 5 rows whose 5-round budget expires THIS round
    # (VERDICT r13 ask #1 — the r9-stamped leftovers of the r13 sweep),
    # the 6 queries the ADVICE r13 #1 NULL-text guard re-planned, the 3
    # NEW queries (CCNet pair, VERDICT r13 ask #6; contamination
    # prescreen replan, ask #3), and the two NULL-audit waves (17
    # document-side + 13 embeddings-side; every plan/oracle/UDF-changed
    # set identified mechanically by scripts/plan_hashes.py analyzed-
    # plan diffs against the r13 tree). Behind these 44, the LRU tail
    # pulls ~6 of the r10 cohort; the leftovers are plan-stable and
    # carry the 6-round budget (VERDICT r13 ask #2 amendment) to r16.
    #
    # §2 staleness pins, due r14 (r9-stamped, reference-tagged — the
    # automatic pin test in tests/test_registry_order.py now enforces
    # this class, VERDICT r13 ask #4)
    "weather_weekly_avg_temp",
    "weather_avg_humidity_range",
    # due r14: r9-stamped oracle rows
    "train_holdout_split",
    "truncation_loss_sweep",
    "vocab_growth_curve",
    # plan-changed r14 (ADVICE r13 #1: _len NULL guard in _span_toks +
    # kept_tokens NULL guard in _rebuild_clean) — must re-earn green
    "exact_substring_removal",
    "exact_substring_clean",
    "span_dedup_removal",
    "span_dedup_clean_corpus",
    "decontamination_clean_corpus",
    "curation_pipeline_frozen_e2e",
    # r14 NEW: CCNet-style line-level cross-corpus dedup (stats +
    # applied clean), VERDICT r13 ask #6
    "ccnet_line_dedup",
    "ccnet_line_clean",
    # r14 NEW: the contamination-family batch replan (VERDICT r13 ask
    # #3 — exact broadcast prescreen; the Bloom twin is serving-tagged)
    "corpus_contamination_prescreen",
    # r14 NULL-audit wave (scripts/null_audit.py — ADVICE r13 #1
    # generalized): plan-changed by the mean_token_length NULL-on-empty
    # and doc_repetition_quality guards (hash diff), oracle-changed
    # (string_split('','') quirk), or Pandas-UDF-body-changed (batch
    # poisoning / NULL degrade) — all must re-earn green
    "dedup_keep_best_quality",
    "doc_quality_by_lang",
    "doc_quality_deciles",
    "doc_quality_filter",
    "doc_repetition_quality",
    "doc_sampling_weights",
    "doc_token_stats",
    "length_quality_curve",
    "multimodal_decode_stats",
    "packing_pipeline_e2e",
    "quality_proxy_agreement",
    "quality_rule_ablation",
    "sampling_ess_by_source",
    "url_domain_dedup_report",
    "doc_char_entropy",
    "doc_fingerprint",
    "multimodal_frame_counts",
    # r14 embeddings NULL-audit wave (second sweep — NULL/zero-norm
    # vectors): plan-changed by the drop_invalid_vectors entry guards /
    # NULL-safe cosine (mechanical analyzed-plan hash diff vs the r13
    # tree), oracle-changed (PQ encode NULL filter; decontamination
    # report exclusion), or kernel-body-changed (SemDeDup cell masks)
    "ann_ivf_topk_seeded",
    "ann_lsh_topk",
    "ann_pq_topk_seeded",
    "ann_pq_recall_seeded",
    "contrastive_triplets",
    "embedding_ann_recall_report",
    "embedding_cosine_topk",
    "embedding_near_dup",
    "hybrid_rerank_topk",
    "hybrid_search_rrf",
    "semantic_decontamination",
    "semantic_dedup_keep",
    "semantic_dedup_keep_capped",
)


# --- plan-stable freshness amendment (VERDICT r13 ask #2, granted) ----
#
# Every oracle-bearing query must re-earn a green driver-gate stamp
# within its freshness budget. The budget is 5 rounds; a query whose
# ANALYZED LOGICAL PLAN is provably unchanged since its last green
# stamp earns 6 (the authored query cannot have changed if the
# analyzed plan is byte-identical, and the full-surface two-scale
# mirror re-verifies values every round anyway; physical regressions
# are separately gated by explain_audit Exchange counts + the
# shuffle-byte gate). Plan stability comes from
# scripts/plan_hashes.json — normalized analyzed-plan fingerprints
# maintained by scripts/plan_hashes.py, whose ``since_round`` only
# moves forward when a hash changes.
#
# Bootstrap: the baseline hashes were computed AGAINST THE ACTUAL
# r13-close tree (git worktree of commit 3d15971, same protocol), so
# ``since_round = 13`` is a true attestation — a query stamped r10
# with an unchanged-since-r13 hash counts as plan-stable (its r13
# form ran green in the r13 two-scale mirror; the per-round shuffle
# gate covered r10→r13). Rows-only queries are
# MIRROR-MAINTAINED: they can never enter the oracle gate, their
# verified_by closures re-run every round, so they carry no deadline
# and cost no window slot.
FRESHNESS_BUDGET = 5
FRESHNESS_BUDGET_STABLE = 6
PLAN_HASH_BOOTSTRAP_ROUND = 13

_PLAN_HASH_CACHE: dict[str, dict] | None = None


def _load_plan_hashes() -> dict[str, dict]:
    global _PLAN_HASH_CACHE
    if _PLAN_HASH_CACHE is not None:
        return _PLAN_HASH_CACHE
    import json
    from pathlib import Path

    path = (
        Path(__file__).resolve().parent.parent
        / "scripts"
        / "plan_hashes.json"
    )
    try:
        _PLAN_HASH_CACHE = json.loads(path.read_text())
    except (OSError, ValueError):
        _PLAN_HASH_CACHE = {}
    return _PLAN_HASH_CACHE


def freshness_budget(name: str) -> int | None:
    """Rounds this query's current green stamp stays fresh — 6 when the
    plan hash is unchanged since the stamp (or since the r13 bootstrap),
    5 otherwise; None for rows-only queries (mirror-maintained, no
    deadline)."""
    _ensure_loaded()
    if _REGISTRY[name].oracle is None:
        return None
    stamp = _load_ledger().get(name)
    meta = _load_plan_hashes().get(name)
    if stamp is not None and meta is not None and meta["since_round"] <= max(
        stamp, PLAN_HASH_BOOTSTRAP_ROUND
    ):
        return FRESHNESS_BUDGET_STABLE
    return FRESHNESS_BUDGET


def freshness_deadlines() -> dict[str, int]:
    """{oracle-bearing query: round by which it must re-earn a green
    driver stamp}. Never-green queries get deadline 0 (verify ASAP)."""
    _ensure_loaded()
    ledger = _load_ledger()
    out: dict[str, int] = {}
    for q in _REGISTRY.values():
        if q.oracle is None:
            continue
        stamp = ledger.get(q.name)
        out[q.name] = (
            0 if stamp is None else stamp + freshness_budget(q.name)
        )
    return out


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
