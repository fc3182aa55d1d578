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
    # r6 new: Gopher rule bundle + CCNet per-lang perplexity terciles
    "gopher_quality_rules",
    "ccnet_ppl_buckets",
    # r6 new: bloom-prescreened decontamination — identical output,
    # train side probes a 16 KB codegen filter before any shuffle
    "corpus_contamination_bloom",
    # r6 new: seeded IVF-PQ — the full composition (cells, residuals,
    # codes, LUTs, ADC) hash-checked end-to-end in DuckDB
    "ann_ivf_pq_topk_seeded",
    # r6 new: end-to-end frozen curation pipeline (gate → span-clean →
    # exact-dedup → frozen-DSIR Gumbel-top-32), full-composition oracle
    "curation_pipeline_frozen_e2e",
    # r6 new: FROZEN-model quality scoring — literal pinned
    # coefficients over md5 token buckets, full oracle replay
    # (tokenize → bucket → dot → sigmoid); closes the r5 gap of a
    # classifier family with no oracle-checked variant
    "quality_classifier_frozen_scores",
    # r6 new: FROZEN-model DSIR scoring — 64-row literal ratio table,
    # oracle replays the scoring path; left-join unseen-bucket fix
    "dsir_score_frozen",
    # r6 new: image perceptual dHash near-dup over real decoded pixels
    # — 4×16-bit pigeonhole banding, closed-form oracle
    "image_dhash_near_dup",
    # r6 new: PQ production-path recall report (Lloyd-trained codebooks
    # + IVF-PQ vs exact L2 truth; rows-only, pinned in tests/test_pq.py)
    "ann_pq_recall_report",
    # r6 new: hybrid retrieval — BM25 top-50 + dense cosine top-50 fused
    # with reciprocal-rank fusion; full-composition oracle
    "hybrid_search_rrf",
    # r6 new: per-label mean pairwise cosine via the Gram identity —
    # O(n·d) where the naive form is O(n²) pairs; decimal-exact oracle
    "embedding_diversity_by_label",
    # r6 new: token-balanced shard manifest — two-level distributed
    # prefix sum, oracle replays the naive global window
    "shard_manifest",
    # r6 new: UniMax epoch-capped language mixing in closed window form
    "unimax_language_mix",
    # r6 new: RHO-style per-doc excess-loss top-k selection
    "rho_excess_loss_select",
    # r6 new curation layer (plans/curation_queries.py): temperature
    # sampling weights, soft-dedup token accounting, zero-shuffle char
    # entropy, n-gram novelty deciles, greedy k-center coreset
    "temperature_mix_weights",
    "soft_dedup_weights",
    "doc_char_entropy",
    "ngram_novelty_curriculum",
    "kcenter_coreset_select",
    # r6 new: quality-aware near-dup retention (argmax quality per
    # component instead of min id)
    "dedup_keep_best_quality",
    # r6 new: tokenizer-sizing nucleus vocab + near-dup provenance matrix
    "vocab_nucleus_coverage",
    "cross_source_dup_matrix",
    # r6 new: pre-shuffle key-skew diagnostic (Gini/HHI on the
    # distributed prefix-sum rank)
    "event_key_skew_profile",
    # r6 new: quality→holdout→pack→shard composition, one plan
    "packing_pipeline_e2e",
    # r6 new: the trainer-facing per-doc sampling-weight table
    # (soft-dedup × quality × source temperature)
    "doc_sampling_weights",
    # r6 new: Church–Gale burstiness collection statistic
    "term_burstiness",
    # r6 new: dedup tuning curve + packing utilization instruments
    "dedup_threshold_sensitivity",
    "packing_efficiency_report",
    # r6 new: greedy max-coverage (submodular selection baseline)
    "max_coverage_select",
    # r6 FIXED: was silently bound to the doremi function by a stacked
    # decorator in r5 (ADVICE r6 #1) — its r5 "green" row verified the
    # wrong query; must earn a real one
    "bpe_token_budget",
    # r6 FIXED: trainingSummary serialization crash after observed
    # writes (VERDICT r5 #1) — fit now write/load-strips the summary
    "quality_classifier_scores",
    # r6 REPLANNED: 25 exchanges → 6 (one gram frame, one per-source
    # aggregation, window normalizers) — output unchanged, re-earn
    "doremi_domain_weights",
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
    """Registry values in driver-facing order (see _compute_priority)."""
    order = _compute_priority(list(_REGISTRY))
    prioritized = [_REGISTRY[n] for n in order if n in _REGISTRY]
    rest = [q for q in _REGISTRY.values() if q.name not in set(order)]
    return prioritized + rest


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
