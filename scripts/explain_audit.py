#!/usr/bin/env python
"""Plan audit: dump the formatted physical plan of every bench-tagged
query to PLANS.md and flag plan smells (missing pushdown, unexpected
nested-loop joins, Python row-at-a-time evaluation, and SHUFFLE-COUNT
REGRESSIONS — any query whose plan gains Exchanges vs the recorded
baseline in scripts/plan_shuffles.json).

Run after changing any query:   python scripts/explain_audit.py
Accept intended shuffle changes: python scripts/explain_audit.py --update
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

SHUFFLE_BASELINE = os.path.join(os.path.dirname(__file__), "plan_shuffles.json")

from weather_data_data_pipeline_spark import registry  # noqa: E402
from weather_data_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
SMELLS = (
    ("BroadcastNestedLoopJoin", "nested-loop join — quadratic, check join keys"),
    ("CartesianProduct", "cartesian product — check join keys"),
    ("BatchEvalPython", "row-at-a-time Python UDF in the plan"),
)

# (query, needle) pairs where the flagged shape is the operator's design,
# with the reason recorded in PLANS.md instead of a warning.
INTENTIONAL = {
    ("domain_blocklist_rollup", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the corpus-total URL count cross-joins "
        "onto the 20-row domain rollup — O(domains × 1), the idiomatic "
        "scalar attach (same shape as bm25's stats attach)",
    ("vocab_growth_curve", "BroadcastNestedLoopJoin"):
        "1-row × 1-row scalar attach: the two conditional aggregates "
        "(prefix token sums, prefix vocab counts) cross-join before the "
        "4-point literal unfold — O(1 × 1); replaced the r8 form whose "
        "non-equi LEFT joins broadcast the CORPUS-sized side (ADVICE "
        "r8 #3)",
    ("hybrid_rerank_topk", "BroadcastNestedLoopJoin"):
        "inherits hybrid_search_rrf's two benign shapes (1-row corpus-"
        "stats attach; broadcast(1 query vector) × corpus dense scoring) "
        "plus the re-rank's broadcast(1 query vector) × 20-candidate "
        "cosine — all O(n × 1) or O(20 × 1), never quadratic",
    ("hybrid_search_rrf", "BroadcastNestedLoopJoin"):
        "two benign shapes: the BM25 branch's single-ROW corpus-stats "
        "attach, and the dense branch's broadcast(1 query vector) × corpus "
        "scoring — the exact-cosine baseline retriever; both O(n × 1)",
    ("embedding_cosine_topk", "BroadcastNestedLoopJoin"):
        "brute-force exact baseline: broadcast(queries) × corpus scoring is "
        "the definition of the operator; ann_lsh_topk / ann_ivf_topk are the "
        "sub-quadratic scale paths",
    ("bm25_search_topk", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the corpus-level stats aggregate (n_docs, "
        "avgdl) cross-joins onto the postings — O(n × 1), the idiomatic "
        "scalar attach, not a quadratic join",
    ("tfidf_top_terms", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the corpus-level doc-count aggregate "
        "attaches to the term table — O(n × 1) scalar attach",
    ("doc_unigram_logppl", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the corpus token total attaches to the "
        "token table — O(n × 1) scalar attach",
    ("pmi_collocations", "BroadcastNestedLoopJoin"):
        "two single-ROW build sides: the corpus unigram total (N) and "
        "bigram total (B) attach to the min-count-floored bigram table "
        "before the log — O(pairs × 1) scalar attaches, the "
        "doc_unigram_logppl device twice",
    ("ccnet_ppl_buckets", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the corpus token total attaches to the "
        "token table — the doc_unigram_logppl machinery feeding the "
        "per-lang ntile",
    ("doc_sampling_weights", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the total temperature-mass aggregate "
        "attaches to the ~20-row per-source frame before that frame "
        "broadcasts to the corpus — O(sources × 1) scalar attach",
    ("sampling_ess_by_source", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the same total temperature-mass scalar "
        "attach as doc_sampling_weights (the ESS query composes that "
        "pipeline) — O(sources × 1)",
    ("temperature_mix_weights", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the (total tokens, total temperature "
        "mass) aggregate attaches to the ~20-row per-source frame — "
        "O(sources × 1) scalar attach",
    ("ngram_novelty_curriculum", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the doc_id min/max bounds attach to the "
        "per-doc novelty frame for the closed-form decile bucketing "
        "(replaces a global ntile window) — O(n × 1) scalar attach",
    ("rho_excess_loss_select", "BroadcastNestedLoopJoin"):
        "single-ROW build sides: the corpus token total (ref branch) and "
        "vocab-size aggregate (proxy add-one denominator) attach to the "
        "exploded gram tables — O(n × 1) scalar attaches, same shape as "
        "doc_unigram_logppl + doc_bigram_logppl composed",
    ("doc_bigram_logppl", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the vocab-size aggregate attaches to the "
        "bigram table for the add-one denominator — O(n × 1) scalar "
        "attach, same shape as doc_unigram_logppl",
    ("dsir_importance_weights", "BroadcastNestedLoopJoin"):
        "single-ROW build sides: the two model totals (tot_r, tot_t) "
        "cross-join onto the 256-row bucket-ratio table — O(256 × 1) "
        "scalar attach, same shape as doc_unigram_logppl",
    ("dsir_select_topk", "BroadcastNestedLoopJoin"):
        "single-ROW build sides: same weights pipeline as "
        "dsir_importance_weights feeding the Gumbel top-k",
    ("ann_pq_topk_seeded", "BroadcastNestedLoopJoin"):
        "ADC scoring IS a broadcast(query-LUTs) × corpus-codes scan — "
        "10 tiny LUT rows against the code table, m decimal lookups "
        "per candidate; the PQ analog of embedding_cosine_topk's shape",
    ("doremi_domain_weights", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the corpus totals (total, vs) attach to "
        "the Zipf-small gram-stats frame — O(n × 1) scalar attach (the "
        "r6 rework moved the token-share and mix normalizers to window "
        "sums over the ≤|sources|-row frame)",
    ("conversion_funnel", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the distinct-user total attaches to the "
        "three per-step count rows — O(3 × 1) scalar attach",
    ("length_debias_sample", "BroadcastNestedLoopJoin"):
        "single-ROW build sides: the histogram total and the max-ratio "
        "aggregate each cross-join onto the 6-row bucket frame before "
        "that frame broadcasts to the accept scan — O(buckets × 1) "
        "scalar attaches",
    ("doc_bigram_kn_logppl", "BroadcastNestedLoopJoin"):
        "single-ROW build side: the distinct-bigram total N1+(··) "
        "attaches to the exploded bigram table for the continuation "
        "denominator — O(n × 1) scalar attach, same shape as "
        "doc_unigram_logppl",
    ("contrastive_triplets", "BroadcastNestedLoopJoin"):
        "bounded build side: the anchor set (k rows) cross-joins the "
        "corpus for the negative draw — O(n × k) with k the anchor "
        "count, and the rank-1 window truncates map-side "
        "(WindowGroupLimit) so only one candidate per anchor per "
        "partition shuffles",
    ("ann_pq_recall_seeded", "BroadcastNestedLoopJoin"):
        "two benign bounded shapes from _pq_recall_rollup and the "
        "seeded scorers: the 2-row family-label frame cross-joins the "
        "(queries × k) truth pairs — O(queries·k × 2) — and the "
        "broadcast per-query LUT attach is the same O(codes × "
        "queries) ADC shape ann_pq_topk_seeded already adjudicates; "
        "nothing corpus × corpus",
}


def formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> int:
    spark = get_spark(app_name="explain_audit")
    spark.sparkContext.setLogLevel("ERROR")
    names = [
        n
        for n in registry.query_names()
        if {"bench", "tpch", "scale-pattern"} & set(registry.get_query(n).tags)
    ]
    update_baseline = "--update" in sys.argv
    try:
        with open(SHUFFLE_BASELINE) as f:
            shuffle_base = json.load(f)
    except FileNotFoundError:
        shuffle_base, update_baseline = {}, True
    shuffle_now: dict[str, int] = {}
    sections, warnings, infos = [], [], []
    for name in names:
        q = registry.get_query(name)
        plan = formatted_plan(spark, q.fn(spark, SF_DIR))
        for needle, why in SMELLS:
            if needle in plan:
                reason = INTENTIONAL.get((name, needle))
                if reason:
                    sections.append(f"_{name}: {needle} is intentional — {reason}_\n")
                else:
                    warnings.append(f"{name}: {why}")
        # formatted mode prints each scan twice (tree + detail block);
        # count only the numbered detail headers
        import re
        scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
        pushed = plan.count("PushedFilters: [")
        empty_pushed = plan.count("PushedFilters: []")
        # Shuffle regression: Exchange detail headers vs the recorded
        # baseline — a grown count means the query shuffles more than it
        # used to, the at-scale regression that per-query wall time at
        # sf0.01 cannot see.
        n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
        shuffle_now[name] = n_exchange
        base = shuffle_base.get(name)
        if base is None:
            if not update_baseline:
                infos.append(
                    f"{name}: new query, no shuffle baseline yet "
                    "(run with --update to record it)"
                )
        elif n_exchange > base:
            warnings.append(
                f"{name}: shuffle count regressed {base} → {n_exchange} "
                "Exchanges (run with --update if intentional)"
            )
        sections.append(
            f"## {name}\n\n"
            f"{q.doc.strip()}\n\n"
            f"scans={scans} pushed-filter-scans={pushed - empty_pushed} "
            f"exchanges={n_exchange}\n\n"
            f"```\n{plan.strip()}\n```\n"
        )
    # The baseline file mutates ONLY under --update: a read-only audit
    # must never absorb a regression into the baseline as a side effect
    # (new queries are reported as info, removed ones as info, and the
    # checked-in file stays byte-identical until a human accepts the
    # change).
    if update_baseline:
        with open(SHUFFLE_BASELINE, "w") as f:
            json.dump(shuffle_now, f, indent=1, sort_keys=True)
    else:
        for stale in sorted(set(shuffle_base) - set(shuffle_now)):
            infos.append(
                f"{stale}: in shuffle baseline but no longer bench-tagged "
                "(run with --update to drop it)"
            )
    head = [
        "# PLANS — physical plans of the headline queries",
        "",
        "Generated by scripts/explain_audit.py (sf0.01 inputs; plan shape",
        "is scale-independent, AQE re-plans sizes at runtime).",
        "",
        # the count lives HERE, next to the plans, so prose documents
        # (SCALE.md) can point at it instead of hand-copying a number
        # that drifted twice (r4, r5)
        f"{len(names)} audited plans.",
        "",
    ]
    if warnings:
        head += ["## ⚠ plan smells", ""] + [f"- {w}" for w in warnings] + [""]
    else:
        head += ["No plan smells detected (no nested-loop/cartesian joins, "
                 "no row-at-a-time Python).", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(head) + "\n" + "\n".join(sections))
    print(f"PLANS.md written: {len(names)} queries, {len(warnings)} warnings")
    for w in warnings:
        print(f"  ⚠ {w}")
    for i in infos:
        print(f"  i {i}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
