"""Hand-computed cases for the CCNet-style line-level cross-corpus
dedup pair (functions/text.py: line_boilerplate_stats / _clean — Wenzek
et al. 2019 §3.2 semantics): a line in more than ``max_docs`` DISTINCT
documents is boilerplate and every copy of it drops; intra-document
repeats count their document ONCE for frequency but every copy for
removal; survivors keep original order; NULL text stays NULL."""

from __future__ import annotations

from weather_data_data_pipeline_spark.functions.text import (
    line_boilerplate_clean,
    line_boilerplate_stats,
)

BANNER = "accept our cookies"


def _corpus(spark):
    # banner in docs 1-4 (df=4 > max_docs=2); "menu" in docs 1-3 (df=3
    # > 2); "rare" in docs 1-2 only (df=2, NOT boilerplate); doc 4
    # repeats the banner twice (df still counts doc 4 once); doc 5 is
    # NULL text; doc 6 has no boilerplate at all.
    rows = [
        (1, f"{BANNER}\nmenu\nrare\nbody one"),
        (2, f"{BANNER}\nmenu\nrare\nbody two"),
        (3, f"{BANNER}\nmenu\nbody three"),
        (4, f"{BANNER}\nbody four\n{BANNER}"),
        (5, None),
        (6, "all original\ncontent here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stats_counts_every_copy_but_df_counts_docs_once(spark):
    got = {
        r["doc_id"]: (
            r["n_lines"], r["boiler_lines"], r["kept_lines"],
            r["boiler_frac"],
        )
        for r in line_boilerplate_stats(
            _corpus(spark), "doc_id", "text", max_docs=2
        ).collect()
    }
    assert got[1] == (4, 2, 2, 0.5)  # banner + menu drop, rare stays
    assert got[2] == (4, 2, 2, 0.5)
    assert got[3] == (3, 2, 1, 0.6667)
    # doc 4: BOTH banner copies drop (df counted doc 4 once — with it
    # double-counted the banner would be df=5, same verdict, but "menu"
    # at df=3 vs max_docs=2 pins the distinct-count semantics above)
    assert got[4] == (3, 2, 1, 0.6667)
    assert got[5] == (None, 0, None, 0.0)
    assert got[6] == (2, 0, 2, 0.0)


def test_clean_drops_all_copies_and_keeps_order(spark):
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["kept_lines"])
        for r in line_boilerplate_clean(
            _corpus(spark), "doc_id", "text", max_docs=2
        ).collect()
    }
    assert got[1] == ("rare\nbody one", 4, 2)
    assert got[2] == ("rare\nbody two", 4, 2)
    assert got[3] == ("body three", 3, 1)
    assert got[4] == ("body four", 3, 1)
    assert got[5] == (None, None, None)
    assert got[6] == ("all original\ncontent here", 2, 2)


def test_threshold_is_strictly_greater_than(spark):
    # df == max_docs is NOT boilerplate (CCNet drops only lines
    # duplicated in MORE than N docs)
    rows = [(1, "x\na"), (2, "x\nb"), (3, "x\nc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        r["doc_id"]: r["boiler_lines"]
        for r in line_boilerplate_stats(
            df, "doc_id", "text", max_docs=3
        ).collect()
    }
    assert stats == {1: 0, 2: 0, 3: 0}
    stats2 = {
        r["doc_id"]: r["boiler_lines"]
        for r in line_boilerplate_stats(
            df, "doc_id", "text", max_docs=2
        ).collect()
    }
    assert stats2 == {1: 1, 2: 1, 3: 1}


def test_fully_boilerplate_doc_cleans_to_empty(spark):
    rows = [(i, BANNER) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["kept_lines"])
        for r in line_boilerplate_clean(
            df, "doc_id", "text", max_docs=2
        ).collect()
    }
    assert got == {i: ("", 0) for i in range(1, 5)}
