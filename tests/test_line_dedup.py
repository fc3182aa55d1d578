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


def test_frozen_index_probe_cleans_against_reference_head(spark, tmp_path):
    """Serving trio (r15): build_line_index freezes the REFERENCE
    corpus's boilerplate head; the probe drops exactly those lines from
    arriving docs — reference df decides, not the arriving batch's own
    frequencies — and NULL text stays NULL."""
    from weather_data_data_pipeline_spark.functions.text import (
        build_line_index,
        line_boilerplate_probe_clean,
    )

    ref_rows = [(i, f"{BANNER}\nref body {i}") for i in range(10, 14)]
    ref = spark.createDataFrame(ref_rows, "doc_id bigint, text string")
    path = str(tmp_path / "ccnet_idx")
    build_line_index(ref, path, "doc_id", "text", sep="\n", max_docs=2)

    # arriving: banner (in the frozen head) drops; "fresh dup" repeats
    # across MANY arriving docs but is NOT in the reference head, so it
    # survives — the frozen state decides, by design
    arr = spark.createDataFrame(
        [(1, f"{BANNER}\nfresh dup\nmine"), (2, f"fresh dup\n{BANNER}"),
         (3, "fresh dup\nother"), (4, "fresh dup\nmore"), (5, None)],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r
        for r in line_boilerplate_probe_clean(
            spark, path, arr, "doc_id", "text"
        ).collect()
    }
    assert got[1]["clean_text"] == "fresh dup\nmine"
    assert (got[1]["n_lines"], got[1]["kept_lines"]) == (3, 2)
    assert got[2]["clean_text"] == "fresh dup"
    assert got[3]["clean_text"] == "fresh dup\nother"  # untouched
    assert got[5]["clean_text"] is None
    assert got[5]["n_lines"] is None and got[5]["kept_lines"] is None


def test_ccnet_index_clean_registered_consistent_with_batch(spark):
    """The registered serving query runs end-to-end at sf0.001 and its
    probe semantics agree with an in-test rebuild: every cleaned row
    equals line_boilerplate_probe_clean over the same frozen split."""
    from weather_data_data_pipeline_spark.plans.llm_queries import (
        _ccnet_fab,
        ccnet_index_clean,
    )

    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in ccnet_index_clean(spark, sf).collect()}
    fab = _ccnet_fab(spark, sf)
    batch_ids = {
        r["doc_id"] for r in fab.where("doc_id % 3 = 0").collect()
    }
    assert set(out) == batch_ids and len(out) > 0
    # every doc keeps >= 2 of its 4 fabricated lines (the two content
    # chunks are effectively unique and can never be in the frozen head)
    assert all(r["n_lines"] == 4 for r in out.values())
    assert all(2 <= r["kept_lines"] <= 4 for r in out.values())
    # at least one doc actually lost its banner to the reference head
    assert any(r["kept_lines"] < 4 for r in out.values())


def test_ccnet_clean_sink_equals_batch_probe(spark, tmp_path):
    """Stream == batch bit-equality for the CCNet serving sink: the
    frozen head is per-document state-free, so rows cleaned in
    micro-batches equal the one-shot batch probe over the union."""
    from weather_data_data_pipeline_spark.functions.text import (
        build_line_index,
        line_boilerplate_probe_clean,
    )
    from weather_data_data_pipeline_spark.streaming.incremental import (
        ccnet_clean_sink,
        run_available_now,
    )

    ref = spark.createDataFrame(
        [(i, f"{BANNER}\nref {i}") for i in range(20, 24)],
        "doc_id bigint, text string",
    )
    idx = str(tmp_path / "idx")
    build_line_index(ref, idx, "doc_id", "text", sep="\n", max_docs=2)

    arr_rows = [
        (i, f"{BANNER}\nkeep {i}" if i % 2 else f"solo {i}")
        for i in range(1, 7)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(arr_rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_available_now(ccnet_clean_sink(stream, idx, out, ck))

    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["kept_lines"])
        for r in spark.read.parquet(out).collect()
    }
    arr = spark.createDataFrame(arr_rows, "doc_id bigint, text string")
    want = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["kept_lines"])
        for r in line_boilerplate_probe_clean(
            spark, idx, arr, "doc_id", "text"
        ).collect()
    }
    assert got == want
