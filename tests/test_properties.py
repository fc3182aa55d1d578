"""Property-based checks (SURVEY §5.4) with hypothesis-generated inputs.

Each property runs real Spark jobs, so example counts are kept small —
the point is hitting shapes hand-written fixtures miss (empty frames,
duplicate keys, all-rows-duplicate, single-row), not fuzz volume.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from weather_data_data_pipeline_spark.functions.dedup import exact_dedup, jaccard_pairs
from weather_data_data_pipeline_spark.operators.aggregates import weekly_avg
from weather_data_data_pipeline_spark.operators.joins import anti_join_dedup

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_KEY = st.tuples(
    st.sampled_from(["IN", "US", "DE"]),
    st.sampled_from(["a", "b", "c", "d"]),
    st.integers(min_value=0, max_value=5),
)
_ROWS = st.lists(
    st.tuples(_KEY, st.floats(min_value=-100, max_value=100, allow_nan=False)),
    max_size=25,
)


@_SETTINGS
@given(new=_ROWS, dest=_ROWS)
def test_anti_join_disjoint_and_complete(spark, new, dest):
    """anti(new, dest) keys ∩ dest keys = ∅, and anti ∪ matched = new."""
    schema = "country string, city string, d int, value double"
    new_df = spark.createDataFrame([(k[0], k[1], k[2], v) for k, v in new], schema)
    dest_df = spark.createDataFrame([(k[0], k[1], k[2], v) for k, v in dest], schema)
    keys = ["country", "city", "d"]
    out = anti_join_dedup(new_df, dest_df, keys)
    out_keys = {tuple(r) for r in out.select(*keys).collect()}
    dest_keys = {tuple(r) for r in dest_df.select(*keys).collect()}
    assert out_keys.isdisjoint(dest_keys)
    new_keys = {tuple(r) for r in new_df.select(*keys).collect()}
    assert out_keys == new_keys - dest_keys
    # second application is a fixed point (idempotent append)
    assert anti_join_dedup(out, dest_df, keys).count() == out.count()


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.dates(datetime.date(2024, 1, 1), datetime.date(2024, 3, 1)),
            st.floats(min_value=0, max_value=1000, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_weekly_avg_partition_and_order_invariant(spark, rows, seed):
    """A1 result is identical under any row order / partitioning."""
    schema = "city string, ts date, v double"
    df1 = spark.createDataFrame(rows, schema)
    shuffled = sorted(rows, key=lambda r: hash((seed, r)))
    df2 = spark.createDataFrame(shuffled, schema).repartition(7)
    r1 = sorted(map(tuple, weekly_avg(df1, ["city"], "ts", "v").collect()))
    r2 = sorted(map(tuple, weekly_avg(df2, ["city"], "ts", "v").collect()))
    assert r1 == r2


@_SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=0, max_size=12
    )
)
def test_exact_dedup_partitions_the_input(spark, texts):
    """Each input row lands in exactly one group; representatives are
    group minima; copy counts sum back to the input size."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_dedup(df.withColumn("digest", F.sha2("text", 256)), ["digest"], "doc_id").collect()
    assert sum(r["n_copies"] for r in out) == len(rows)
    by_text: dict[str, list[int]] = {}
    for i, t in rows:
        by_text.setdefault(t, []).append(i)
    assert {r["keep_doc_id"] for r in out} == {min(v) for v in by_text.values()}


@_SETTINGS
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["w1", "w2", "w3", "w4"]), max_size=12).map(" ".join),
        min_size=0,
        max_size=8,
    )
)
def test_jaccard_pairs_bounds_and_orientation(spark, texts):
    """All emitted similarities are in (0, 1], pairs are id_a < id_b, and
    a document duplicated verbatim (≥ 3 tokens) scores exactly 1."""
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(len(rows) + i, t) for i, t in enumerate(texts)]  # verbatim copies
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.0).collect()
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert 0.0 < r["jaccard"] <= 1.0
    dup_pairs = {(r["id_a"], r["id_b"]) for r in out if r["jaccard"] == 1.0}
    for i, t in enumerate(texts):
        if len(t.split()) >= 3 and set(t.split()) != {""}:
            a, b = i, len(texts) + i
            assert (a, b) in dup_pairs


@settings(deadline=None, max_examples=15, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),  # key
            st.floats(-100, 100, allow_nan=False, width=16),
        ),
        min_size=1,
        max_size=40,
    ),
    n_batches=st.integers(1, 4),
)
def test_avg_state_merge_equals_full_recompute(spark, rows, n_batches):
    """Folding per-batch states (any batch split) == one full aggregate:
    the exact-decimal state makes ⊕ associative and order-insensitive."""
    from weather_data_data_pipeline_spark.operators.state import (
        avg_state,
        finalize_avg,
        merge_avg_states,
    )

    df = spark.createDataFrame(
        [(i, k, round(v, 2)) for i, (k, v) in enumerate(rows)],
        "id long, k int, v double",
    )
    batches = [
        df.where(F.pmod("id", F.lit(n_batches)) == b) for b in range(n_batches)
    ]
    states = [avg_state(b, ["k"], "v") for b in batches]
    merged = finalize_avg(merge_avg_states(states, ["k"]), ["k"])
    full = finalize_avg(avg_state(df, ["k"], "v"), ["k"])
    got = {r["k"]: r["average_value"] for r in merged.collect()}
    want = {r["k"]: r["average_value"] for r in full.collect()}
    assert got == want


_VOCAB = ["a", "b", "c", "d", "e"]
_DOC = st.lists(
    st.sampled_from(_VOCAB), min_size=0, max_size=12
).map(" ".join)


@_SETTINGS
@given(
    train=st.lists(_DOC, min_size=1, max_size=8),
    ev=st.lists(_DOC, min_size=1, max_size=4),
)
def test_decontamination_clean_converges_to_eval_free(spark, train, ev):
    """FIXPOINT completeness: a single pass removes every eval n-gram
    present in the ORIGINAL text, but stitching the cut can create a
    NEW eval gram across the boundary (hypothesis found the
    counterexample: removing 'e a a' from 'c c e e a a a' yields
    'c c e a' whose 'c e a' was an eval gram). The property that DOES
    hold: iterating the clean converges — each pass strictly shrinks a
    still-contaminated document — and the fixpoint is eval-gram-free.
    The tiny closed vocabulary makes heavy overlap the common case."""
    from weather_data_data_pipeline_spark.functions.dedup import (
        decontamination_clean,
    )
    from weather_data_data_pipeline_spark.functions.search import (
        ngram_contamination,
    )

    n = 3
    cur = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    ev_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(ev)], "doc_id long, text string"
    )
    max_tokens = max((len(t.split(" ")) for t in train), default=0)
    for _ in range(max_tokens + 1):
        out = decontamination_clean(cur, ev_df, "doc_id", "text", n=n)
        # monotone: a pass never grows a document
        assert out.where(
            F.col("kept_tokens") > F.col("n_tokens")
        ).count() == 0
        nxt = out.selectExpr(
            "doc_id", "coalesce(clean_text, '') AS text"
        )
        report = ngram_contamination(ev_df, nxt, "doc_id", "text", n=n)
        dirty = report.where(F.col("n_contaminated") > 0).count()
        cur = nxt
        if dirty == 0:
            break
    else:
        raise AssertionError("decontamination did not reach a fixpoint")
    # the fixpoint is eval-gram-free
    final = ngram_contamination(ev_df, cur, "doc_id", "text", n=n)
    assert final.where(F.col("n_contaminated") > 0).count() == 0
