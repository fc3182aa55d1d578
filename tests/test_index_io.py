"""Legacy index-layout compatibility for the serving probes (ADVICE
r13 #3): a pre-r13 persisted index carries the build frame's own id
column name instead of the canonical ``id`` — probes must fall back to
it transparently, and a schema that is neither canonical nor legacy
must fail with a clear rebuild message, not an unresolved-column
AnalysisException."""

from __future__ import annotations

import pytest

from weather_data_data_pipeline_spark.functions.dedup import (
    build_mem_index,
    mem_probe_index,
)
from weather_data_data_pipeline_spark.functions.winnow import (
    build_winnow_index,
    winnow_probe_index,
)

_SPAN = " ".join(f"s{i}" for i in range(16))
_DOCS = [
    (1, _SPAN + " alpha beta gamma delta epsilon zeta eta theta"),
    (2, "one two three four five six seven eight " + _SPAN),
    (3, "unrelated words only here nothing shared at all today ok"),
]


def _corpus(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def _legacyize(spark, path, canonical_cols, legacy_id="doc_id"):
    """Rewrite <path>/postings with the pre-r13 layout (id -> doc_id)."""
    df = spark.read.parquet(f"{path}/postings").withColumnRenamed(
        "id", legacy_id
    )
    df.write.mode("overwrite").parquet(f"{path}/postings_legacy")
    # swap in place via a re-read (overwrite of the dir being read races)
    spark.read.parquet(f"{path}/postings_legacy").write.mode(
        "overwrite"
    ).parquet(f"{path}/postings")


def test_mem_probe_reads_legacy_postings(spark, tmp_path):
    path = str(tmp_path / "memidx")
    corpus = _corpus(spark)
    build_mem_index(corpus, path, "doc_id", "text", n=8)
    want = {
        (r["doc_id"], r["match_id"])
        for r in mem_probe_index(spark, path, corpus).collect()
    }
    assert want  # docs 1 and 2 share a 16-token span
    _legacyize(spark, path, ("id", "pos", "h"))
    got = {
        (r["doc_id"], r["match_id"])
        for r in mem_probe_index(spark, path, corpus).collect()
    }
    assert got == want


def test_winnow_probe_reads_legacy_postings(spark, tmp_path):
    path = str(tmp_path / "widx")
    corpus = _corpus(spark)
    build_winnow_index(corpus, path, "doc_id", "text")
    want = {
        (r["doc_id"], r["match_id"])
        for r in winnow_probe_index(spark, path, corpus).collect()
    }
    assert want
    _legacyize(spark, path, ("id", "h"))
    got = {
        (r["doc_id"], r["match_id"])
        for r in winnow_probe_index(spark, path, corpus).collect()
    }
    assert got == want


def test_unrecognized_postings_schema_raises_clear_error(spark, tmp_path):
    path = str(tmp_path / "badidx")
    spark.createDataFrame(
        [(1, 2, 3, 4)], "a long, b long, c long, d long"
    ).write.parquet(f"{path}/postings")
    with pytest.raises(ValueError, match="rebuild it with build_"):
        winnow_probe_index(spark, path, _corpus(spark)).collect()
