"""Python UDTF surface (functions/udtfs.py): SQL-callable row expansion."""

from __future__ import annotations

import pytest

from weather_data_data_pipeline_spark.functions.udtfs import register_udtfs
from weather_data_data_pipeline_spark.sources.tables import register_temp_views

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def setup(spark):
    register_udtfs(spark)
    register_temp_views(spark, SF_DIR)


def test_chunks_cover_text_with_overlap(spark):
    rows = spark.sql(
        "SELECT * FROM chunk_text('a b c d e f g h i j', 4, 1)"
    ).collect()
    chunks = [r["chunk"] for r in sorted(rows, key=lambda r: r["chunk_id"])]
    assert chunks == ["a b c d", "d e f g", "g h i j"]
    assert all(r["n_tokens"] == 4 for r in rows)


def test_lateral_join_over_documents(spark):
    out = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_tokens
        FROM documents d, LATERAL chunk_text(d.text, 32, 0) c
        WHERE d.doc_id < 20
        """
    )
    rows = out.collect()
    assert len(rows) > 0
    # Chunk token counts must tie back to each doc's whitespace tokens.
    docs = {
        r["doc_id"]: len((r["text"] or "").split())
        for r in spark.sql("SELECT doc_id, text FROM documents WHERE doc_id < 20").collect()
    }
    got = {}
    for r in rows:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + r["n_tokens"]
    for doc_id, total in got.items():
        assert total == docs[doc_id]
    # Every chunk except possibly the last is full.
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r["n_tokens"])
    for sizes in by_doc.values():
        assert all(s == 32 for s in sizes[:-1])


def test_empty_and_null_text_yield_no_rows(spark):
    assert spark.sql("SELECT * FROM chunk_text('', 8, 0)").count() == 0
    assert (
        spark.sql("SELECT * FROM chunk_text(CAST(NULL AS STRING), 8, 0)").count()
        == 0
    )
