"""NULL-text oracle parity for the ExactSubstr family (ADVICE r13 #1).

The bench corpus carries no NULL text, so the driver gate can never see
the divergence ADVICE flagged: ``F.size(split(NULL))`` is -1 under
Spark's default ``legacy.sizeOfNull`` while every DuckDB oracle yields
NULL. This suite replays the REGISTERED queries and their REGISTERED
oracle SQL over a corpus that does contain NULL (and empty, and short)
text, through the same column-sorted typed compare the driver uses — so
the latent class stays closed even if the plans change.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tests.conftest import assert_matches_oracle
from weather_data_data_pipeline_spark import registry

# one ≥12-token span shared by docs 1 and 2 (doc 2, the higher id, gets
# cut); doc 3 is NULL text, doc 4 empty, doc 5 too short for any 8-gram
_SPAN = " ".join(f"s{i}" for i in range(14))
_ROWS = [
    (1, _SPAN + " tail1 tail2 tail3 tail4 tail5 tail6 tail7 tail8",
     "en", "web", 0),
    (2, "head1 head2 head3 head4 head5 head6 head7 head8 " + _SPAN,
     "en", "web", 0),
    (3, None, "en", "web", 0),
    (4, "", "en", "web", 0),
    (5, "too short for grams", "en", "web", 0),
]


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("null_docs_sf")
    pd.DataFrame(
        _ROWS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.fixture(scope="module")
def null_duck(null_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{null_sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["exact_substring_removal", "exact_substring_clean"]
)
def test_exact_substring_null_text_matches_oracle(
    spark, null_sf_dir, null_duck, name
):
    q = registry.get_query(name)
    assert_matches_oracle(
        q.fn(spark, null_sf_dir), null_duck, q.oracle, exact=True
    )


def test_null_text_counts_are_null_not_minus_one(spark, null_sf_dir):
    q = registry.get_query("exact_substring_removal")
    row = {
        r["doc_id"]: r for r in q.fn(spark, null_sf_dir).collect()
    }[3]
    assert row["n_tokens"] is None
    assert row["kept_tokens"] is None
    assert row["cut_tokens"] == 0 and row["n_cut_spans"] == 0
