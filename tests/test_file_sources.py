"""CSV / JSON-lines connectors: round-trips, malformed-row handling,
nested-type guardrails."""

from __future__ import annotations

import pytest

from weather_data_data_pipeline_spark.sources.files import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from weather_data_data_pipeline_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_round_trip_flat_table(spark, tmp_path):
    nation = load(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, nation.schema)
    assert back.schema == nation.schema
    assert _sorted_rows(back) == _sorted_rows(nation)


def test_csv_round_trip_timestamps(spark, tmp_path):
    orders = load(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_csv")
    write_csv(orders, path)
    back = read_csv(spark, path, orders.schema)
    assert _sorted_rows(back) == _sorted_rows(orders)


def test_csv_rejects_nested_columns(spark, tmp_path):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
    with pytest.raises(ValueError, match="nested"):
        write_csv(df, str(tmp_path / "bad"))


def test_jsonl_round_trip_nested(spark, tmp_path):
    emb = load(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "emb_jsonl")
    write_jsonl(emb, path)
    back = read_jsonl(spark, path, emb.schema)
    assert back.schema == emb.schema
    a = {r["vec_id"]: r for r in back.collect()}
    b = {r["vec_id"]: r for r in emb.collect()}
    assert a.keys() == b.keys()
    for k in b:
        assert a[k]["label"] == b[k]["label"]
        assert a[k]["embedding"] == pytest.approx(b[k]["embedding"], rel=1e-6)


def test_jsonl_corrupt_record_surfaced(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"id": 1, "name": "ok"}\n{not json at all}\n')
    df = read_jsonl(
        spark,
        str(tmp_path),
        "id long, name string, _corrupt_record string",
        corrupt_col="_corrupt_record",
    )
    rows = df.collect()
    assert len(rows) == 2
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["id"] is None


def test_csv_failfast_raises_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,n\n1,2\nnot_a_number,3\n")
    df = read_csv(spark, str(p), "id long, n long", mode="FAILFAST")
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        df.collect()


def test_orc_round_trip(spark, tmp_path):
    from weather_data_data_pipeline_spark.sources.files import read_orc, write_orc

    emb = load(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "emb_orc")
    write_orc(emb, path)
    back = read_orc(spark, path)
    assert back.schema == emb.schema
    assert _sorted_rows(back) == _sorted_rows(emb)


def test_normalize_ntz_rejects_non_utc_session(spark, tmp_path):
    import pytest

    from weather_data_data_pipeline_spark.sources.tables import normalize_ntz

    path = str(tmp_path / "ntz")
    spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 12:00:00' AS t"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("t") != "timestamp_ntz":
        return  # writer config didn't produce NTZ; nothing to guard
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="timeZone=UTC"):
            normalize_ntz(df)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert normalize_ntz(df).dtypes[0][1] == "timestamp"


def test_union_evolve_widens_and_nullfills(spark):
    import pytest as _pytest

    from weather_data_data_pipeline_spark.sources.files import union_evolve

    b1 = spark.createDataFrame([(1, 10, "a")], "id int, v int, tag string")
    b2 = spark.createDataFrame([(2, 2.5)], "id bigint, v double")  # drifted
    b3 = spark.createDataFrame([(3, None, "c", True)],
                               "id int, v double, tag string, flag boolean")
    out = union_evolve([b1, b2, b3])
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        ("id", "bigint"), ("v", "double"), ("tag", "string"), ("flag", "boolean")
    ]
    rows = {r["id"]: (r["v"], r["tag"], r["flag"]) for r in out.collect()}
    assert rows[1] == (10.0, "a", None)
    assert rows[2] == (2.5, None, None)
    assert rows[3] == (None, "c", True)

    # non-numeric conflicts must fail loudly, not coerce
    bad = spark.createDataFrame([("x",)], "v string")
    with _pytest.raises(TypeError, match="incompatible"):
        union_evolve([b1, bad])


def test_union_evolve_int_float_mix_promotes_to_double(spark):
    """bigint ∪ float must land on DOUBLE, never float — float32's 24-bit
    mantissa silently corrupts int64 values above 2^24 (Spark's native
    union precedence would pick float here; the helper must not)."""
    from weather_data_data_pipeline_spark.sources.files import union_evolve

    big = (1 << 40) + 1  # not representable in float32
    b1 = spark.createDataFrame([(big,)], "v bigint")
    b2 = spark.createDataFrame([(2.5,)], "v float")
    out = union_evolve([b1, b2])
    assert dict(out.dtypes)["v"] == "double"
    vals = sorted(r["v"] for r in out.collect())
    assert vals == [2.5, float(big)]  # exact: double holds ints < 2^53

    # int ∪ float likewise: 2^24+1 is the first int float32 cannot hold
    c1 = spark.createDataFrame([((1 << 24) + 1,)], "v int")
    c2 = spark.createDataFrame([(0.5,)], "v float")
    out2 = union_evolve([c1, c2])
    assert dict(out2.dtypes)["v"] == "double"
    assert sorted(r["v"] for r in out2.collect()) == [0.5, float((1 << 24) + 1)]
