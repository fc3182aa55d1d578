"""Sketch accuracy contracts: HLL++ cardinalities within the configured
rsd of exact, quantile sketches within rank-error bounds of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from weather_data_data_pipeline_spark.operators.sketches import (
    cardinality_report,
    value_distribution,
)
from weather_data_data_pipeline_spark.sources.tables import load


def test_hll_within_rsd_of_exact(spark):
    ev = load(spark, SF_DIR, "events")
    got = {
        r["event_type"]: r["approx_n_user_id"]
        for r in cardinality_report(ev, ["event_type"], "user_id", rsd=0.02).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got.keys() == exact.keys()
    for k, e in exact.items():
        # 2% rsd → 5σ bound of 10%; generous but catches real breakage
        assert abs(got[k] - e) <= max(2, 0.10 * e), (k, got[k], e)


def test_quantile_sketch_bounds(spark):
    ev = load(spark, SF_DIR, "events")
    got = value_distribution(ev, ["event_type"], "value").collect()
    for r in got:
        vals = [
            x["value"]
            for x in ev.where(F.col("event_type") == r["event_type"])
            .select("value")
            .collect()
        ]
        vals.sort()
        n = len(vals)
        for p, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            # rank error ≤ n/accuracy + 1 positions
            target = int(p * n)
            tol = max(2, n // 1000)
            lo = vals[max(0, target - tol)]
            hi = vals[min(n - 1, target + tol)]
            assert lo - 1e-9 <= r[col] <= hi + 1e-9, (r["event_type"], col, r[col], lo, hi)
        assert r["n_rows"] == n


def test_constraint_report_counts_planted_defects(spark):
    from pyspark.sql import functions as F

    from weather_data_data_pipeline_spark.operators.quality import (
        constraint_report,
    )

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 1, 10.0), (2, 1, None), (3, 1, -5.0), (4, 2, 0.5)],
        "k long, sub long, price double",
    )
    r = constraint_report(
        df,
        not_null=["price"],
        violations={"price_positive": F.col("price") <= 0},
        unique_key=["k", "sub"],
    ).collect()[0]
    assert r["n_rows"] == 5
    assert r["nulls_price"] == 1
    assert r["bad_price_positive"] == 1  # -5.0 (NULL doesn't match <= 0)
    assert r["rows_in_duplicate_keys"] == 2  # the two (1,1) rows


def test_heavy_hitters_guarantee_and_bound(spark):
    """MG contract: every item with true count > N/capacity is present,
    and reported counts are underestimates by ≤ N/capacity — across a
    multi-partition input where per-partition summaries merge."""
    from weather_data_data_pipeline_spark.operators.sketches import heavy_hitters

    # skewed synthetic: item k appears 2^(12-k) times, k=0..11, plus a
    # long tail of singletons to force MG compression at capacity 16
    rows = []
    for k in range(12):
        rows += [f"hot_{k}"] * (1 << (12 - k))
    rows += [f"tail_{i}" for i in range(3000)]
    df = spark.createDataFrame(
        [(x,) for x in rows], "item string"
    ).repartition(6)
    n = len(rows)
    cap = 16
    got = {
        r["item"]: r["min_count"]
        for r in heavy_hitters(df, "item", capacity=cap).collect()
    }
    exact = {}
    for x in rows:
        exact[x] = exact.get(x, 0) + 1
    bound = n / cap
    for item, c in exact.items():
        if c > bound:
            assert item in got, f"guaranteed heavy hitter missing: {item}"
    for item, mc in got.items():
        assert mc <= exact[item], f"overcount for {item}"
        assert exact[item] - mc <= bound, f"undercount beyond bound for {item}"


def test_hll_merge_equals_direct_weekly_sketch(spark):
    """Union of daily sketches must equal one sketch built directly over
    the week (HLL union is lossless for same-lgK sketches), and land
    within the sketch's error bound of the exact count."""
    from weather_data_data_pipeline_spark.sources.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    week = F.date_trunc("week", "ts").alias("week_start")
    direct = {
        r["week_start"]: r["d"]
        for r in ev.groupBy(week)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("d"))
        .collect()
    }
    merged = {
        r["week_start"]: r["m"]
        for r in ev.groupBy(week, F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("week_start")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("m"))
        .collect()
    }
    exact = {
        r["week_start"]: r["x"]
        for r in ev.groupBy(week)
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    assert merged == direct
    for wk, est in merged.items():
        assert abs(est - exact[wk]) / max(exact[wk], 1) < 0.05


def test_count_min_overestimates_within_bound(spark):
    import math

    from weather_data_data_pipeline_spark.operators.sketches import (
        cms_point_estimate,
        count_min_sketch,
    )

    # skewed corpus: key k appears k times, k = 1..120 (N = 7260)
    rows = [(k,) for k in range(1, 121) for _ in range(k)]
    df = spark.createDataFrame(rows, "k long")
    width, depth = 1 << 12, 5
    sk = count_min_sketch(df, "k", width, depth).localCheckpoint(eager=True)
    keys = spark.createDataFrame([(k,) for k in range(1, 121)], "k long")
    est = {
        r["k"]: r["est_count"]
        for r in cms_point_estimate(sk, keys, "k", width, depth).collect()
    }
    n = len(rows)
    eps = math.e / width
    for k in range(1, 121):
        assert est[k] >= k, "CMS must never underestimate"
        assert est[k] <= k + eps * n + 1, f"bound blown for {k}: {est[k]}"
    # unseen key → 0 (all cells empty) or tiny collision mass
    unseen = cms_point_estimate(
        sk, spark.createDataFrame([(10_000,)], "k long"), "k", width, depth
    ).first()["est_count"]
    assert unseen <= eps * n


def test_count_min_merge_equals_direct(spark):
    from weather_data_data_pipeline_spark.operators.sketches import (
        cms_merge,
        cms_point_estimate,
        count_min_sketch,
    )

    a = spark.createDataFrame([(k % 50,) for k in range(2000)], "k long")
    b = spark.createDataFrame([(k % 30,) for k in range(900)], "k long")
    merged = cms_merge(count_min_sketch(a, "k"), count_min_sketch(b, "k"))
    direct = count_min_sketch(a.unionByName(b), "k")
    keys = spark.createDataFrame([(k,) for k in range(50)], "k long")
    em = {r["k"]: r["est_count"] for r in cms_point_estimate(merged, keys, "k").collect()}
    ed = {r["k"]: r["est_count"] for r in cms_point_estimate(direct, keys, "k").collect()}
    assert em == ed, "merged sketch must answer exactly like the direct one"


def test_user_event_counts_cms_query_invariants(spark):
    """Runs the REGISTERED rows-only query (ADVICE r9 #2: its
    verified_by closure must re-run the query itself): the CMS estimate
    is a guaranteed OVER-estimate, the surfaced overcount is exactly
    est - true, and the true counts match an exact recount."""
    from weather_data_data_pipeline_spark.plans.timeseries_queries import (
        user_event_counts_cms,
    )
    from weather_data_data_pipeline_spark.sources.tables import load

    sf = "/root/testdata/sf0.001"
    rows = user_event_counts_cms(spark, sf).collect()
    assert rows
    for r in rows:
        assert r["est_count"] >= r["true_count"] > 0
        assert r["overcount"] == r["est_count"] - r["true_count"]
    import pyspark.sql.functions as _F

    exact = {
        r["user_id"]: r["c"]
        for r in load(spark, sf, "events")
        .groupBy("user_id")
        .agg(_F.count("*").alias("c"))
        .collect()
    }
    for r in rows:
        assert r["true_count"] == exact[r["user_id"]]


def test_frequent_tokens_mg_query_invariants(spark):
    """Runs the REGISTERED rows-only query: Misra-Gries lower bounds
    never exceed the exact token counts, and the undisputed heavy
    hitters are all present."""
    from weather_data_data_pipeline_spark.plans.llm_queries import (
        frequent_tokens_mg,
    )
    from weather_data_data_pipeline_spark.sources.tables import load
    import pyspark.sql.functions as _F

    sf = "/root/testdata/sf0.001"
    rows = {r["item"]: r["min_count"] for r in
            frequent_tokens_mg(spark, sf).collect()}
    assert rows
    exact = {
        r["t"]: r["c"]
        for r in load(spark, sf, "documents")
        .select(_F.explode(_F.split("text", " ")).alias("t"))
        .where(_F.col("t") != "")
        .groupBy("t")
        .agg(_F.count("*").alias("c"))
        .collect()
    }
    for item, mc in rows.items():
        assert 0 < mc <= exact[item], (item, mc, exact[item])
    # the top-3 exact heavy hitters must survive the sketch
    top3 = sorted(exact, key=lambda t: -exact[t])[:3]
    assert set(top3) <= set(rows)
