#!/usr/bin/env python
"""Skew demonstration artifact (VERDICT r2 "Next round" #5): MEASURED
shuffle-volume reduction of map-side top-k truncation on a deliberately
skewed key.

Builds a ~5M-row events frame where one hot user owns ~10% of all rows
(the hot-group shape that funnels through a single reducer at scale),
then runs top-3-per-user three ways:

1. ``grouped_topk`` (the declarative window; Spark ≥3.5 rank-limit
   pushdown / WindowGroupLimit(Partial) truncates map-side natively);
2. the same window with the pushdown DISABLED
   (``spark.sql.optimizer.windowGroupLimitThreshold = -1``) — the
   pre-3.5 world where the full group funnels to its reducer;
3. the round-2 MANUAL two-phase truncation (local window over
   (spark_partition_id, group), then the global window) — kept to show
   why it was retired: its phase-1 window inserts an extra Exchange.

Wall seconds and actual shuffle read/write bytes come from the
AppStatusStore (job-group scoped). Results are asserted row-identical
across all three before being reported.

Run: python scripts/skew_demo.py          # prints one JSON line
The measured numbers are recorded in SCALE.md §"Ranking".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from weather_data_data_pipeline_spark.operators.ranking import grouped_topk  # noqa: E402
from weather_data_data_pipeline_spark.session import get_spark  # noqa: E402
from weather_data_data_pipeline_spark.sources.tables import load  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = 50
K = 3


def shuffle_bytes_for_group(spark, group: str) -> tuple[int, int]:
    st = spark.sparkContext.statusTracker()
    store = spark.sparkContext._jsc.sc().statusStore()
    w = r = 0
    for j in st.getJobIdsForGroup(group):
        info = st.getJobInfo(j)
        if info is None:
            continue
        for sid in info.stageIds:
            try:
                sd = store.lastStageAttempt(sid)
            except Exception:
                continue
            w += sd.shuffleWriteBytes()
            r += sd.shuffleReadBytes()
    return w, r


def timed(spark, tag: str, df) -> dict:
    sc = spark.sparkContext
    # warm run (codegen/JIT), unmeasured
    df.write.format("noop").mode("overwrite").save()
    sc.setJobGroup(tag, tag)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    w, r = shuffle_bytes_for_group(spark, tag)
    return {
        "wall_sec": round(wall, 3),
        "shuffle_write_bytes": w,
        "shuffle_read_bytes": r,
    }


def main() -> None:
    spark = get_spark(app_name="skew_demo")
    spark.sparkContext.setLogLevel("ERROR")

    events = load(spark, SF_DIR, "events")
    rep = spark.range(REPLICATE).withColumnRenamed("id", "_r")
    skewed = (
        events.crossJoin(rep)
        .withColumn("event_id", F.col("event_id") * REPLICATE + F.col("_r"))
        # hot user 1 owns every 10th row — ~10% of the corpus on one key
        .withColumn(
            "user_id",
            F.when(F.col("event_id") % 10 == 0, F.lit(1)).otherwise(
                F.col("user_id")
            ),
        )
        .drop("_r")
        .repartition(32)
        .localCheckpoint(eager=True)  # pin the input so generation cost and
        # its shuffles are excluded from both measurements
    )
    n = skewed.count()
    hot = skewed.where(F.col("user_id") == 1).count()

    topk = grouped_topk(
        skewed, ["user_id"], "value", K, tiebreak_cols=["event_id"]
    )

    # round-2's manual two-phase truncation, preserved here for the A/B
    w_order = [F.desc("value"), F.asc("event_id")]
    local = Window.partitionBy(F.spark_partition_id(), "user_id").orderBy(*w_order)
    final = Window.partitionBy("user_id").orderBy(*w_order)
    manual = (
        skewed.withColumn("_lrn", F.row_number().over(local))
        .where(F.col("_lrn") <= K)
        .drop("_lrn")
        .withColumn("rn", F.row_number().over(final).cast("int"))
        .where(F.col("rn") <= K)
    )

    # identical answers first — no optimization may change the result
    cols = ["user_id", "rn", "event_id", "value"]
    a = sorted(map(tuple, topk.select(*cols).collect()))
    b = sorted(map(tuple, manual.select(*cols).collect()))
    assert a == b, "manual truncation diverged from the declarative window"

    res_pushdown = timed(spark, "skew_window_group_limit", topk)
    res_manual = timed(spark, "skew_manual_two_phase", manual)

    # the pre-Spark-3.5 world: rank-limit pushdown disabled → every row
    # of every group crosses the wire to its group's reducer
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    try:
        no_pd = grouped_topk(
            skewed, ["user_id"], "value", K, tiebreak_cols=["event_id"]
        )
        c = sorted(map(tuple, no_pd.select(*cols).collect()))
        assert a == c, "disabling the pushdown changed the result"
        res_no_pushdown = timed(spark, "skew_no_pushdown", no_pd)
    finally:
        spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "1000")

    out = {
        "metric": "skew_demo_top3_per_user",
        "rows": n,
        "hot_user_rows": hot,
        "hot_share": round(hot / n, 4),
        "window_group_limit": res_pushdown,
        "pushdown_disabled": res_no_pushdown,
        "manual_two_phase": res_manual,
        "truncation_shuffle_reduction": round(
            res_no_pushdown["shuffle_write_bytes"]
            / max(1, res_pushdown["shuffle_write_bytes"]),
            1,
        ),
        "sf_dir": SF_DIR,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
