#!/usr/bin/env python
"""r14 replan study for corpus_contamination_bloom (VERDICT r13 ask #3).

Second consecutive over-both-bars interleaved round forces a replan (the
ngram_containment_pairs precedent). Candidate shapes, same session, warm
caches, alternating timed reps against the DuckDB oracle:

  A. current registered plan — driver-literal Bloom prescreen
     (functions/search.py:ngram_contamination_bloom): one extra bounded
     bloom-build ACTION before the main job.
  B. broadcast EXACT prescreen, one job: the distinct eval gram hashes
     broadcast to the train gram scan as a left-semi probe BEFORE any
     shuffle; the surviving train grams are a SUBSET of the eval gram
     set (exact prescreen — no false positives), hence bounded by the
     eval premise and broadcast back to the per-doc hit count. Zero
     train-side shuffle beyond the sliver distinct, no driver action.
  C. the exact twin corpus_contamination (reference point).

Usage: python scripts/replan_contamination_r14.py [--reps 5]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from weather_data_data_pipeline_spark import registry  # noqa: E402
from weather_data_data_pipeline_spark.functions.dedup import (  # noqa: E402
    hashed_shingles,
    shingle_array,
)
from weather_data_data_pipeline_spark.functions.search import (  # noqa: E402
    _contamination_from_grams,
)
from weather_data_data_pipeline_spark.session import get_spark  # noqa: E402
from weather_data_data_pipeline_spark.sources.tables import (  # noqa: E402
    load,
    warm_cache,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ngram_contamination_prescreen(train, eval_df, id_col, text_col, n=3):
    ev_grams = hashed_shingles(eval_df, id_col, text_col, n)
    ev_h = ev_grams.select("h").dropDuplicates()
    train_grams = (
        train.select(F.explode(shingle_array(text_col, n)).alias("g"))
        .select(F.xxhash64("g").alias("h"))
        .join(F.broadcast(ev_h), "h", "left_semi")
        .dropDuplicates()
    )
    return _contamination_from_grams(
        ev_grams, F.broadcast(train_grams), eval_df, id_col, text_col, n
    )


def _spark_variant(spark, which):
    docs = load(spark, SF_DIR, "documents")
    train = docs.where(F.col("source") != "src0")
    ev = docs.where(F.col("source") == "src0")
    if which == "A":
        q = registry.get_query("corpus_contamination_bloom")
        return q.fn(spark, SF_DIR)
    if which == "B":
        return ngram_contamination_prescreen(train, ev, "doc_id", "text", 3)
    q = registry.get_query("corpus_contamination")
    return q.fn(spark, SF_DIR)


def main() -> int:
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark(app_name="replan_contamination")
    spark.sparkContext.setLogLevel("ERROR")
    warm_cache(spark, SF_DIR, ["documents"])

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = registry.get_query("corpus_contamination_bloom").oracle

    def run_spark(which):
        t = time.perf_counter()
        _spark_variant(spark, which).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t

    def run_duck():
        t = time.perf_counter()
        con.execute(oracle).fetchall()
        return time.perf_counter() - t

    # verify B is value-identical to A before timing anything
    a = sorted(map(tuple, _spark_variant(spark, "A").collect()))
    b = sorted(map(tuple, _spark_variant(spark, "B").collect()))
    assert a == b, "prescreen variant diverges from the registered plan"
    print(f"variant B value-identical to A over {len(a)} rows", flush=True)

    out = {}
    for which in ("A", "B", "C"):
        for _ in range(3):
            run_spark(which)  # warmup
        run_duck()
        s_reps, d_reps = [], []
        for _ in range(reps):
            s_reps.append(round(run_spark(which), 3))
            d_reps.append(round(run_duck(), 3))
        s_med = statistics.median(s_reps)
        d_med = statistics.median(d_reps)
        out[which] = {
            "spark_median": s_med,
            "duckdb_median": d_med,
            "ratio": round(s_med / d_med, 2),
            "spark_reps": s_reps,
            "duckdb_reps": d_reps,
        }
        print(json.dumps({which: out[which]}), flush=True)
    print(json.dumps({"metric": "replan_contamination_r14", "sf_dir": SF_DIR,
                      "variants": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
