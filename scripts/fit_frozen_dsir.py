"""Dev-time fit for the FROZEN DSIR model (`dsir_score_frozen` query in
plans/selection_queries.py).

Runs functions/importance.py:dsir_model_ratios once on sf0.001
(target slice lang='en', 64 md5 buckets) and prints the (bucket, r)
literal table pasted into the query module — the production DSIR
deployment mode scores every new shard against this frozen table, so
the registered query and its DuckDB oracle both carry the model as
literals and replay only the scoring path.

Run:  python scripts/fit_frozen_dsir.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from weather_data_data_pipeline_spark.functions.importance import (
        dsir_model_ratios,
    )
    from weather_data_data_pipeline_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    ratios = dsir_model_ratios(
        docs, "doc_id", "text", F.col("lang") == "en", num_buckets=64
    )
    rows = sorted((r["bucket"], str(r["r"])) for r in ratios.collect())
    print(f"# {len(rows)} buckets present, fit on {sf_dir}")
    print("_FROZEN_DSIR_RATIOS = [")
    for b, r in rows:
        print(f'    ({b}, "{r}"),')
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()
