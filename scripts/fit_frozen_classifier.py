"""Dev-time fit for the FROZEN quality classifier
(`quality_classifier_frozen_scores` in plans/selection_queries.py).

The registered query scores documents with LITERAL pinned coefficients
over md5-hashed token buckets — the `dsir_score_frozen` /
seeded-planes device that makes the scoring path fully replayable in
DuckDB (Spark's ML HashingTF murmur3 variant has no DuckDB twin; md5
does). This script is the provenance of those literals: a
deterministic full-batch gradient-descent logistic regression over the
same features, run once at dev time on sf0.001, coefficients rounded
to 6 dp and pasted into the query module.

Run:  python scripts/fit_frozen_classifier.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np

NUM_BUCKETS = 64
POS_SOURCES = {"src0", "src1", "src2", "src3"}
LR = 0.5
ITERS = 500
L2 = 1e-3


def bucket(tok: str) -> int:
    # same device as functions/importance.py:hashed_gram_buckets and the
    # DuckDB oracle: first 8 hex chars of md5, base-16, mod NUM_BUCKETS
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % NUM_BUCKETS


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT doc_id, source, coalesce(text,'') AS text "
        f"FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    X = np.zeros((len(rows), NUM_BUCKETS))
    y = np.zeros(len(rows))
    for i, (_, source, text) in enumerate(rows):
        y[i] = 1.0 if source in POS_SOURCES else 0.0
        # split(" "), not split(): single-space tokenization is the
        # engine-wide contract the scoring path and oracle share
        for tok in text.lower().split(" "):
            if tok:
                X[i, bucket(tok)] += 1.0
    w = np.zeros(NUM_BUCKETS)
    b = 0.0
    n = len(rows)
    for _ in range(ITERS):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * ((X.T @ g) / n + L2 * w)
        b -= LR * g.mean()
    p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    acc = ((p > 0.5) == (y > 0.5)).mean()
    print(f"# n={n} acc={acc:.4f} pos_rate={y.mean():.4f}")
    print(f"FROZEN_QC_INTERCEPT = {round(float(b), 6)!r}")
    print("FROZEN_QC_WEIGHTS = [")
    vals = [round(float(v), 6) for v in w]
    for i in range(0, NUM_BUCKETS, 6):
        print("    " + ", ".join(repr(v) for v in vals[i : i + 6]) + ",")
    print("]")


if __name__ == "__main__":
    main()
