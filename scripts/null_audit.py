#!/usr/bin/env python
"""NULL/pathological-text audit: the full driver-gate mirror over a
corpus that actually contains the values a 100 TB crawl is guaranteed
to contain — NULL text, empty text, and a single-token document.

The bench corpora carry none of those, so the per-round mirror can
never see the divergence class ADVICE r13 #1 flagged (Spark's
``legacy.sizeOfNull`` -1 vs the oracle's NULL, pandas float64 coercion
poisoning int batches, unguarded sequence()/slice() throws). This
script generalizes that finding into a sweep: copy sf0.001, append
three pathological documents, and run EVERY registered query against
its own oracle on the injected corpus via scripts/driver_mirror.py.

First run (r14) found and fixed 9 latent divergences, including a
Pandas-UDF batch-poisoning bug where one NULL document corrupted every
fingerprint in its Arrow batch (float64 coercion, ulp 256 at 2^60).
Wave 2 (r14) extended the corpus with a zero-norm and a NULL embedding
vector (15 more fixes). Wave 3 (r15, VERDICT r14 ask #4) routes the
SAME pathological documents through the multimodal codec paths: the
four codec-backed queries derive payload validity from the document
text state (NULL text → NULL content, empty text → truncated/torn
container bytes), so corrupt payloads flow through the REAL
decode/demux/hash pipelines, which must degrade per-row (NULL feature,
partial demux, skipped signature) with the oracles mirroring the
degrade semantics.

Usage:
    python scripts/null_audit.py            # build dir + full mirror
    python scripts/null_audit.py q1 q2 ...  # targeted
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

SRC = "/root/testdata/sf0.001"
DST = "/tmp/sf0.001_nulls"


def build_injected_dir() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f not in (
            "documents.parquet",
            "embeddings.parquet",
        ):
            shutil.copy(os.path.join(SRC, f), os.path.join(DST, f))
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    mx = max(t.column("doc_id").to_pylist())
    extra = pa.table(
        {
            "doc_id": pa.array([mx + 1, mx + 2, mx + 3], pa.int64()),
            "text": pa.array([None, "", "solo"], pa.string()),
            "lang": pa.array(["en", "de", "fr"], pa.string()),
            "source": pa.array(["src1", "src2", "src3"], pa.string()),
            "n_chars": pa.array([0, 0, 4], pa.int64()),
        }
    )
    merged = pa.concat_tables([t.select(extra.column_names), extra])
    pq.write_table(merged, os.path.join(DST, "documents.parquet"))
    print(f"built {DST}: {merged.num_rows} documents (3 pathological)")
    # embeddings: a zero vector (cosine undefined — DuckDB x/0.0 is
    # NULL, Spark ANSI throws) and a NULL vector (ragged Arrow batch —
    # crashes any unguarded np.stack kernel). Injected at MAX ids so
    # the seeded queries' lowest-id codebooks/centroids are unchanged.
    e = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    emx = max(e.column("vec_id").to_pylist())
    dim = len(e.column("embedding").to_pylist()[0])
    e_extra = pa.table(
        {
            "vec_id": pa.array([emx + 1, emx + 2], pa.int64()),
            "embedding": pa.array(
                [[0.0] * dim, None], pa.list_(pa.float32())
            ),
            "label": pa.array([0, 1], pa.int32()),
        }
    )
    e_merged = pa.concat_tables([e.select(e_extra.column_names), e_extra])
    pq.write_table(e_merged, os.path.join(DST, "embeddings.parquet"))
    print(f"built {DST}: {e_merged.num_rows} embeddings (2 pathological)")


def main() -> int:
    build_injected_dir()
    here = os.path.dirname(os.path.abspath(__file__))
    return subprocess.call(
        [sys.executable, os.path.join(here, "driver_mirror.py"), DST]
        + sys.argv[1:]
    )


if __name__ == "__main__":
    sys.exit(main())
