"""Python UDTFs (Spark 4 user-defined table functions).

The engine's operators are built-in-function compositions wherever
possible (UDFs are the slow path); UDTFs cover the remaining shape —
one input row → many output rows with imperative per-row logic — while
staying callable from plain SQL (`... FROM tbl, LATERAL fn(col) t`),
which keeps the SQL-or-DataFrame parity contract intact.

``ChunkText`` is the demonstrator: context-window chunking as a table
function (the DataFrame-native twin is functions/text.py:
chunk_documents, built from explode over a sequence — prefer that in
hot paths; the UDTF exists for ad-hoc SQL use and as the template for
row-expanding logic with no builtin equivalent).

Scale note: a UDTF runs row-at-a-time in a Python worker — fine for
fan-out logic dominated by the expansion itself, wrong for tight
numeric loops (use Arrow-batched pandas UDFs there).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, chunk string, n_tokens int")
class ChunkText:
    """Whitespace-token context windows of ``size`` tokens with
    ``overlap`` tokens carried between consecutive chunks."""

    def eval(self, text: str | None, size: int = 64, overlap: int = 8):  # noqa: D102
        if not text or size <= 0:
            return
        step = max(size - max(overlap, 0), 1)
        toks = text.split()
        i = 0
        cid = 0
        while i < len(toks):
            window = toks[i : i + size]
            yield cid, " ".join(window), len(window)
            if i + size >= len(toks):
                break
            i += step
            cid += 1


def register_udtfs(spark) -> None:
    """Expose the UDTFs to SQL under stable names."""
    spark.udtf.register("chunk_text", ChunkText)
