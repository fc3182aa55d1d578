"""Bloom-filter runtime join pruning — the semi-join filter pattern for
joins whose build side is too large to broadcast as a hash SET but whose
BLOOM FILTER fits in a few KB.

At 100 TB this is the difference between shuffling the full probe side
into a join and shuffling only the ~|build ∩ probe| + ε fraction that
survives the filter: the classic runtime-filter optimization Spark
applies internally for some shapes (spark.sql.optimizer.runtimeFilter.*)
but does not expose as an operator. Implemented here with public
primitives only:

- build: one pass over the build side's keys — k = xxhash64(key),
  double hashing (Kirsch–Mitzenmacher: bit_i = h1 + i·h2) sets
  ``num_hashes`` bits; bits aggregate to 64-bit words via BIT_OR with a
  map-side partial, so the shuffle carries at most num_bits/64 rows.
  The finished filter is num_bits/64 longs — 16 KB at 2^17 bits —
  collected once and closure-shipped (bounded, driver-safe).
- probe: a pure Column expression over the word array literal
  (element_at + shiftright + bit and), fully inside whole-stage codegen;
  no UDF, no Python.

No false negatives (every build key passes), so following the filter
with the EXACT join preserves exact semantics — false positives only
cost wasted probe rows, tunable via num_bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 17  # 16 KB of filter
DEFAULT_NUM_HASHES = 5


def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """Kirsch–Mitzenmacher double hashing: positions h1 + i·h2 (mod m).
    ``num_bits`` must be a power of two so the mod is a bit mask. The
    hashes are masked to 31 bits first so the combination cannot
    overflow a long under ANSI arithmetic (Spark 4 default)."""
    assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of 2"
    h1 = F.xxhash64(key).bitwiseAND(F.lit(0x7FFFFFFF))
    h2 = F.xxhash64(key, F.lit(0x5BD1)).bitwiseAND(F.lit(0x7FFFFFFF))
    return [
        (h1 + F.lit(i) * h2).bitwiseAND(F.lit(num_bits - 1))
        for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> list[int]:
    """One distributed pass over the build side → the filter's word array
    (num_bits/64 longs). The aggregate is partial+final BIT_OR keyed by
    word index, so executors combine locally and the driver receives at
    most num_bits/64 rows (16 KB at the default size)."""
    bits = df.select(
        F.explode(
            F.array(*_bit_positions(F.col(key_col), num_bits, num_hashes))
        ).alias("pos")
    )
    # dynamic shift amount needs call_function — the F.shiftleft wrapper
    # only takes a Python int
    one_shl = F.call_function(
        "shiftleft",
        F.lit(1).cast("long"),
        F.col("pos").bitwiseAND(F.lit(63)).cast("int"),
    )
    words = (
        bits.select(F.shiftright("pos", 6).alias("w"), one_shl.alias("bit"))
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    arr = [0] * (num_bits // 64)
    for r in words.collect():
        arr[r["w"]] = r["word"]
    return arr


def might_contain(
    words: list[int],
    key: Column,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Membership test as a codegen'd Column expression over the word
    array shipped as a literal. True for every inserted key; true with
    probability ≈ (1 - e^(-kn/m))^k for foreign keys.

    The word array ships as ONE ``from_json('<json>', 'array<bigint>')``
    literal: both ``F.array(*lits)`` and ``F.lit(list)`` cross py4j once
    per element — measured 1.25 s of pure DRIVER time per plan build at
    the default 2048 words (the whole "bloom query is 11× the oracle"
    bench mystery). The r4–r14 form parsed ONE ``F.expr("array(..L)")``
    string instead, but that still hands Catalyst a CreateArray node
    with num_bits/64 CHILD expressions — and the probe references the
    array once per hash, so every analyzer/optimizer traversal walked
    3 × 8192 children until constant folding collapsed them (measured
    r15: 0.13 s plan-build + 0.09 s exec per probe site at 8192 words
    vs 0.04 s + 0.06 s for this form). ``from_json`` keeps the words as
    a single string-literal child — 2 nodes per reference — and
    ConstantFolding evaluates it to the same array Literal before
    codegen, so the per-row probe reads a folded constant either way,
    now without the tree-walk tax."""
    lit_words = F.from_json(
        F.lit("[" + ",".join(str(int(w)) for w in words) + "]"),
        "array<bigint>",
    )
    checks = []
    for pos in _bit_positions(key, num_bits, num_hashes):
        word = F.element_at(
            lit_words, (F.call_function("shiftright", pos, F.lit(6)) + 1).cast("int")
        )
        bit = F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            pos.bitwiseAND(F.lit(63)).cast("int"),
        )
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_prune(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Filter ``probe`` down to rows whose key MIGHT be in ``build`` —
    the runtime pre-filter to place before an exact join/shuffle. The
    exact join after it gives exactly the unfiltered join's result (no
    false negatives); the filter just keeps non-matching probe rows out
    of the shuffle."""
    words = build_bloom(build, build_key, num_bits, num_hashes)
    return probe.where(
        might_contain(words, F.col(probe_key), num_bits, num_hashes)
    )
