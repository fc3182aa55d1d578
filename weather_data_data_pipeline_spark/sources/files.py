"""File-format connectors beyond parquet: CSV and JSON-lines.

The reference ingests JSON documents (the OpenWeatherMap payload,
full:8-12) and persists to JDBC; a general engine also needs flat-file
interchange. Design rules, same as the parquet path:

- **Explicit schema on read, always.** Schema inference is a full extra
  pass over the data (and for JSON a driver-side merge of per-partition
  schemas) — at 100 TB that is a second scan before the first real job.
  Readers here take a DDL string or StructType and refuse to infer.
- **Malformed rows are visible, not silent.** ``PERMISSIVE`` mode with a
  ``_corrupt_record`` column on request, or ``FAILFAST`` for pipelines
  that must halt on bad input; never silently ``DROPMALFORMED``.
- Writes go through the normal partitioned-directory layout (one file
  per task), so source parallelism is preserved end-to-end.

CSV cannot carry nested types (arrays/structs/maps) — use JSONL or
parquet for those; the writer raises early instead of letting Spark
emit a cryptic analysis error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, MapType, StructType

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _schema_arg(schema: str | StructType) -> str | StructType:
    if not isinstance(schema, (str, StructType)):
        raise TypeError("schema must be a DDL string or StructType")
    return schema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    header: bool = True,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """CSV scan with a declared schema (no inference pass). Filters and
    projections still prune at the scan (CSV supports column pruning;
    predicate pushdown is parse-then-filter, so prefer parquet for
    hot tables)."""
    reader = (
        spark.read.format("csv")
        .schema(_schema_arg(schema))
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("timestampFormat", _TS_FMT)
    )
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.load(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if nested:
        raise ValueError(
            f"CSV cannot encode nested columns {nested}; use write_jsonl/parquet"
        )
    (
        df.write.format("csv")
        .option("header", str(header).lower())
        .option("timestampFormat", _TS_FMT)
        .mode(mode)
        .save(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON-lines scan with a declared schema — the file-resident twin of
    the ``from_json`` ingestion path (SURVEY §2.1 S1/S2). Nested
    arrays/structs round-trip; at scale JSONL is the landing format and
    parquet the compacted one."""
    reader = (
        spark.read.format("json")
        .schema(_schema_arg(schema))
        .option("mode", mode)
        .option("timestampFormat", _TS_FMT)
    )
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.load(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.format("json").option("timestampFormat", _TS_FMT).mode(mode).save(path)


def read_orc(spark: SparkSession, path: str, schema: str | StructType | None = None) -> DataFrame:
    """ORC scan. Schema optional: ORC is self-describing like parquet
    (footer metadata, no inference pass), so omitting it costs nothing;
    pass one to pin reader expectations. Predicate pushdown and column
    pruning work as with parquet."""
    reader = spark.read.format("orc")
    if schema is not None:
        reader = reader.schema(_schema_arg(schema))
    return reader.load(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.format("orc").mode(mode).save(path)


# Numeric widening lattice for schema-drift unions: a column that is int
# in one landing batch and long/double in another unifies to the widest
# type instead of failing the union. Integer×floating mixes ALWAYS
# promote to double — float32's 24-bit mantissa silently corrupts any
# integer above 2^24 (and bigint∪float under Spark's native union
# precedence lands on float, exactly the corruption this helper exists
# to prevent), while double holds every int up to 2^53 exactly and is
# the ceiling of the lattice anyway.
_INT_RANK = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}
_FLOAT_RANK = {"float": 0, "double": 1}
_WIDENING = {**_INT_RANK, **{k: v + 4 for k, v in _FLOAT_RANK.items()}}


def _widen(a: str, b: str) -> str:
    """Widest lossless-enough common type of two numeric type names."""
    if a in _INT_RANK and b in _INT_RANK:
        return max(a, b, key=_INT_RANK.__getitem__)
    if a in _FLOAT_RANK and b in _FLOAT_RANK:
        return max(a, b, key=_FLOAT_RANK.__getitem__)
    return "double"  # mixed integer × floating: only double is safe


def union_evolve(dfs: list[DataFrame]) -> DataFrame:
    """Union DataFrames whose schemas have DRIFTED — the ingestion-side
    schema-evolution primitive (landing batches gain/lose columns and
    widen numeric types over a pipeline's lifetime):

    - columns missing from a batch are null-filled
      (``unionByName(allowMissingColumns=True)``)
    - numeric columns widen to the widest type observed across batches:
      within a family the usual lattice (int→bigint, float→double), and
      any integer×floating mix goes straight to double (never float —
      see :func:`_widen`); non-numeric type conflicts raise — silent
      string/number coercion hides corruption
    - output column order follows first appearance across the batches

    Pure plan surgery: casts + one union, no data pass beyond what the
    union itself costs; at scale this is the view you put OVER a
    directory of heterogeneous landing files.
    """
    if not dfs:
        raise ValueError("union_evolve: no inputs")
    # resolve target type per column, first-appearance order
    target: dict[str, str] = {}
    for df in dfs:
        for name, dtype in df.dtypes:
            prev = target.get(name)
            if prev is None:
                target[name] = dtype
            elif prev != dtype:
                if prev in _WIDENING and dtype in _WIDENING:
                    target[name] = _widen(prev, dtype)
                else:
                    raise TypeError(
                        f"union_evolve: column {name!r} has incompatible "
                        f"types {prev!r} vs {dtype!r} (only numeric "
                        "widening is automatic)"
                    )
    from pyspark.sql import functions as F

    out = None
    for df in dfs:
        have = dict(df.dtypes)
        cols = [
            (F.col(n).cast(t) if have[n] != t else F.col(n)).alias(n)
            for n, t in target.items()
            if n in have
        ]
        aligned = df.select(*cols)
        out = aligned if out is None else out.unionByName(
            aligned, allowMissingColumns=True
        )
    return out.select(*target)
