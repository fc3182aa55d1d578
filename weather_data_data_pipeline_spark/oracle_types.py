"""Typed schema comparison between a Spark result and a DuckDB oracle.

The correctness driver hashes TYPED values: DuckDB returning
``decimal128(38,0)`` (its ``sum(BIGINT)`` widens to HUGEINT) where Spark
returns ``long`` fails the hash even when every number is equal — that is
exactly how round 3's one red row (`audio_dedup_fingerprint`) shipped, and
``fetchall()``-based comparison can't see it because Python flattens both
to ``int``. These helpers canonicalize an Arrow schema (fetch the oracle
via ``.arrow()``) and a Spark schema to the granularity the driver's hash
distinguishes: integer/float WIDTHS collapse (both engines surface them as
Python int/float), but decimal-vs-integer, the families, and nested
element types do not.
"""

from __future__ import annotations

from pyspark.sql import types as T


def canon_arrow(dt) -> str:
    """Canonical type string for an Arrow type."""
    import pyarrow.types as pt

    if pt.is_boolean(dt):
        return "bool"
    if pt.is_integer(dt):
        return "int"
    if pt.is_floating(dt):
        return "float"
    if pt.is_decimal(dt):
        return f"decimal({dt.precision},{dt.scale})"
    if pt.is_string(dt) or pt.is_large_string(dt):
        return "string"
    if pt.is_binary(dt) or pt.is_large_binary(dt):
        return "binary"
    if pt.is_date(dt):
        return "date"
    if pt.is_timestamp(dt):
        return "timestamp"
    if pt.is_list(dt) or pt.is_large_list(dt) or pt.is_fixed_size_list(dt):
        return f"list<{canon_arrow(dt.value_type)}>"
    if pt.is_struct(dt):
        inner = ",".join(f"{f.name}:{canon_arrow(f.type)}" for f in dt)
        return f"struct<{inner}>"
    if pt.is_map(dt):
        return f"map<{canon_arrow(dt.key_type)},{canon_arrow(dt.item_type)}>"
    if pt.is_null(dt):
        return "null"
    return str(dt)


def canon_spark(dt) -> str:
    """Same canonical strings for a Spark SQL type."""
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark(dt.elementType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{canon_spark(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.MapType):
        return f"map<{canon_spark(dt.keyType)},{canon_spark(dt.valueType)}>"
    if isinstance(dt, T.NullType):
        return "null"
    return dt.simpleString()


def decimal_surfaced_cols(schema) -> list[str]:
    """Top-level columns of a Spark result schema that contain a
    DecimalType anywhere (directly or nested in array/map/struct).

    The r9 surface-type rule (VERDICT r8 ask #2): DECIMAL is an
    INTERNAL exactness device only — every registered query surfaces
    double/int/string/bool. Evidence: across the r7-r8 driver gates,
    14 of 15 decimal-surfaced rows were hash-red while 0 of 35
    double-surfaced rows were, with every red bit-exact under the
    local bit-strict mirror at two SFs — the driver's hasher (or its
    DuckDB build's decimal typing) diverges on decimal surfaces. A
    small-mantissa (< 2^53) decimal→double cast is measured
    bit-identical between Spark and DuckDB, so the exactness contract
    survives: pin → round in the decimal domain → cast DOUBLE last."""

    def has_dec(dt) -> bool:
        if isinstance(dt, T.DecimalType):
            return True
        if isinstance(dt, T.ArrayType):
            return has_dec(dt.elementType)
        if isinstance(dt, T.MapType):
            return has_dec(dt.keyType) or has_dec(dt.valueType)
        if isinstance(dt, T.StructType):
            return any(has_dec(f.dataType) for f in dt.fields)
        return False

    return [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in schema.fields
        if has_dec(f.dataType)
    ]


def type_mismatches(spark_schema, arrow_schema, cols=None) -> list[str]:
    """Per-column canonical-type diffs between a Spark schema and the
    oracle's Arrow schema. 'null' on the oracle side (a column of pure
    NULLs at a tiny SF) matches anything."""
    s_types = {f.name: canon_spark(f.dataType) for f in spark_schema.fields}
    a_types = {
        name: canon_arrow(arrow_schema.field(name).type)
        for name in arrow_schema.names
    }
    out = []
    for c in cols if cols is not None else sorted(s_types):
        s, a = s_types.get(c), a_types.get(c)
        if a == "null" or a is None or s is None:
            continue
        if s != a:
            out.append(f"{c}: spark={s} oracle={a}")
    return out
