"""List registered queries whose RESULT schema surfaces a DecimalType.

Round-9 instrument for VERDICT r8 asks #1/#2: the driver gate hash-fails
decimal-surfaced columns (14/15 decimal-surfaced rows red across r7-r8 vs
0/35 double-surfaced), so the surface-type rule is now: decimal internally,
DOUBLE (or int/string) on the surface. This scans plan-build schemas only —
no execution.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import types as T

from weather_data_data_pipeline_spark import registry
from weather_data_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def decimal_cols(schema: T.StructType) -> list[str]:
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


def main() -> None:
    spark = get_spark()
    oracles = registry.oracle_sql()
    out: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in registry.queries().items():
        try:
            cols = decimal_cols(fn(spark, SF_DIR).schema)
        except Exception as e:  # noqa: BLE001
            errs[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        if cols:
            out[name] = cols
    print(
        json.dumps(
            {
                "decimal_surfaced": out,
                "oracle_bearing": {
                    k: v for k, v in out.items() if k in oracles
                },
                "build_errors": errs,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
