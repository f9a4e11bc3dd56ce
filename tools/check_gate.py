"""Local emulation of the driver's correctness gate.

Runs every __spark_entry__ query on Spark and its oracle on DuckDB at a
given SF, then compares row count, sorted column names, and
order-insensitive values EXACTLY (stricter than any reasonable
value-hash, so a pass here should be a pass there).

Usage: python tools/check_gate.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def nonscalar_columns(schema):
    """Names of array/map/struct-typed fields — outputs the driver's
    result canonicalizer cannot sort (the q35/q76 failure class)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.10g}"
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s.replace("+00:00", "")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_repr(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = sorted(
        tuple(norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from tinyflux_spark.schema import get_spark

    spark = get_spark("gate_check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf_spark = fn(spark, sf_dir)
            # Driver-canon strictness: the driver's canonicalizer does
            # pandas sort_values over object columns and crashes on
            # array/map/struct cells (q35 in r1, q76 in r4). Fail HERE
            # so entry authors hit the wall locally, not in the round
            # artifact.
            bad = nonscalar_columns(sdf_spark.schema)
            if bad:
                failures.append(name)
                print(
                    f"FAIL {name}: non-scalar output columns {bad} — the "
                    "driver canonicalizer cannot sort array/map/struct "
                    "cells; flatten in the gate entry (e.g. F.array_join)"
                )
                continue
            sdf = sdf_spark.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        scols, srows = frame_repr(sdf)
        ocols, orows = frame_repr(odf)
        if scols != ocols:
            failures.append(name)
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(
                f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}"
            )
            continue
        if srows != orows:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(srows, orows) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(srows)} rows differ")
            for a, b in list(zip(srows, orows))[:200]:
                if a != b:
                    print(f"  spark : {a}")
                    print(f"  oracle: {b}")
                    break
            continue
        print(f"OK   {name}: {len(srows)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
