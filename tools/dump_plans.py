"""Dump .explain("formatted") for registered queries to a directory.

Usage: python tools/dump_plans.py <out_dir> [sf_dir] [only_query ...]

One file per query: <out_dir>/<qname>.txt. Queries whose fn() performs
eager build work (stores, indexes) still run that work — the dump is
the plan of the DataFrame the bench times. A failure on one query is
recorded in its file and the sweep continues.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from tinyflux_spark.schema import get_spark

    spark = get_spark("dump_plans")
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — record and continue
            plan = f"ERROR building plan: {type(e).__name__}: {e}"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
