"""Time named queries with EXACTLY bench.py's methodology.

bench.time_query builds the DataFrame once, runs the bench's warmup
count for that query (1 if HEAVY else WARMUPS), then takes the median
of 3 timed noop saves (rebuilding per run only for EAGER_PER_RUN
queries) — the committed-number protocol. ab_probe.py's fresh-plan-
per-run convention deliberately differs (it includes Python-side plan
build); use THIS tool when the number must be comparable to
BENCH_FULL.json per-query seconds.

Usage: python tools/bench_one.py <sf_dir> <qname> [qname ...]
Prints one JSON line {"sf_dir":..., "load_before":..., "queries":
{name: median_sec}, "runs": {name: [r1,r2,r3]}}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    load = os.getloadavg()[0]

    import bench  # noqa: E402
    import __spark_entry__ as entry_mod  # noqa: E402
    from tinyflux_spark.schema import get_spark  # noqa: E402

    spark = get_spark("bench_one")
    # bench.main's events-scan warmup (page cache + codegen).
    entry_mod.events_as_points(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    queries = entry_mod.queries()
    out: dict = {"sf_dir": sf_dir, "load_before": round(load, 2),
                 "queries": {}, "runs": {}}
    for name in names:
        sec = bench.time_query(name, queries[name], spark)
        out["queries"][name] = round(sec, 4)
        out["runs"][name] = bench.QUERY_RUNS[name]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
