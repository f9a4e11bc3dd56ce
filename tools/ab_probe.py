"""Quiet-machine A/B probe — the Q89 protocol as a reusable tool.

A per-round scale or bench reading that moved with NO code change is
either machine noise or a real plan regression; this probe decides
which with receipts (the protocol the r9 q89 A/B and the r10
judge-side ingest falsification both used):

1. record the load average and the two fixed-work calibration probes
   (pure-Python loop, single-task Spark action floor) BEFORE;
2. run the query N times (fresh plan per run, noop sink — bench.py's
   EAGER convention so build-time materialization is inside the
   window when the query is a builder);
3. record the floor AFTER (a floor that moved during the window
   flags contention mid-probe);
4. write ONE JSON document with the runs, median, and both floors.

Usage:
    python tools/ab_probe.py <out.json> <qname> <sf_dir> [runs]
        [--reference SEC] [--note TEXT]

``qname`` is a registered __spark_entry__ query name, or one of the
scale_probe.py overrides (resolved through its probe_fn, so q131's
fixed-sample form and the autoK panel arms are probeable too).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {}
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--reference":
            opts["reference_s"] = float(argv[i + 1])
            args.remove(argv[i + 1])
        elif a == "--note":
            opts["note"] = argv[i + 1]
            args.remove(argv[i + 1])
    out_path, qname, sf_dir = args[0], args[1], args[2]
    runs = int(args[3]) if len(args) > 3 else 5

    load = os.getloadavg()[0]

    from tinyflux_spark.schema import get_spark

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
    )
    import scale_probe  # noqa: E402  (sibling tool: probe_fn overrides)

    import bench  # noqa: E402

    spark = get_spark("ab_probe")
    fn = scale_probe.probe_fn(qname)
    # Some scale overrides take a corpus multiplier; probe at 1x.
    import inspect

    if "_factor" in inspect.signature(fn).parameters:
        import functools

        fn = functools.partial(fn, _factor=1)

    def one_run() -> float:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    floor_before = bench._calibration(spark)
    one_run()  # warm (JIT, catalogs, any per-session index caches)
    times = sorted(round(one_run(), 3) for _ in range(runs))
    floor_after = bench._calibration(spark)
    med = times[len(times) // 2]
    doc = {
        "what": f"A/B probe of {qname} at {sf_dir}",
        "machine": f"load average {load:.2f} at start",
        "method": (
            "Q89 protocol: floor before/after, 1 warm + "
            f"{runs} timed runs, fresh plan per run, noop sink"
        ),
        "floor_before_ms": floor_before["spark_action_floor_ms"],
        "floor_after_ms": floor_after["spark_action_floor_ms"],
        "python_loop_ms": floor_before["python_loop_ms"],
        "runs_s": times,
        "median_s": med,
        **opts,
    }
    if "reference_s" in opts:
        doc["ratio_vs_reference"] = round(med / opts["reference_s"], 3)
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in
                      ("median_s", "floor_before_ms", "floor_after_ms")}))


if __name__ == "__main__":
    main()
