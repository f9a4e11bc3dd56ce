"""Focused 1x/10x re-probe of the queries whose plans changed in the
r12 OPTIMIZATION round (shared tokenize, semantic pair-scan pin,
interval/window widening), to show the local-mode wins do not regress
the scaling laws. Fresh plan per timed run (scale_probe's convention).

Usage: python tools/reprobe_r12opt.py out.json 1=<dir> 10=<dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

QUERIES = [
    "q84_interval_join",
    "q88_merge_intervals",
    "q22_lang_id",
    "q91_bigram_logprob",
    "q94_trigram_logprob",
    "q98_kneser_ney",
    "q103_fivegram_logprob",
    "q95_semantic_dedup",
    "q99_text_semantic_dedup",
]


def main() -> None:
    out_path = sys.argv[1]
    dirs = dict(a.split("=", 1) for a in sys.argv[2:])

    import inspect

    import scale_probe
    from tinyflux_spark.schema import get_spark

    spark = get_spark("reprobe_r12opt")
    res: dict = {"dirs": dirs, "queries": {}}
    for name in QUERIES:
        fn = scale_probe.probe_fn(name)
        takes_factor = "_factor" in inspect.signature(fn).parameters
        row = {}
        for fac, d in sorted(dirs.items(), key=lambda kv: int(kv[0])):
            args = (spark, d)
            kw = {"_factor": int(fac)} if takes_factor else {}
            fn(*args, **kw).write.format("noop").mode("overwrite").save()
            t = time.time()
            df = fn(*args, **kw)  # fresh plan
            df.write.format("noop").mode("overwrite").save()
            row[fac] = round(time.time() - t, 3)
        res["queries"][name] = row
        print(name, row, flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
