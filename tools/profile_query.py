"""Per-stage profile of one registered query (or probe_fn override).

Runs the query once warm, once timed (fresh plan, noop sink), then dumps
per-stage metrics (wall, task time, shuffle read/write bytes, input bytes,
Python eval time if any) from the Spark UI REST API — the guide §7.1 loop
without a browser.

Usage: python tools/profile_query.py <qname> [sf_dir] [--rebuild]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    qname = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    rebuild = "--rebuild" in sys.argv

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from pyspark.sql import SparkSession

    from tinyflux_spark.schema import _DEFAULT_CPUS

    spark = (
        SparkSession.builder.master(f"local[{_DEFAULT_CPUS}]")
        .appName("profile_query")
        .config("spark.sql.shuffle.partitions", _DEFAULT_CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
    )
    import functools
    import inspect

    import scale_probe

    fn = scale_probe.probe_fn(qname)
    # scale_probe overrides take a _factor arg (ab_probe's fix, shared)
    if "_factor" in inspect.signature(fn).parameters:
        fn = functools.partial(fn, _factor=1)

    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    jobs_before = {j["jobId"] for j in rest("/jobs")}

    spark.sparkContext.setJobDescription(f"profile:{qname}")
    t0 = time.perf_counter()
    (fn(spark, sf_dir) if rebuild else df).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)

    jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
    print(f"\n=== {qname}: timed run {wall:.3f}s, {len(jobs)} jobs ===")
    stage_rows = []
    for j in sorted(jobs, key=lambda x: x["jobId"]):
        sub = j.get("submissionTime", "")
        comp = j.get("completionTime", "")
        print(
            f"job {j['jobId']}: {j.get('numTasks')} tasks  "
            f"[{sub[11:23]} -> {comp[11:23]}]  {j.get('description','')[:60]}"
        )
        for sid in j.get("stageIds", []):
            try:
                for att in rest(f"/stages/{sid}"):
                    stage_rows.append(att)
            except Exception:
                pass
    seen = set()
    print(
        f"\n{'stage':>6} {'tasks':>5} {'wall_ms':>8} {'taskTime_ms':>11} "
        f"{'input_MB':>9} {'shufR_MB':>9} {'shufW_MB':>9}  name"
    )
    total_task = 0
    for s in sorted(stage_rows, key=lambda x: x["stageId"]):
        key = (s["stageId"], s["attemptId"])
        if key in seen or s["status"] not in ("COMPLETE", "FAILED"):
            continue
        seen.add(key)
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        comp = s.get("completionTime")
        wall_ms = ""
        if sub and comp:
            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                t1 = time.mktime(time.strptime(sub[:23], "%Y-%m-%dT%H:%M:%S.%f"))
                t2 = time.mktime(time.strptime(comp[:23], "%Y-%m-%dT%H:%M:%S.%f"))
                wall_ms = f"{(t2 - t1) * 1000:.0f}"
            except Exception:
                wall_ms = "?"
        total_task += s.get("executorRunTime", 0)
        print(
            f"{s['stageId']:>6} {s['numCompleteTasks']:>5} {wall_ms:>8} "
            f"{s.get('executorRunTime', 0):>11} "
            f"{s.get('inputBytes', 0)/1e6:>9.1f} "
            f"{s.get('shuffleReadBytes', 0)/1e6:>9.1f} "
            f"{s.get('shuffleWriteBytes', 0)/1e6:>9.1f}  "
            f"{s.get('name', '')[:70]}"
        )
    print(f"\ntotal executor task time: {total_task} ms "
          f"({total_task/1000/float(os.environ.get('SPARK_GRAFT_CPUS', 32)):.3f}s/core at full width)")


if __name__ == "__main__":
    main()
