"""Time-series regularization + SQL over the store.

The reference's analytics examples regularize irregular sensor data with
driver-side Python loops (reference examples/2_analytics_workflow.ipynb);
this engine does it as distributed operators, and adds the ANSI-SQL
surface the reference has no analog for.

Shows: resample -> gap_fill (LOCF and linear), derivative rates,
rolling z-score anomaly flags, exact percentile profiling, db.sql().

Run: python examples/6_timeseries_and_sql.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tinyflux_spark.operators.aggregates import percentile_summary
from tinyflux_spark.operators.timeseries import (
    derivative,
    gap_fill,
    resample,
    rolling_zscore,
)
from tinyflux_spark.schema import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("example6")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    ev = entry.load_events(spark, SF_DIR)

    # 1. Regularize: 15-minute average per event type, gaps linearly
    #    interpolated across each key's own span.
    r = resample(ev, "ts", "event_type", "value", interval_sec=900)
    dense = gap_fill(r, interval_sec=900, fill="linear")
    print("dense grid:")
    dense.orderBy("key", "bucket_s").show(5)
    n_gap = dense.where(F.col("is_gap")).count()
    print(f"{n_gap} gap buckets filled by interpolation")

    # 2. Rates: per-user derivative with counter-reset semantics.
    rates = derivative(
        ev, "ts", "user_id", "value",
        per_seconds=3600, non_negative=True,
        order_cols=["ts", "event_id"],
    )
    print("hourly-scaled non-negative rates:")
    rates.where(F.col("rate").isNotNull()).select(
        "user_id", "ts", "value", "rate"
    ).show(5)

    # 2b. Forecast: per-user Holt level + trend; the one-step-ahead
    # prediction is what a metrics pipeline alerts against.
    from tinyflux_spark.operators.aggregates import holt_last

    fc = holt_last(ev, "user_id", "ts", "value", alpha=0.3, beta=0.1)
    print("per-user one-step forecasts:")
    fc.orderBy("user_id").show(5)

    # 3. Anomalies: each value vs its own trailing 20 observations.
    flags = rolling_zscore(
        ev, "ts", "user_id", "value",
        lookback=20, threshold=2.5, order_cols=["ts", "event_id"],
    ).where(F.col("is_anomaly"))
    print(f"{flags.count()} anomalous events (|z| > 2.5):")
    flags.select("user_id", "ts", "value", "zscore").show(5)

    # 4. Profile: exact per-type percentiles (PERCENTILE_CONT).
    print("value percentiles per event type:")
    percentile_summary(ev, "event_type", "value").orderBy(
        "event_type"
    ).show()

    # 5. SQL over a live store: build a small store, query it with
    #    plain SQL including a window function the query algebra
    #    doesn't express.
    import tempfile

    from tinyflux_spark import TinyFluxSpark

    with TinyFluxSpark(tempfile.mkdtemp(prefix="tfs_sql_")) as db:
        db.insert_dataframe(
            ev.limit(500).select(
                F.col("ts").alias("time"),
                F.col("event_type").alias("measurement"),
                F.create_map(
                    F.lit("user"), F.col("user_id").cast("string")
                ).alias("tags"),
                F.create_map(F.lit("value"), F.col("value")).alias("fields"),
            )
        )
        out = db.sql(
            """
            SELECT * FROM (
                SELECT measurement,
                       tags['user']                       AS user,
                       fields['value']                    AS value,
                       RANK() OVER (PARTITION BY measurement
                                    ORDER BY fields['value'] DESC) AS rnk
                FROM points
            ) WHERE rnk <= 2
            ORDER BY measurement, rnk
            """
        )
        print("top-2 values per measurement via db.sql():")
        out.show(10)

        # 6. Time travel: destructive ops create retained MVCC
        #    snapshots; read the pre-delete state back.
        v0 = db.versions()[-1]
        from tinyflux_spark import FieldQuery

        removed = db.remove(FieldQuery().value > 100)
        print(
            f"removed {removed} points; live={db.dataframe().count()} "
            f"rows, snapshot v{v0}="
            f"{db.dataframe(version=v0).count()} rows"
        )


if __name__ == "__main__":
    main()
