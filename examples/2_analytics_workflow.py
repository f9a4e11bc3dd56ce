"""Analytics workflow — the Spark-native take on the reference's
analytics notebook (reference examples/2_analytics_workflow.ipynb),
extended with the operators the reference can't express in-process:
window aggregation, top-k, sessionization, as-of enrichment, EWMA.

Uses the driver-generated events table so the numbers are repeatable.

Run: python examples/2_analytics_workflow.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tinyflux_spark.operators import aggregates
from tinyflux_spark.schema import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("example2")
    # Handle both testdata ts vintages: TIMESTAMP(NANOS) decodes as
    # long under nanosAsLong (truncate to micros); TIMESTAMP_NTZ
    # micros casts directly (session tz pinned UTC by get_spark).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))

    # Hourly rollup per event type (tumbling window).
    hourly = aggregates.time_bucket(
        ev, "ts", "1 hour",
        [F.count("*").alias("n"), F.avg("value").alias("avg_value")],
        group_cols=["event_type"],
    )
    print("-- hourly rollup (first 5)")
    hourly.orderBy("bucket_start", "event_type").show(5, truncate=False)

    # Top-3 users by event volume within each event type.
    topk = aggregates.top_k(
        ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n")),
        partition_cols=["event_type"],
        order_by=[F.col("n").desc(), F.col("user_id")], k=3,
    )
    print("-- top-3 users per type")
    topk.show(9)

    # Sessionize user activity with a 30-minute inactivity gap.
    sessions = aggregates.session_stats(
        ev.select(F.col("user_id").cast("string").alias("user_id"), "ts"),
        "user_id", "ts", gap_seconds=1800.0,
    )
    print("-- session stats (first 5)")
    sessions.orderBy("user_id", "session_id").show(5)

    # Per-user running EWMA of the value series.
    ewma = aggregates.ewma_running(
        ev.select(F.col("user_id").cast("string").alias("user_id"),
                  "ts", "value"),
        "user_id", "ts", "value", alpha=0.3,
    )
    print("-- running EWMA (one user)")
    first_user = ewma.select("user_id").limit(1).collect()[0][0]
    ewma.where(F.col("user_id") == first_user).orderBy("ts").show(5)


if __name__ == "__main__":
    main()
