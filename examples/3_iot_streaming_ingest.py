"""High-frequency IoT ingestion — the Spark-native take on the
reference's MQTT datastore example (reference
examples/3_iot_datastore_with_mqtt.py).

The reference consumes MQTT messages onto a queue and inserts from a
writer thread. The Spark-shaped equivalent is Structured Streaming:
a file/kafka source → canonical Point schema → ``foreachBatch`` into
the same partitioned parquet store the batch API uses, one durable
``_seq`` range per micro-batch. Here the source is a directory of
parquet files (swap ``fmt="kafka"`` in production — the downstream
pipeline is identical); a running EWMA with per-key state rides on the
same stream.

Run: python examples/3_iot_streaming_ingest.py
"""

import os
import sys
import tempfile
from datetime import datetime, timedelta, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tinyflux_spark import FieldQuery, TinyFluxSpark
from tinyflux_spark.schema import get_spark
from tinyflux_spark.streaming import ingest as st

T0 = datetime(2024, 3, 1, tzinfo=timezone.utc)
READING = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("device", T.StringType()),
        T.StructField("temp", T.DoubleType()),
    ]
)


def main() -> None:
    spark = get_spark("example3")
    root = tempfile.mkdtemp(prefix="tfs_example3_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)

    # Simulate two sensor dumps arriving in the landing zone.
    for batch in range(2):
        rows = [
            (
                T0 + timedelta(seconds=30 * (batch * 20 + i)),
                f"sensor-{i % 3}",
                18.0 + (batch * 20 + i) * 0.1,
            )
            for i in range(20)
        ]
        spark.createDataFrame(rows, READING).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    # Stream the landing zone into a TinyFluxSpark store.
    db = TinyFluxSpark(os.path.join(root, "db"))
    stream = st.point_stream_from_files(spark, landing, READING)
    points = stream.select(
        "time",
        F.lit("reading").alias("measurement"),
        F.create_map(F.lit("device"), F.col("device")).alias("tags"),
        F.create_map(F.lit("temp"), F.col("temp")).alias("fields"),
    )
    q = st.stream_insert(
        db.storage, points,
        checkpoint_dir=os.path.join(root, "ckpt"),
    )
    q.awaitTermination(120)

    print("ingested points:", len(db))
    print("hot readings:", db.count(FieldQuery().temp > 21))

    # Stateful per-device running EWMA over the same stream.
    ewma = st.stateful_ewma(
        stream.selectExpr("device", "time", "temp"),
        key_col="device", time_col="time", value_col="temp", alpha=0.5,
    )
    st.run_to_memory(ewma, "ewma_out", output_mode="append",
                     shuffle_partitions=4)
    spark.table("ewma_out").orderBy("device", "time").show(6)
    db.close()


if __name__ == "__main__":
    main()
