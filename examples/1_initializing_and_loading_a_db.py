"""Initializing a store and loading data — the Spark-native take on the
reference's first notebook (reference
examples/1_initializing_and_loading_new_db.ipynb).

Two ingestion paths:

* Point path — driver-side ``Point`` objects through ``insert`` /
  ``insert_multiple`` (API parity; right for trickles and tools).
* DataFrame path — ``insert_dataframe`` ingests any Spark DataFrame in
  the canonical schema without rows ever touching the driver (the bulk
  path; at scale this is a parquet/Kafka/JDBC read).

Run: python examples/1_initializing_and_loading_a_db.py
"""

import os
import sys
import tempfile
from datetime import datetime, timedelta, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tinyflux_spark import FieldQuery, Point, TagQuery, TinyFluxSpark

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def main() -> None:
    path = os.path.join(tempfile.mkdtemp(prefix="tfs_example1_"), "db")

    # index_tags: the 'room' tag becomes a pushdown-eligible scalar
    # column — point lookups skip row groups instead of scanning.
    db = TinyFluxSpark(path, index_tags=["room"])

    # -- point path ----------------------------------------------------
    db.insert(
        Point(
            time=T0,
            measurement="thermostat",
            tags={"room": "kitchen"},
            fields={"temp": 20.5},
        )
    )
    db.insert_multiple(
        Point(
            time=T0 + timedelta(minutes=10 * i),
            measurement="thermostat",
            tags={"room": "kitchen" if i % 2 else "bedroom"},
            fields={"temp": 19.0 + i * 0.25},
        )
        for i in range(1, 12)
    )

    # -- DataFrame path (the bulk lane) --------------------------------
    spark = db.spark
    bulk = spark.range(0, 1000).select(
        (F.lit(T0) + F.make_interval(mins=F.col("id"))).alias("time"),
        F.lit("hvac_power").alias("measurement"),
        F.create_map(
            F.lit("room"), F.when(F.col("id") % 2 == 0, "kitchen").otherwise("bedroom")
        ).alias("tags"),
        F.create_map(F.lit("watts"), F.rand(seed=7) * 500).alias("fields"),
    )
    db.insert_dataframe(bulk)

    print("measurements:", db.get_measurements())
    print("total points:", len(db))
    print("kitchen > 21C:",
          db.count((TagQuery().room == "kitchen") & (FieldQuery().temp > 21)))
    hottest = db.search_df(FieldQuery().temp.exists()).orderBy(
        F.col("fields")["temp"].desc()
    )
    hottest.show(3, truncate=False)
    db.close()


if __name__ == "__main__":
    main()
