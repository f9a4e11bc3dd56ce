"""Backup, export, and reference-format interop — the Spark-native take
on the reference's edge-backup example (reference
examples/4_backing_up_tinyflux_at_the_edge.py).

Three tools shown:

* ``compact()`` — merge the per-append parquet fragments before
  shipping a snapshot.
* CSV export in the reference's exact row layout: a file written here
  opens in the reference library unchanged (and vice versa), so a
  fleet of edge devices running the reference can sync into one
  Spark-scale store.
* Reading a reference-written CSV back through the engine.

Run: python examples/4_backup_and_interop.py
"""

import os
import sys
import tempfile
from datetime import datetime, timedelta, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinyflux_spark import FieldQuery, Point, TinyFluxSpark
from tinyflux_spark.storages import CSVStorage

T0 = datetime(2024, 2, 1, tzinfo=timezone.utc)


def main() -> None:
    root = tempfile.mkdtemp(prefix="tfs_example4_")

    # A store fragmented by many small appends (edge-style trickle).
    db = TinyFluxSpark(os.path.join(root, "edge_db"))
    for hour in range(6):
        db.insert_multiple(
            Point(
                time=T0 + timedelta(hours=hour, minutes=m),
                measurement="soil",
                tags={"bed": f"b{m % 2}"},
                fields={"moisture": 0.2 + 0.01 * m},
            )
            for m in range(10)
        )
    frags = db.storage.parquet_file_count()
    merged = db.compact()
    print(f"compacted: {frags} files -> {frags - merged}")

    # Export to the reference CSV format.
    csv_path = os.path.join(root, "backup.csv")
    backup = TinyFluxSpark(csv_path, storage=CSVStorage, spark=db.spark)
    backup.insert_multiple(iter(db), compact_key_prefixes=True)
    backup.close()
    print("backup rows:", sum(1 for _ in open(csv_path)))

    # Re-open the backup through the engine and verify a query agrees.
    restored = TinyFluxSpark(csv_path, storage=CSVStorage, spark=db.spark)
    q = FieldQuery().moisture > 0.25
    assert restored.count(q) == db.count(q)
    print("restored matches:", restored.count(q))

    # If the reference library is importable, prove the cross-library
    # round-trip (the backup opens in stock tinyflux).
    try:
        sys.path.insert(0, "/root/reference")
        import tinyflux as ref  # noqa: F401

        ref_db = ref.TinyFlux(csv_path)
        assert len(ref_db.all()) == len(db)
        print("reference library reads the backup:", len(ref_db.all()), "points")
        ref_db.close()
    except ImportError:
        print("reference library not available — skipped cross-check")
    db.close()


if __name__ == "__main__":
    main()
