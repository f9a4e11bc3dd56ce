"""Cross-implementation CSV interop, gated on the ACTUAL reference
package (not just our codec round-trip, which tests/test_point.py and
q50 already cover).

The reference at /root/reference is pure Python with zero runtime
dependencies, so when present it imports directly. Files written by
the reference must load here unchanged, and rows appended by this
engine must read back identically through the reference
(reference point.py:236-296 codec; storages.py:170-433 CSVStorage).
"""

import os
import sys
from datetime import datetime, timezone

import pytest

from tinyflux_spark import CSVStorage, FieldQuery, Point, TinyFluxSpark

_REF_ROOT = os.environ.get("TINYFLUX_REFERENCE_ROOT", "/root/reference")


def _load_reference():
    if not os.path.isdir(os.path.join(_REF_ROOT, "tinyflux")):
        return None
    if _REF_ROOT not in sys.path:
        sys.path.append(_REF_ROOT)
    try:
        import tinyflux as ref  # noqa: PLC0415

        return ref
    except Exception:  # pragma: no cover — half-present checkout
        return None


ref = _load_reference()

pytestmark = pytest.mark.skipif(
    ref is None, reason="reference tinyflux package not available"
)


def _points_equal(a, b):
    return (
        a.time == b.time
        and a.measurement == b.measurement
        and a.tags == b.tags
        and a.fields == b.fields
    )


def test_reference_written_file_reads_here(spark, tmp_path):
    path = str(tmp_path / "ref.csv")
    rdb = ref.TinyFlux(path)
    for h in range(8):
        rdb.insert(
            ref.Point(
                time=datetime(2024, 2, 1, h, tzinfo=timezone.utc),
                measurement="sensor",
                tags={"site": "a" if h % 2 else "b", "null_tag": None},
                fields={"v": h * 1.5, "n": h, "missing": None},
            )
        )
    rdb.close()

    db = TinyFluxSpark(path, storage=CSVStorage, spark=spark)
    ours = sorted(db.search(FieldQuery().v >= 3.0), key=lambda p: p.time)
    rdb = ref.TinyFlux(path)
    theirs = sorted(
        rdb.search(ref.FieldQuery().v >= 3.0), key=lambda p: p.time
    )
    rdb.close()
    assert len(ours) == len(theirs) == 6
    for a, b in zip(ours, theirs):
        assert _points_equal(a, b), (a, b)
    # int-vs-float CSV quirk agreement: int field serialized by the
    # reference via str(float(v)) comes back float in BOTH readers
    assert all(isinstance(p.fields["n"], float) for p in ours)
    db.close()


def test_engine_appended_rows_read_back_by_reference(spark, tmp_path):
    path = str(tmp_path / "rt.csv")
    rdb = ref.TinyFlux(path)
    rdb.insert(
        ref.Point(
            time=datetime(2024, 2, 1, tzinfo=timezone.utc),
            measurement="sensor",
            tags={"site": "a"},
            fields={"v": 1.0},
        )
    )
    rdb.close()

    db = TinyFluxSpark(path, storage=CSVStorage, spark=spark)
    db.insert(
        Point(
            time=datetime(2024, 2, 2, tzinfo=timezone.utc),
            measurement="sensor",
            tags={"site": "c", "gone": None},
            fields={"v": 42.0, "empty": None},
        )
    )
    db.close()

    rdb = ref.TinyFlux(path)
    assert len(rdb) == 2
    back = rdb.search(ref.TagQuery().site == "c")
    assert len(back) == 1
    p = back[0]
    assert p.fields["v"] == 42.0
    assert p.fields["empty"] is None
    assert p.tags["gone"] is None
    assert p.time == datetime(2024, 2, 2, tzinfo=timezone.utc)
    rdb.close()


def test_compact_prefix_file_cross_reads(spark, tmp_path):
    """compact_key_prefixes files (t_/f_) written by either side read
    identically by both (reference point.py:104-107 prefix variants)."""
    path = str(tmp_path / "compact.csv")
    db = TinyFluxSpark(path, storage=CSVStorage, spark=spark)
    db.insert(
        Point(
            time=datetime(2024, 3, 1, tzinfo=timezone.utc),
            measurement="m",
            tags={"k": "v"},
            fields={"x": 2.5},
        ),
        compact_key_prefixes=True,
    )
    db.close()

    rdb = ref.TinyFlux(path)
    pts = rdb.all()
    assert len(pts) == 1
    assert pts[0].tags == {"k": "v"}
    assert pts[0].fields == {"x": 2.5}
    rdb.close()


def test_index_storage_shims_run_reference_snippet(spark, tmp_path):
    """A reference-style maintenance snippet — touching db.index.valid,
    index emptiness, len(db.index), db.reindex(), m.index and m.storage
    — runs unmodified against this engine (reference database.py:118-126
    and 687-714, measurement.py:64-82; here the index handle is the
    always-valid CompatIndex over the parquet layout)."""
    path = str(tmp_path / "shimdb")
    db = TinyFluxSpark(path, spark=spark)

    # --- snippet a reference user could have written, verbatim ---
    assert db.index.valid
    assert db.index.empty
    db.insert(
        Point(
            time=datetime(2024, 4, 1, tzinfo=timezone.utc),
            measurement="m",
            tags={"site": "a"},
            fields={"v": 1.0},
        )
    )
    if not db.index.valid:
        db.reindex()
    assert len(db.index) == len(db) == 1
    assert not db.index.empty
    m = db.measurement("m", auto_index=True)  # kwargs pass-through
    assert m.index is not None and m.index.valid
    assert m.storage is db.storage
    db.reindex()  # maintenance no-op alias for compact()
    assert len(db) == 1
    # --- end snippet ---
    db.close()
