"""Point model tests — validation rules and the reference CSV codec
(modeled on reference tests/test_point.py round-trip and special-value
cases, e.g. test_point.py:312-401,417-470)."""

from datetime import datetime, timezone

import pytest

from tinyflux_spark.point import Point


def test_defaults():
    p = Point(fields={"a": 1})
    assert p.measurement == "_default"
    assert p.time is not None and p.time.tzinfo is not None
    assert p.tags == {}


def test_empty_point_has_no_time():
    p = Point()
    assert p.time is None


def test_validation():
    with pytest.raises(ValueError):
        Point(time="not a datetime", fields={"a": 1})  # type: ignore
    with pytest.raises(ValueError):
        Point(measurement=123, fields={"a": 1})  # type: ignore
    with pytest.raises(ValueError):
        Point(tags={"k": 5})  # type: ignore
    with pytest.raises(ValueError):
        Point(fields={"k": "str"})  # type: ignore
    with pytest.raises(ValueError):
        Point(fields={"k": True})  # bool rejected (reference point.py:76-79)
    # None is allowed in both tags and fields.
    Point(tags={"k": None}, fields={"f": None})


def test_tz_coercion_to_utc():
    naive = datetime(2020, 1, 1, 12, 0, 0)
    p = Point(time=naive, fields={"a": 1})
    assert p.time.tzinfo == timezone.utc
    assert p.time.hour == 12


def test_equality_structural():
    t = datetime(2020, 1, 1, tzinfo=timezone.utc)
    a = Point(time=t, tags={"c": "LA"}, fields={"x": 1})
    b = Point(time=t, tags={"c": "LA"}, fields={"x": 1})
    c = Point(time=t, tags={"c": "SF"}, fields={"x": 1})
    assert a == b
    assert a != c


@pytest.mark.parametrize("compact", [False, True])
def test_csv_round_trip(compact):
    t = datetime(2020, 5, 1, 9, 30, 0, tzinfo=timezone.utc)
    p = Point(
        time=t,
        measurement="weather",
        tags={"city": "LA", "missing": None},
        fields={"temp": 70.5, "n": None},
    )
    row = p.to_csv_row(compact_key_prefixes=compact)
    q = Point.from_csv_row(row)
    assert q.time == t
    assert q.measurement == "weather"
    assert q.tags == {"city": "LA", "missing": None}
    assert q.fields == {"temp": 70.5, "n": None}


def test_csv_int_float_quirk():
    # int fields serialize via str(float(v)) so they come back float
    # (reference point.py:354,282-296).
    p = Point(
        time=datetime(2020, 1, 1, tzinfo=timezone.utc), fields={"big": 15000000}
    )
    row = p.to_csv_row()
    assert row[3] == "15000000.0"
    q = Point.from_csv_row(row)
    assert isinstance(q.fields["big"], float)


def test_csv_timeless_point_refuses_to_serialize():
    # A time-less Point has no valid CSV form: the reader (ours and the
    # reference's) parses column 0 as an ISO timestamp unconditionally,
    # so writing one would poison the file. insert() stamps time before
    # storage; direct serialization must raise instead.
    p = Point()
    assert p.time is None
    with pytest.raises(ValueError):
        p.to_csv_row()
    with pytest.raises(ValueError):
        p.to_csv_row(compact_key_prefixes=True)


def test_csv_none_sentinel():
    p = Point(
        time=datetime(2020, 1, 1, tzinfo=timezone.utc),
        tags={"t": None},
        fields={"f": None},
    )
    row = p.to_csv_row()
    assert "_none" in row
    q = Point.from_csv_row(row)
    assert q.tags["t"] is None
    assert q.fields["f"] is None


def test_utils_freeze_reference_contract():
    """freeze/FrozenDict drop-in surface (reference utils.py:7-58):
    nested structures become hashable, equality with plain dicts holds,
    and mutation raises."""
    import pytest

    from tinyflux_spark.utils import FrozenDict, freeze

    frozen = freeze({"a": [1, 2, {"b": {3}}], "c": 4})
    assert isinstance(frozen, FrozenDict)
    assert frozen == {"a": (1, 2, FrozenDict(b=frozenset({3}))), "c": 4}
    assert hash(frozen) == hash(freeze({"c": 4, "a": [1, 2, {"b": {3}}]}))
    assert {frozen: "usable as a key"}[frozen] == "usable as a key"
    with pytest.raises(TypeError):
        frozen["a"] = 1
    with pytest.raises(TypeError):
        frozen.update({"x": 1})
    with pytest.raises(TypeError):
        del frozen["c"]
    assert freeze(7) == 7 and freeze("s") == "s"
