"""Query algebra semantics tests.

The central test is dual-evaluation parity: every query must agree
between its Python evaluation on Points and its compiled Spark Column on
the same data. This mirrors the reference's strongest oracle —
index-vs-storage parity (reference tests/test_tinyflux.py:1507+) —
re-targeted at the two evaluation paths of this engine.

Edge semantics tables follow reference tests/test_queries.py:159-875 and
the None/missing-key cases at 672-695.
"""

import re
from datetime import datetime, timezone

import pytest

from tinyflux_spark.point import Point
from tinyflux_spark.queries import (
    FieldQuery,
    MeasurementQuery,
    TagQuery,
    TimeQuery,
)
from tinyflux_spark.schema import points_to_df

T0 = datetime(2020, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2020, 6, 1, tzinfo=timezone.utc)
T2 = datetime(2021, 1, 1, tzinfo=timezone.utc)

POINTS = [
    Point(time=T0, measurement="weather", tags={"city": "LA"}, fields={"temp": 70.0}),
    Point(time=T1, measurement="weather", tags={"city": "SF"}, fields={"temp": 60.0, "rh": 0.8}),
    Point(time=T2, measurement="weather", tags={"city": None}, fields={"temp": None}),
    Point(time=T1, measurement="cpu", tags={"host": "a1"}, fields={"load": 0.5}),
    Point(time=T2, measurement="cpu", tags={"host": "b2", "dc": "us"}, fields={"load": 1.5}),
    Point(time=T0, measurement="_default", tags={}, fields={}),
]


def spark_eval(spark, q):
    df = points_to_df(spark, POINTS, with_seq=True)
    matched = df.where(q.compile()).select("_seq").collect()
    return sorted(r[0] for r in matched)


def python_eval(q):
    return sorted(i for i, p in enumerate(POINTS) if q(p))


QUERIES = [
    TimeQuery() >= T1,
    TimeQuery() < T1,
    TimeQuery() == T1,
    TimeQuery() != T1,
    MeasurementQuery() == "weather",
    MeasurementQuery() != "weather",
    MeasurementQuery().matches("wea.*"),
    MeasurementQuery().search("eat"),
    TagQuery().city == "LA",
    TagQuery().city != "LA",
    TagQuery().city == None,  # noqa: E711
    TagQuery().city != None,  # noqa: E711
    TagQuery().city.exists(),
    TagQuery().host.exists(),
    TagQuery().city > "K",
    TagQuery().city <= "SF",
    TagQuery().city.matches("L.*"),
    TagQuery().city.search("F"),
    TagQuery().nope == "x",
    FieldQuery().temp == 70,
    FieldQuery().temp != 70,
    FieldQuery().temp == None,  # noqa: E711
    FieldQuery().temp != None,  # noqa: E711
    FieldQuery().temp >= 60,
    FieldQuery().temp < 70,
    FieldQuery().temp.exists(),
    FieldQuery().load > 1,
    FieldQuery().missing > 0,
    (TimeQuery() >= T1) & (MeasurementQuery() == "cpu"),
    (TagQuery().city == "LA") | (TagQuery().host == "b2"),
    ~(FieldQuery().temp == 70),
    ~(TagQuery().city.exists()),
    ~((TagQuery().city == "LA") | (FieldQuery().load > 1)),
    (FieldQuery().temp >= 50) & (FieldQuery().temp <= 65) & (TagQuery().city == "SF"),
    TimeQuery().noop(),
    TagQuery().city.test(lambda v: v is not None and v.startswith("L")),
    FieldQuery().temp.map(lambda v: (v or 0) * 2) > 130,
]


@pytest.mark.parametrize("q", QUERIES, ids=[repr(q)[:60] for q in QUERIES])
def test_dual_eval_parity(spark, q):
    assert spark_eval(spark, q) == python_eval(q)


def test_missing_key_is_false_not_error():
    q = FieldQuery().nothere > 5
    assert python_eval(q) == []


def test_not_matches_points_lacking_key():
    # ~(field == x) matches points lacking the field
    # (reference semantics, SURVEY.md §2.1 rule 3).
    q = ~(FieldQuery().load == 0.5)
    got = python_eval(q)
    assert 0 in got and 5 in got and 3 not in got


def test_ne_on_none_value_matches():
    # point 2 has temp=None; None != 70 is True in Python.
    q = FieldQuery().temp != 70
    assert 2 in python_eval(q)
    # but ordered comparison on None is False
    q2 = FieldQuery().temp > 0
    assert 2 not in python_eval(q2)


def test_eq_none_only_when_key_exists():
    q = FieldQuery().temp == None  # noqa: E711
    assert python_eval(q) == [2]
    q2 = TagQuery().city == None  # noqa: E711
    assert python_eval(q2) == [2]


def test_rhs_validation():
    with pytest.raises(TypeError):
        TimeQuery() == "2020-01-01"
    with pytest.raises(TypeError):
        MeasurementQuery() == 5
    with pytest.raises(TypeError):
        TagQuery().city == 5
    with pytest.raises(TypeError):
        FieldQuery().temp == "hot"


def test_path_required():
    with pytest.raises(RuntimeError):
        TagQuery() == "LA"
    with pytest.raises(RuntimeError):
        FieldQuery() == 5


def test_regex_forbidden_on_time_and_fields():
    with pytest.raises(RuntimeError):
        TimeQuery().matches("x")
    with pytest.raises(RuntimeError):
        FieldQuery().a.search("x")


def test_not_empty_query_raises():
    with pytest.raises(RuntimeError):
        ~TagQuery()


def test_matches_is_start_anchored():
    # re.match anchors at start only, not end.
    q = TagQuery().city.matches("L")
    assert python_eval(q) == [0]
    q2 = TagQuery().city.matches("A")
    assert python_eval(q2) == []


def test_regex_flags(spark):
    q = TagQuery().city.matches("la", flags=re.IGNORECASE)
    assert python_eval(q) == [0]
    assert spark_eval(spark, q) == [0]


def test_hashability_and_commutativity():
    q1 = (TagQuery().city == "LA") & (FieldQuery().temp > 5)
    q2 = (FieldQuery().temp > 5) & (TagQuery().city == "LA")
    assert hash(q1) == hash(q2)
    assert q1 == q2
    # .map kills the hash (reference queries.py:754-756).
    qm = TagQuery().city.map(lambda x: x) == "LA"
    assert not qm.is_hashable()


def test_getitem_path():
    q = TagQuery()["city"] == "LA"
    assert python_eval(q) == [0]
