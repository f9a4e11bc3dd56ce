"""The Point — the single record abstraction of the engine.

Matches the reference data model (reference tinyflux/point.py:84-143):
a Point is (time, measurement, tags, fields) with

* ``time``: timezone-aware ``datetime`` coerced to UTC; ``None`` on an
  empty Point, stamped at insert time (reference database.py:1274-1278).
* ``measurement``: ``str``, default ``"_default"``.
* ``tags``: ``dict[str, str | None]`` (reference point.py:32-52).
* ``fields``: ``dict[str, int | float | None]``; ``bool`` is explicitly
  rejected (reference point.py:76-79).

Also provides the reference-compatible CSV row codec
(reference point.py:307-367: ``[iso_time, measurement, _tag_<k>, <v>, ...,
_field_<k>, <v>, ...]`` with ``_none`` as the None sentinel and optional
compact ``t_``/``f_`` prefixes) so files written by the reference load
into this engine and vice versa.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Dict, Optional, Sequence, Tuple, Union

TagSet = Dict[str, Optional[str]]
FieldSet = Dict[str, Union[int, float, None]]

DEFAULT_MEASUREMENT = "_default"
NONE_STR = "_none"
TAG_PREFIX = "_tag_"
FIELD_PREFIX = "_field_"
COMPACT_TAG_PREFIX = "t_"
COMPACT_FIELD_PREFIX = "f_"


def _validate_tags(tags: TagSet) -> None:
    for k, v in tags.items():
        if not isinstance(k, str):
            raise ValueError("Tag set must contain only string keys.")
        if v is not None and not isinstance(v, str):
            raise ValueError("Tag set must contain only string values.")


def _validate_fields(fields: FieldSet) -> None:
    for k, v in fields.items():
        if not isinstance(k, str):
            raise ValueError("Field set must contain only string keys.")
        # bool is an int subclass in Python; the reference rejects it
        # explicitly (reference point.py:76-79).
        if v is not None and (
            isinstance(v, bool) or not isinstance(v, (int, float))
        ):
            raise ValueError(
                "Field set must contain only numeric or None values."
            )


class Point:
    """An immutable-ish time-series record.

    Usage:
        >>> Point(time=datetime.now(timezone.utc),
        ...       measurement="weather",
        ...       tags={"city": "LA"},
        ...       fields={"temp_f": 70.1})
    """

    __slots__ = ("_time", "_measurement", "_tags", "_fields")

    def __init__(
        self,
        time: Optional[datetime] = None,
        measurement: str = DEFAULT_MEASUREMENT,
        tags: Optional[TagSet] = None,
        fields: Optional[FieldSet] = None,
        _now_if_empty: bool = True,
    ) -> None:
        has_kwargs = (
            time is not None or tags is not None or fields is not None
            or measurement != DEFAULT_MEASUREMENT
        )
        if time is None and has_kwargs and _now_if_empty:
            # Reference stamps now(UTC) when any kwargs are given
            # (reference point.py:133,140).
            time = datetime.now(timezone.utc)
        if time is not None:
            if not isinstance(time, datetime):
                raise ValueError("Time must be datetime object.")
            time = (
                time.replace(tzinfo=timezone.utc)
                if time.tzinfo is None
                else time.astimezone(timezone.utc)
            )
        if not isinstance(measurement, str):
            raise ValueError("Measurement must be str.")
        tags = dict(tags) if tags else {}
        fields = dict(fields) if fields else {}
        _validate_tags(tags)
        _validate_fields(fields)
        self._time = time
        self._measurement = measurement
        self._tags = tags
        self._fields = fields

    # -- attribute access (names mirror the query binding attrs) ---------
    @property
    def time(self) -> Optional[datetime]:
        return self._time

    @time.setter
    def time(self, value: datetime) -> None:
        if not isinstance(value, datetime):
            raise ValueError("Time must be datetime object.")
        self._time = (
            value.replace(tzinfo=timezone.utc)
            if value.tzinfo is None
            else value.astimezone(timezone.utc)
        )

    @property
    def measurement(self) -> str:
        return self._measurement

    @measurement.setter
    def measurement(self, value: str) -> None:
        if not isinstance(value, str):
            raise ValueError("Measurement must be str.")
        self._measurement = value

    @property
    def tags(self) -> TagSet:
        return self._tags

    @tags.setter
    def tags(self, value: TagSet) -> None:
        _validate_tags(value)
        self._tags = dict(value)

    @property
    def fields(self) -> FieldSet:
        return self._fields

    @fields.setter
    def fields(self, value: FieldSet) -> None:
        _validate_fields(value)
        self._fields = dict(value)

    def __eq__(self, other: object) -> bool:
        # Structural equality over all four attributes
        # (reference point.py:191-208).
        if not isinstance(other, Point):
            return NotImplemented
        return (
            self._time == other._time
            and self._measurement == other._measurement
            and self._tags == other._tags
            and self._fields == other._fields
        )

    def __repr__(self) -> str:
        return (
            f"Point(time={self._time and self._time.isoformat()}, "
            f"measurement={self._measurement}, "
            f"tags={self._tags}, fields={self._fields})"
        )

    def copy(self) -> "Point":
        p = Point.__new__(Point)
        p._time = self._time
        p._measurement = self._measurement
        p._tags = dict(self._tags)
        p._fields = dict(self._fields)
        return p

    # -- Spark row codec --------------------------------------------------
    def to_row(self) -> Tuple:
        """(time, measurement, tags, fields) for the canonical schema.

        Field values go to float: Double everywhere matches the
        reference's durable CSV format (str(float(v)) at reference
        point.py:354).
        """
        return (
            self._time,
            self._measurement,
            dict(self._tags),
            {k: (None if v is None else float(v)) for k, v in self._fields.items()},
        )

    @classmethod
    def from_row(cls, row) -> "Point":
        """Build a Point from a Spark Row in the canonical schema."""
        p = cls.__new__(cls)
        t = row.time
        p._time = (
            t.replace(tzinfo=timezone.utc)
            if t is not None and t.tzinfo is None
            else t
        )
        p._measurement = row.measurement
        p._tags = dict(row.tags) if row.tags is not None else {}
        p._fields = dict(row.fields) if row.fields is not None else {}
        return p

    # -- reference-compatible CSV codec ----------------------------------
    def to_csv_row(self, compact_key_prefixes: bool = False) -> Sequence[str]:
        """Serialize to the reference CSV row layout (point.py:307-367)."""
        tp = COMPACT_TAG_PREFIX if compact_key_prefixes else TAG_PREFIX
        fp = COMPACT_FIELD_PREFIX if compact_key_prefixes else FIELD_PREFIX
        if self._time is None:
            # Storage rows always carry a stamped time (insert stamps
            # time-less Points; reference database.py:1274-1278) and the
            # reference reader — like from_csv_row — parses column 0 as
            # an ISO timestamp unconditionally, so serializing a
            # time-less Point would write an unreadable row. Fail at
            # write time instead of producing a poisoned file.
            raise ValueError(
                "Cannot serialize a Point with no time; insert() stamps "
                "time before storage."
            )
        out = [
            self._time.replace(tzinfo=None).isoformat(),
            str(self._measurement or NONE_STR),
        ]
        for k, v in self._tags.items():
            out.append(f"{tp}{k}")
            out.append(NONE_STR if v is None else str(v))
        for k, v in self._fields.items():
            out.append(f"{fp}{k}")
            out.append(NONE_STR if v is None else str(float(v)))
        return out

    @classmethod
    def from_csv_row(cls, row: Sequence[str]) -> "Point":
        """Deserialize a reference CSV row (point.py:236-296 semantics:
        tag keys recognized by ``_t``/``t`` prefix, int re-inferred from
        all-digit strings, unparseable field value → None)."""
        p = cls.__new__(cls)
        p._time = datetime.fromisoformat(row[0]).replace(tzinfo=timezone.utc)
        p._measurement = row[1]
        tags: TagSet = {}
        fields: FieldSet = {}
        i = 2
        n = len(row)
        while i < n:
            key = row[i]
            if len(key) > 1 and key[1] == "t":
                name = key[len(TAG_PREFIX):]
            elif key and key[0] == "t":
                name = key[len(COMPACT_TAG_PREFIX):]
            else:
                break
            val = row[i + 1]
            tags[name] = None if val == NONE_STR else str(val)
            i += 2
        while i < n:
            key = row[i]
            if len(key) > 1 and key[1] == "f":
                name = key[len(FIELD_PREFIX):]
            else:
                name = key[len(COMPACT_FIELD_PREFIX):]
            val = row[i + 1]
            if val.isdigit() or (val[:1] == "-" and val[1:].isdigit()):
                fields[name] = int(val)
            else:
                try:
                    fields[name] = float(val)
                except (TypeError, ValueError):
                    fields[name] = None
            i += 2
        p._tags = tags
        p._fields = fields
        return p
