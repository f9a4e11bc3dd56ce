"""Query algebra: TinyFlux-style predicate builders compiled to Spark Columns.

The user surface mirrors the reference (reference tinyflux/queries.py):
``TimeQuery``, ``MeasurementQuery``, ``TagQuery``, ``FieldQuery`` build
predicate objects via operator overloading (``==,!=,<,<=,>,>=``,
``.exists() .matches() .search() .test() .map() .noop()``, combined with
``& | ~``).

Every query object supports TWO evaluation paths:

1. ``q(point)`` — Python evaluation against a single :class:`Point`
   (used for validation, MemoryStorage paths and as an internal oracle in
   tests).
2. ``q.compile()`` — a Spark ``Column`` boolean expression over the
   canonical schema. This is the path that executes distributed.

Semantics reproduced exactly (they differ from SQL three-valued logic —
reference queries.py:243-250,476-482 and tests/test_queries.py:672-695):

* Missing tag/field key        → predicate is **False** (never null/error).
* Ordered compare vs None val  → False (Python TypeError swallowed).
* ``!= rhs`` on a None value   → **True** (Python ``None != 5``).
* ``== None``                  → True only when the key exists with value
                                 None.
* ``~q`` negates the resolved boolean, so ``~(FieldQuery().a == 1)``
  matches points *lacking* field ``a``.

The compiled Columns are therefore "closed" booleans — never NULL — built
with ``<=>`` (null-safe equal), ``map_contains_key`` and
``coalesce(..., False)`` so that ``& | ~`` compose without SQL null
surprises. Catalyst then splits conjunctions and pushes the pushable
conjuncts into the scan; ``.test()``/``.map()`` compile to Python UDFs
(the reference's entire UDF surface) which intentionally stay out of the
pushdown path while their sibling conjuncts still prune.

Deliberate divergence from the reference: ``.matches()``/``.search()`` on
a None tag value returns False here; the reference raises TypeError from
``re.match(pattern, None)`` (untested edge in its suite). Regexes execute
in Java regex dialect on the Spark path and Python ``re`` on the Python
path; both are start-anchored for ``matches`` like ``re.match``.
"""

from __future__ import annotations

import operator as _op
import re
from datetime import datetime
from typing import Any, Callable, Optional, Tuple, Union

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .point import Point

# Operator tokens.
EQ, NE, LT, LE, GT, GE = "eq", "ne", "lt", "le", "gt", "ge"
EXISTS, MATCHES, SEARCH, TEST, NOOP = (
    "exists",
    "matches",
    "search",
    "test",
    "noop",
)

# operator.* (not dunder calls): dunders return NotImplemented instead of
# raising, which would read as truthy; the reference evaluates via the
# operator module so mixed-type compares raise → False.
_ORDERED = {LT: _op.lt, LE: _op.le, GT: _op.gt, GE: _op.ge}

# Default column bindings for the canonical schema.
_ATTR_COL = {
    "time": "time",
    "measurement": "measurement",
    "tags": "tags",
    "fields": "fields",
}


class Query:
    """Common behavior for Simple and Compound queries."""

    def __call__(self, point: Point) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    def compile(
        self,
        cols: Optional[dict] = None,
        indexed: Optional[dict] = None,
    ) -> Column:
        """Compile to a closed-boolean Spark Column.

        ``indexed`` maps ``("tags"|"fields", key)`` to the name of a
        materialized scalar column (see ParquetStorage index_tags/
        index_fields); eligible predicates compile against the scalar —
        which parquet can push — instead of the MapType lookup, with
        identical semantics.
        """
        raise NotImplementedError

    def __and__(self, other: "Query") -> "CompoundQuery":
        return CompoundQuery("and", self, other)

    def __or__(self, other: "Query") -> "CompoundQuery":
        return CompoundQuery("or", self, other)

    def __invert__(self) -> "CompoundQuery":
        return CompoundQuery("not", self, None)

    def is_hashable(self) -> bool:
        return self._hashval() is not None

    def _hashval(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def __hash__(self) -> int:
        return hash(self._hashval())

    def __eq__(self, other: object) -> bool:
        if isinstance(other, Query):
            a, b = self._hashval(), other._hashval()
            return a is not None and b is not None and a == b
        return NotImplemented


class SimpleQuery(Query):
    """A leaf predicate: (attr, op, rhs, path).

    ``path`` is a tuple of map keys and/or callables (from ``.map``); a
    callable anywhere in the path, or a ``.test`` op, forces the UDF
    compile path.
    """

    def __init__(
        self,
        attr: str,
        op: str,
        rhs: Any = None,
        path: Tuple = (),
        func: Optional[Callable] = None,
        func_args: Tuple = (),
        regex_flags: int = 0,
    ) -> None:
        self.attr = attr
        self.op = op
        self.rhs = rhs
        self.path = tuple(path)
        self.func = func
        self.func_args = tuple(func_args)
        self.regex_flags = regex_flags

    def __repr__(self) -> str:
        return (
            f"SimpleQuery({self.attr!r}, {self.op!r}, rhs={self.rhs!r}, "
            f"path={self.path!r})"
        )

    def _hashval(self):
        if any(callable(p) for p in self.path):
            # .map kills the hash (reference queries.py:754-756).
            return None
        if self.op == TEST:
            return (self.attr, TEST, self.path, self.func, self.func_args)
        if self.op == NOOP:
            return ()
        return (self.attr, self.op, self.path, self.rhs, self.regex_flags)

    # ---------------- Python evaluation (reference semantics) -----------
    def _resolve(self, point: Point):
        value: Any = getattr(point, self.attr)
        for part in self.path:
            if callable(part):
                value = part(value)
            else:
                value = value[part]
        return value

    def __call__(self, point: Point) -> bool:
        if self.op == NOOP:
            return True
        try:
            value = self._resolve(point)
        except Exception:
            # Missing key / unresolvable path → False
            # (reference queries.py:243-250).
            return False
        if self.op == EXISTS:
            return True
        if self.op == TEST:
            return bool(self.func(value, *self.func_args))
        if self.op in (MATCHES, SEARCH):
            if value is None:
                return False  # deliberate divergence, see module doc
            fn = re.match if self.op == MATCHES else re.search
            return fn(self.rhs, value, self.regex_flags) is not None
        try:
            if self.op == EQ:
                return bool(value == self.rhs)
            if self.op == NE:
                return bool(value != self.rhs)
            return bool(_ORDERED[self.op](value, self.rhs))
        except Exception:
            return False

    # ---------------- Spark compilation ---------------------------------
    def _needs_udf(self) -> bool:
        return self.op == TEST or any(callable(p) for p in self.path)

    def compile(
        self,
        cols: Optional[dict] = None,
        indexed: Optional[dict] = None,
    ) -> Column:
        names = dict(_ATTR_COL)
        if cols:
            names.update(cols)
        col = F.col(names[self.attr])

        if self.op == NOOP:
            return F.lit(True)

        if self._needs_udf():
            return self._compile_udf(col)

        if self.attr in ("time", "measurement"):
            if self.path:
                # A key path on a scalar attribute can never resolve
                # (value[part] raises → False, reference queries.py:484+).
                return F.lit(False)
            return self._compile_scalar(col)
        idx = self._indexed_column(indexed)
        if idx is not None:
            return idx
        return self._compile_map(col)

    def _indexed_column(self, indexed: Optional[dict]) -> Optional[Column]:
        """Pushdown-eligible compile against a materialized scalar
        column, when one exists for this predicate's key and the
        operator's semantics survive the map→scalar translation.

        A scalar NULL conflates "key absent" with "key present, value
        None", so only operators for which both cases already evaluate
        identically are rewritten:

        * ``== rhs`` (rhs non-None): both → False. ``eqNullSafe`` keeps
          the boolean closed AND translates to a parquet EqualNullSafe
          filter.
        * ordered compares (rhs non-None): both → False.
          ``isNotNull() & cmp`` is null-free and splits into two
          pushable conjuncts.

        ``!=`` (present-None → True but absent → False), ``== None``,
        ``.exists()`` and the regex ops stay on the map path.
        """
        if not indexed or len(self.path) != 1:
            return None
        scol_name = indexed.get((self.attr, self.path[0]))
        if scol_name is None:
            return None
        rhs = self.rhs
        if rhs is None:
            return None
        if self.attr == "fields" and isinstance(rhs, (int, float)):
            rhs = float(rhs)
        scol = F.col(scol_name)
        if self.op == EQ:
            return scol.eqNullSafe(F.lit(rhs))
        if self.op in _ORDERED:
            cmp = {
                LT: scol < F.lit(rhs),
                LE: scol <= F.lit(rhs),
                GT: scol > F.lit(rhs),
                GE: scol >= F.lit(rhs),
            }[self.op]
            return scol.isNotNull() & cmp
        return None

    def _compile_scalar(self, col: Column) -> Column:
        # ``time`` and ``measurement`` are non-null by the data model
        # (time stamped at insert, measurement defaults to "_default" —
        # reference point.py:100, database.py:1274-1278), so plain
        # comparisons are exact AND remain pushdown-eligible; a
        # coalesce/null-safe wrapper here would block parquet pushdown.
        rhs = self.rhs
        if self.op == EQ:
            if rhs is None:
                return F.lit(False)
            return col == F.lit(rhs)
        if self.op == NE:
            if rhs is None:
                return F.lit(True)
            return col != F.lit(rhs)
        if self.op in _ORDERED:
            if rhs is None:
                return F.lit(False)
            return {
                LT: col < F.lit(rhs),
                LE: col <= F.lit(rhs),
                GT: col > F.lit(rhs),
                GE: col >= F.lit(rhs),
            }[self.op]
        if self.op in (MATCHES, SEARCH):
            pat = _to_java_regex(self.rhs, self.regex_flags)
            if self.op == MATCHES:
                pat = "^(?:" + pat + ")"
            return col.rlike(pat)
        if self.op == EXISTS:
            return col.isNotNull()
        raise ValueError(f"Unsupported operator {self.op}")

    def _compile_map(self, col: Column) -> Column:
        key = self.path[0] if self.path else None
        if key is None:
            return F.lit(False)
        contains = F.coalesce(F.map_contains_key(col, key), F.lit(False))
        if len(self.path) > 1:
            # Nested key paths on a flat map never resolve → False.
            return F.lit(False)
        v = col[key]
        if self.op == EXISTS:
            return contains
        rhs = self.rhs
        if self.attr == "fields" and isinstance(rhs, (int, float)):
            rhs = float(rhs)
        if self.op == EQ:
            if rhs is None:
                return contains & v.isNull()
            return v.eqNullSafe(F.lit(rhs))
        if self.op == NE:
            if rhs is None:
                return contains & v.isNotNull()
            return contains & ~v.eqNullSafe(F.lit(rhs))
        if self.op in _ORDERED:
            if rhs is None:
                return F.lit(False)
            cmp = {
                LT: v < F.lit(rhs),
                LE: v <= F.lit(rhs),
                GT: v > F.lit(rhs),
                GE: v >= F.lit(rhs),
            }[self.op]
            return F.coalesce(cmp, F.lit(False))
        if self.op in (MATCHES, SEARCH):
            pat = _to_java_regex(self.rhs, self.regex_flags)
            if self.op == MATCHES:
                pat = "^(?:" + pat + ")"
            return F.coalesce(v.rlike(pat), F.lit(False))
        raise ValueError(f"Unsupported operator {self.op}")

    def _compile_udf(self, col: Column) -> Column:
        """Fallback for .test()/.map(): a Python UDF over the bound attr.

        Kept as a single closed boolean so sibling (non-UDF) conjuncts
        are still split off and pushed down by Catalyst.
        """
        q = self

        def _eval(value) -> bool:
            try:
                v = value
                if isinstance(v, dict):
                    pass
                for part in q.path:
                    v = part(v) if callable(part) else v[part]
            except Exception:
                return False
            if q.op == EXISTS:
                return True
            if q.op == TEST:
                try:
                    return bool(q.func(v, *q.func_args))
                except Exception:
                    raise
            if q.op in (MATCHES, SEARCH):
                if v is None:
                    return False
                fn = re.match if q.op == MATCHES else re.search
                return fn(q.rhs, v, q.regex_flags) is not None
            try:
                if q.op == EQ:
                    return bool(v == q.rhs)
                if q.op == NE:
                    return bool(v != q.rhs)
                return bool(_ORDERED[q.op](v, q.rhs))
            except Exception:
                return False

        udf = F.udf(_eval, T.BooleanType())
        return F.coalesce(udf(col), F.lit(False))


class CompoundQuery(Query):
    """Logical and/or/not over queries (reference queries.py:36-171)."""

    def __init__(self, op: str, q1: Query, q2: Optional[Query]) -> None:
        self.op = op
        self.q1 = q1
        self.q2 = q2

    def __repr__(self) -> str:
        return f"CompoundQuery({self.op!r}, {self.q1!r}, {self.q2!r})"

    def _hashval(self):
        h1 = self.q1._hashval()
        if self.op == "not":
            return None if h1 is None else ("not", h1)
        h2 = self.q2._hashval() if self.q2 is not None else None
        if h1 is None or h2 is None:
            return None
        # Commutative AND/OR via frozenset (reference queries.py:284,300).
        return (self.op, frozenset([h1, h2]))

    def __call__(self, point: Point) -> bool:
        if self.op == "and":
            return self.q1(point) and self.q2(point)
        if self.op == "or":
            return self.q1(point) or self.q2(point)
        return not self.q1(point)

    def compile(
        self,
        cols: Optional[dict] = None,
        indexed: Optional[dict] = None,
    ) -> Column:
        c1 = self.q1.compile(cols, indexed)
        if self.op == "not":
            return ~c1
        c2 = self.q2.compile(cols, indexed)
        return (c1 & c2) if self.op == "and" else (c1 | c2)


def _to_java_regex(pattern: str, flags: int) -> str:
    """Translate common Python re flags to Java embedded flags."""
    prefix = ""
    if flags & re.IGNORECASE:
        prefix += "i"
    if flags & re.MULTILINE:
        prefix += "m"
    if flags & re.DOTALL:
        prefix += "s"
    return f"(?{prefix})" + pattern if prefix else pattern


class BaseQuery:
    """Builder: accumulates a key path, emits SimpleQuery on comparison.

    Mirrors reference queries.py:322-759 behavior including build-time
    RHS validation (with the reference's quirk that a *falsy* RHS skips
    the type check — ``rhs and not isinstance(...)`` at
    queries.py:443-469 — which is what makes ``== None`` legal).
    """

    _attr: str = ""
    _path_required: bool = False
    _rhs_type: tuple = ()
    _rhs_err: str = ""

    def __init__(self) -> None:
        self._path: Tuple = ()

    def _extend(self, part) -> "BaseQuery":
        q = type(self)()
        q._path = self._path + (part,)
        return q

    def __getattr__(self, item: str) -> "BaseQuery":
        if item.startswith("_"):
            raise AttributeError(item)
        return self._extend(item)

    def __getitem__(self, item: str) -> "BaseQuery":
        return self._extend(item)

    def map(self, func: Callable[[Any], Any]) -> "BaseQuery":
        """Append a value transform to the path (reference queries.py:738)."""
        return self._extend(func)

    def _check(self, rhs: Any) -> None:
        if self._path_required and not self._path:
            raise RuntimeError(
                "Query has no path. Provide tag or field key to query."
            )
        if not self._attr:
            raise RuntimeError(
                "Query has no defined Point attribute. "
                "You may be attempting to initialize a BaseQuery."
            )
        if rhs and self._rhs_type and not isinstance(rhs, self._rhs_type):
            raise TypeError(self._rhs_err)

    def _simple(self, op: str, rhs: Any = None, **kw) -> SimpleQuery:
        self._check(rhs)
        return SimpleQuery(self._attr, op, rhs=rhs, path=self._path, **kw)

    def __eq__(self, rhs: Any) -> SimpleQuery:  # type: ignore[override]
        return self._simple(EQ, rhs)

    def __ne__(self, rhs: Any) -> SimpleQuery:  # type: ignore[override]
        return self._simple(NE, rhs)

    def __lt__(self, rhs: Any) -> SimpleQuery:
        return self._simple(LT, rhs)

    def __le__(self, rhs: Any) -> SimpleQuery:
        return self._simple(LE, rhs)

    def __gt__(self, rhs: Any) -> SimpleQuery:
        return self._simple(GT, rhs)

    def __ge__(self, rhs: Any) -> SimpleQuery:
        return self._simple(GE, rhs)

    def __invert__(self) -> None:
        raise RuntimeError("Cannot logical-NOT an empty query.")

    def __hash__(self) -> int:  # builders hash by identity
        return id(self)

    def noop(self) -> SimpleQuery:
        return SimpleQuery(self._attr or "time", NOOP)

    def test(self, func: Callable, *args: Any) -> SimpleQuery:
        """Arbitrary boolean UDF on the resolved value
        (reference queries.py:648-674). Compiles to a Python UDF."""
        self._check(None)
        return SimpleQuery(
            self._attr, TEST, path=self._path, func=func, func_args=args
        )

    def matches(self, regex: str, flags: int = 0) -> SimpleQuery:
        """Start-anchored regex, like ``re.match``
        (reference queries.py:680-700)."""
        self._check(None)
        return SimpleQuery(
            self._attr, MATCHES, rhs=regex, path=self._path, regex_flags=flags
        )

    def search(self, regex: str, flags: int = 0) -> SimpleQuery:
        """Substring regex, like ``re.search``
        (reference queries.py:702-722)."""
        self._check(None)
        return SimpleQuery(
            self._attr, SEARCH, rhs=regex, path=self._path, regex_flags=flags
        )

    def exists(self) -> SimpleQuery:
        """Key presence — True even when the value is None
        (reference queries.py:778-821)."""
        self._check(None)
        return SimpleQuery(self._attr, EXISTS, path=self._path)


class TimeQuery(BaseQuery):
    _attr = "time"
    _rhs_type = (datetime,)
    _rhs_err = "TimeQuery comparison value must be datetime object."

    def matches(self, regex: str, flags: int = 0) -> SimpleQuery:
        raise RuntimeError("Cannot regex match on time queries.")

    def search(self, regex: str, flags: int = 0) -> SimpleQuery:
        raise RuntimeError("Cannot regex search on time queries.")

    def exists(self) -> SimpleQuery:
        raise RuntimeError("Cannot check existence on time queries.")


class MeasurementQuery(BaseQuery):
    _attr = "measurement"
    _rhs_type = (str,)
    _rhs_err = "MeasurementQuery comparison value must be string."

    def exists(self) -> SimpleQuery:
        raise RuntimeError("Cannot check existence on measurement queries.")


class TagQuery(BaseQuery):
    _attr = "tags"
    _path_required = True
    _rhs_type = (str,)
    _rhs_err = "TagQuery comparison value must be string."


class FieldQuery(BaseQuery):
    _attr = "fields"
    _path_required = True
    _rhs_type = (int, float)
    _rhs_err = "FieldQuery comparison value must be numeric."

    def matches(self, regex: str, flags: int = 0) -> SimpleQuery:
        raise RuntimeError("Cannot regex match on field queries.")

    def search(self, regex: str, flags: int = 0) -> SimpleQuery:
        raise RuntimeError("Cannot regex search on field queries.")
