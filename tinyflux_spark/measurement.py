"""Measurement — a named logical partition of the store.

"Analogous to a table in a traditional RDBMS" (reference
tinyflux/measurement.py:1-10). Not a separate dataset: every operation
delegates to the database with a measurement filter injected (reference
measurement.py:140-395), which on ParquetStorage resolves to partition
pruning rather than a scan.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Dict, Iterator, List, Optional, Sequence, Union

from pyspark.sql import DataFrame

from .point import Point
from .queries import Query


class Measurement:
    def __init__(self, name: str, db) -> None:
        self._name = name
        self._db = db

    @property
    def name(self) -> str:
        return self._name

    @property
    def index(self):
        """Reference-compat: the database's index handle (reference
        measurement.py:64-72)."""
        return self._db.index

    @property
    def storage(self):
        """Reference-compat: the database's storage instance (reference
        measurement.py:74-82)."""
        return self._db.storage

    def __repr__(self) -> str:
        return f"<Measurement name={self._name}>"

    def __len__(self) -> int:
        from pyspark.sql import functions as F

        return (
            self._db.dataframe()
            .where(F.col("measurement") == self._name)
            .count()
        )

    def __iter__(self) -> Iterator[Point]:
        from pyspark.sql import functions as F

        it = (
            self._db.storage.read()
            .where(F.col("measurement") == self._name)
            .orderBy("_seq")
            .toLocalIterator()
        )
        return (Point.from_row(r) for r in it)

    def dataframe(self) -> DataFrame:
        from pyspark.sql import functions as F

        return self._db.dataframe().where(F.col("measurement") == self._name)

    # CRUD delegates — each injects the measurement scope.
    def insert(self, point: Point) -> int:
        return self._db.insert(point, measurement=self._name)

    def insert_multiple(self, points, **kw) -> int:
        return self._db.insert_multiple(points, measurement=self._name, **kw)

    def all(self, sorted: bool = True) -> List[Point]:
        return self._db.all(sorted=sorted, measurement=self._name)

    def search(self, query: Query, sorted: bool = True) -> List[Point]:
        return self._db.search(query, measurement=self._name, sorted=sorted)

    def search_df(self, query: Query, sorted: bool = True) -> DataFrame:
        return self._db.search_df(query, measurement=self._name, sorted=sorted)

    def get(self, query: Query) -> Optional[Point]:
        return self._db.get(query, measurement=self._name)

    def count(self, query: Query) -> int:
        return self._db.count(query, measurement=self._name)

    def contains(self, query: Query) -> bool:
        return self._db.contains(query, measurement=self._name)

    def select(self, keys, query: Query) -> List:
        return self._db.select(keys, query, measurement=self._name)

    def get_field_keys(self) -> List[str]:
        return self._db.get_field_keys(measurement=self._name)

    def get_field_values(self, field_key: str) -> List:
        return self._db.get_field_values(field_key, measurement=self._name)

    def get_tag_keys(self) -> List[str]:
        return self._db.get_tag_keys(measurement=self._name)

    def get_tag_values(self, tag_keys: Optional[Sequence[str]] = None) -> Dict:
        return self._db.get_tag_values(tag_keys, measurement=self._name)

    def get_timestamps(self) -> List[datetime]:
        return self._db.get_timestamps(measurement=self._name)

    def update(self, query: Query, **kw) -> int:
        return self._db.update(query, _measurement_scope=self._name, **kw)

    def update_all(self, **kw) -> int:
        from .queries import TimeQuery

        return self._db.update(
            TimeQuery().noop(), _measurement_scope=self._name, **kw
        )

    def remove(self, query: Query) -> int:
        return self._db.remove(query, measurement=self._name)

    def remove_all(self) -> int:
        return self._db.drop_measurement(self._name)

    def downsample(
        self,
        older_than: datetime,
        interval_sec: int,
        agg: str = "avg",
    ) -> int:
        """Retention rollup scoped to this measurement's partitions."""
        return self._db.downsample(
            older_than, interval_sec, agg=agg, measurement=self._name
        )
