"""tinyflux_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of TinyFlux (citrusvanilla/tinyflux).

This is NOT a port: the reference's in-process storage/index machinery
(reference tinyflux/storages.py, tinyflux/index.py) is replaced wholesale by
Parquet layout + Catalyst optimization. What is preserved is the *data model*
(Point: time/measurement/tags/fields — reference tinyflux/point.py:84-143),
the *query algebra* (Time/Measurement/Tag/Field queries with TinyFlux's
missing-key and None semantics — reference tinyflux/queries.py), and the
*database API surface* (reference tinyflux/database.py, measurement.py),
re-expressed as DataFrame plans.
"""

from .point import Point
from .queries import (
    BaseQuery,
    CompoundQuery,
    FieldQuery,
    MeasurementQuery,
    Query,
    SimpleQuery,
    TagQuery,
    TimeQuery,
)
from .schema import POINT_SCHEMA, collect_arrow_batches, get_spark, points_to_df
from .sources import from_table, read_table
from .storages import CSVStorage, MemoryStorage, ParquetStorage, Storage
from .database import TinyFluxSpark
from .measurement import Measurement

__version__ = "0.1.0"

__all__ = [
    "Point",
    "BaseQuery",
    "SimpleQuery",
    "CompoundQuery",
    "Query",
    "TimeQuery",
    "MeasurementQuery",
    "TagQuery",
    "FieldQuery",
    "POINT_SCHEMA",
    "get_spark",
    "points_to_df",
    "collect_arrow_batches",
    "from_table",
    "read_table",
    "Storage",
    "MemoryStorage",
    "CSVStorage",
    "ParquetStorage",
    "TinyFluxSpark",
    "Measurement",
]
