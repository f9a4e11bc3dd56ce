"""Connectors: map arbitrary tabular data into the canonical point
schema (time, measurement, tags map, fields map).

The reference ingests only its own CSV row format and in-process Point
objects; a Spark engine's natural ingest surface is "any DataFrame
Spark can read" — parquet, CSV, JSONL, JDBC, a stream. ``from_table``
is the single mapping primitive: declare which columns are the time,
the measurement, the tags and the fields, and get a canonical frame
ready for ``db.insert_dataframe`` (or any operator). Everything is a
narrow projection — no shuffle, no UDFs; 100 TB of source maps at scan
speed.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def from_table(
    df: DataFrame,
    time_col: Union[str, Column],
    measurement: Union[str, Column, None] = None,
    tag_cols: Optional[Sequence[str]] = None,
    field_cols: Optional[Sequence[str]] = None,
    tag_map: Optional[Dict[str, Column]] = None,
    field_map: Optional[Dict[str, Column]] = None,
) -> DataFrame:
    """Project a tabular DataFrame into the canonical point schema.

    * ``time_col`` — column name or expression; cast to timestamp.
    * ``measurement`` — a literal string (every row same measurement),
      a Column expression (per-row measurement, e.g. a category
      column), or None for the reference's ``_default``.
    * ``tag_cols`` / ``field_cols`` — source columns carried over under
      their own names; tags cast to string, fields to double (the
      canonical types, mirroring the reference's TagSet/FieldSet
      coercions).
    * ``tag_map`` / ``field_map`` — explicit {key: expression} entries
      for renames or computed values; merged after the ``*_cols``
      shorthand, so an explicit key overrides a same-named column.

    Null handling matches the data model: a null tag/field VALUE is a
    present key with value None (the reference allows both), so
    row-level nulls survive the map.
    """
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    if measurement is None:
        m = F.lit("_default")
    elif isinstance(measurement, str):
        m = F.lit(measurement)
    else:
        m = measurement.cast("string")

    def _entries(cols, explicit, cast_to):
        entries = {}
        for c in cols or []:
            entries[c] = F.col(c).cast(cast_to)
        for k, expr in (explicit or {}).items():
            entries[k] = (
                F.col(expr) if isinstance(expr, str) else expr
            ).cast(cast_to)
        return entries

    tags = _entries(tag_cols, tag_map, "string")
    fields = _entries(field_cols, field_map, "double")
    # Sorted key order keeps the map layout deterministic across runs.
    tag_kv = [x for k in sorted(tags) for x in (F.lit(k), tags[k])]
    field_kv = [x for k in sorted(fields) for x in (F.lit(k), fields[k])]
    return df.select(
        t.cast("timestamp").alias("time"),
        m.alias("measurement"),
        (
            F.create_map(*tag_kv)
            if tag_kv
            else F.create_map().cast("map<string,string>")
        ).alias("tags"),
        (
            F.create_map(*field_kv)
            if field_kv
            else F.create_map().cast("map<string,double>")
        ).alias("fields"),
    )


def read_table(
    spark,
    path: str,
    fmt: str = "parquet",
    **options,
) -> DataFrame:
    """Thin reader: ``spark.read.format(fmt).options(...).load(path)``
    with CSV/JSON defaults that fit interchange files (header + schema
    inference). Pair with ``from_table`` to land any file as points."""
    reader = spark.read.format(fmt)
    if fmt in ("csv",):
        reader = reader.option("header", "true").option(
            "inferSchema", "true"
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
