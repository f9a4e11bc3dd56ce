"""Physical-plan audits: the properties that make the engine scale.

These assert on ``explain`` output, because at 100 TB the plan IS the
product: a filter that doesn't reach the parquet scan re-reads the
world; a dimension join that doesn't broadcast shuffles the fact table.
(SURVEY.md §4: the reference's Index is replaced by exactly these
mechanisms.)
"""

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from tinyflux_spark import (
    FieldQuery,
    MeasurementQuery,
    Point,
    TagQuery,
    TimeQuery,
    TinyFluxSpark,
)

T0 = datetime(2020, 1, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def pq_db(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "db")
    db = TinyFluxSpark(path, spark=spark)
    db.insert_multiple(
        Point(
            time=T0 + timedelta(hours=i),
            measurement="weather" if i % 2 == 0 else "cpu",
            tags={"city": "LA"},
            fields={"t": float(i)},
        )
        for i in range(20)
    )
    return db


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_time_filter_pushed_to_parquet_scan(pq_db):
    q = TimeQuery() >= T0 + timedelta(hours=10)
    plan = plan_of(pq_db.search_df(q))
    assert "PushedFilters" in plan
    # the time comparison reaches the scan (row-group min/max skipping)
    assert "GreaterThanOrEqual(time" in plan


def test_time_range_prunes_date_partitions(pq_db):
    # A time range implies pdate bounds; the injected partition
    # conjunct must appear in PartitionFilters (directory-level
    # pruning — the scale replacement for the reference's timestamp
    # bisect index, reference index.py:719-821).
    q = (TimeQuery() >= T0 + timedelta(hours=10)) & (
        TimeQuery() <= T0 + timedelta(hours=15)
    )
    plan = plan_of(pq_db.search_df(q))
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters")[1][:300]
    assert "pdate" in part


def test_measurement_filter_prunes_partitions(pq_db):
    q = MeasurementQuery() == "weather"
    plan = plan_of(pq_db.search_df(q))
    assert "PartitionFilters" in plan
    assert "measurement" in plan.split("PartitionFilters")[1][:200]


def test_parity_predicates_stay_jvm_side(pq_db):
    # No Python evaluation anywhere in a compiled query-algebra plan:
    # tag/field/measurement/time predicates must be pure Catalyst.
    q = (
        (TagQuery().city == "LA")
        & (FieldQuery().t >= 5)
        & ~(FieldQuery().missing == 1)
        & (MeasurementQuery().matches("w.*"))
    )
    plan = plan_of(pq_db.search_df(q))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_udf_query_isolates_nonudf_conjuncts(pq_db):
    # .test() forces a Python UDF, but the sibling measurement conjunct
    # must still prune partitions (Catalyst splits conjunctions).
    q = (MeasurementQuery() == "weather") & (
        FieldQuery().t.test(lambda v: v is not None and v > 3)
    )
    plan = plan_of(pq_db.search_df(q))
    assert "BatchEvalPython" in plan  # the UDF is there...
    after = plan.split("PartitionFilters")[1][:200]
    assert "measurement" in after  # ...and pruning still happened


def test_dimension_join_broadcasts(spark):
    import __spark_entry__ as em

    plan = plan_of(em.q14_region_revenue(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_projection_prunes_columns(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.select("l_orderkey").where(F.col("l_quantity") > 10)
    plan = plan_of(df)
    # ReadSchema carries only the two needed columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_whole_stage_codegen_covers_agg(spark):
    import __spark_entry__ as em

    df = em.q11_agg_pricing_summary(spark, "/root/testdata/sf0.001")
    df.collect()  # AQE only finalizes (and codegens) the plan on execution
    plan = plan_of(df)
    # formatted mode marks codegen spans as "[codegen id : N]"
    assert "codegen id" in plan
    # both the partial and final HashAggregate are inside codegen stages
    assert "HashAggregate [codegen id" in plan
