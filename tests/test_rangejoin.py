"""Bucketed range join (operators/rangejoin.py) — edge semantics and plan
shape: half-open boundaries, NULL values, tail-bucket capping, and the
broadcast-hash (not nested-loop) physical join."""

import pytest
from pyspark.sql import functions as F

from one_one_one_rule_spark.operators.rangejoin import (
    bucketed_range_join,
    explode_band_buckets,
    point_bucket,
)

BANDS = [
    ("micro", 0.0, 10.0),
    ("small", 10.0, 50.0),
    ("large", 100.0, 1000.0),  # gap [50, 100) on purpose
]


@pytest.fixture(scope="module")
def bands(spark):
    return spark.createDataFrame(BANDS, "band string, lo double, hi double")


def test_band_bucket_explosion(spark, bands):
    rows = {
        (r.band, r.bucket)
        for r in explode_band_buckets(bands, width=10.0, max_bucket=10).collect()
    }
    assert ("micro", 0) in rows
    # [10, 50) covers buckets 1..4, NOT bucket 5 (hi exclusive)
    assert {b for (n, b) in rows if n == "small"} == {1, 2, 3, 4}
    # [100, 1000) collapses to the capped tail bucket only
    assert {b for (n, b) in rows if n == "large"} == {10}


def test_boundary_null_and_gap_semantics(spark, bands):
    facts = spark.createDataFrame(
        [(0.0,), (9.99,), (10.0,), (49.99,), (50.0,), (99.99,), (100.0,),
         (999.99,), (1000.0,), (None,)],
        "value double",
    )
    joined = bucketed_range_join(
        facts, bands, "value", width=10.0, max_bucket=10
    ).select("value", "band")
    got = {(r.value, r.band) for r in joined.collect()}
    assert got == {
        (0.0, "micro"),      # lo inclusive
        (9.99, "micro"),
        (10.0, "small"),     # hi exclusive -> next band
        (49.99, "small"),
        (100.0, "large"),    # tail-capped bucket still matches exactly
        (999.99, "large"),
        # 50.0, 99.99 fall in the band gap; 1000.0 >= hi; NULL matches nothing
    }


def test_point_bucket_tail_cap(spark):
    df = spark.range(1).select(
        point_bucket(F.lit(5.0), 10.0, 10).alias("a"),
        point_bucket(F.lit(105.0), 10.0, 10).alias("b"),
        point_bucket(F.lit(1e9), 10.0, 10).alias("c"),
    )
    r = df.collect()[0]
    assert (r.a, r.b, r.c) == (0, 10, 10)


def test_plan_is_broadcast_hash_join(spark, bands):
    facts = spark.range(100).select((F.col("id") * 7.7).alias("value"))
    plan = bucketed_range_join(
        facts, bands, "value", width=10.0, max_bucket=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
