"""Scale-shape proofs: bucketed co-located joins, partition pruning, and
approximate aggregates — the physical behaviors the 100 TB design leans on,
asserted on real plans and data (not just documented)."""

import pytest
from pyspark.sql import functions as F

from one_one_one_rule_spark.operators.output import write_dated_partition
from one_one_one_rule_spark.sources.fixtures import load_table


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Pre-bucketing both join sides on the key removes the per-query
    shuffle entirely — the plan for bucketed ⋈ bucketed has NO exchange.
    This is the co-located-join strategy for repeated 100 TB fact joins."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").option(
        "path", str(tmp_path / "orders_b")
    ).mode("overwrite").saveAsTable("orders_b")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey").option(
        "path", str(tmp_path / "customer_b")
    ).mode("overwrite").saveAsTable("customer_b")
    # disable auto-broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        # and it still computes the right thing
        n = joined.count()
        plain = orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"]
        ).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_dated_partition_sink_prunes_on_read(spark, sf_dir, tmp_path):
    """S11/D3 at scale: the dated-copy convention as a date-partitioned
    table — a reader filtering on as_of_date must scan ONLY that partition
    (PartitionFilters in the plan, one file read)."""
    base = str(tmp_path / "valuations")
    df = load_table(spark, sf_dir, "orders").limit(100)
    for day in ("2026-01-01", "2026-01-02", "2026-01-03"):
        out = df.withColumn("as_of_date", F.lit(day))
        out.write.mode("append").partitionBy("as_of_date").parquet(base)

    table = spark.read.parquet(base)
    latest = table.filter(F.col("as_of_date") == "2026-01-03")
    plan = latest._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(as_of_date" in plan
    assert latest.count() == 100
    # max-partition discovery itself touches only partition metadata
    days = [str(r[0]) for r in table.select("as_of_date").distinct().collect()]
    assert max(days) == "2026-01-03"


def test_write_dated_partition_roundtrip(spark, sf_dir, tmp_path):
    base = write_dated_partition(
        load_table(spark, sf_dir, "region"), str(tmp_path / "t"), "2026-02-03"
    )
    back = spark.read.parquet(base)
    assert back.filter(F.col("as_of_date") == "2026-02-03").count() == 5


def test_approx_aggregates_track_exact(spark, sf_dir):
    """The 100 TB substitutes: approx_count_distinct (HLL) within 5% of
    exact, percentile_approx within the value range of the exact median.
    These are the forms the engine swaps in when exactness stops being
    affordable (valuate.py exact=False path)."""
    e = load_table(spark, sf_dir, "events")
    row = e.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.percentile_approx("value", 0.5).alias("p50_approx"),
        F.expr("median(value)").alias("p50_exact"),
    ).collect()[0]
    assert abs(row.approx_users - row.exact_users) <= 0.05 * row.exact_users
    lo, hi = sorted([row.p50_exact * 0.9, row.p50_exact * 1.1])
    assert lo <= row.p50_approx <= hi


@pytest.mark.parametrize("n_parts", [1, 4, 13])
def test_decimal_sum_partition_invariant(spark, sf_dir, n_parts):
    """The determinism contract behind every SUM in the engine: exact-
    decimal routing makes aggregate results identical under ANY
    partitioning (functions/numeric.py) — double summation would drift."""
    from one_one_one_rule_spark.functions.numeric import decimal_sum

    l = load_table(spark, sf_dir, "lineitem").repartition(n_parts)
    v = l.agg(
        decimal_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("s")
    ).collect()[0]["s"]
    # pinned value computed once at sf0.01 — any partitioning must match
    ref = spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
        decimal_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("s")
    ).collect()[0]["s"]
    assert v == ref
