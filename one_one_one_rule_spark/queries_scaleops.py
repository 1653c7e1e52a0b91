"""Scale-technique operators as first-class gated queries.

Currently: Bloom-filter semi-join reduction (operators/bloomjoin.py) —
runtime filtering of a fact-table scan by a compact filter built from a
runtime-filtered dimension, the manual form of the pre-shuffle join
reduction a 100 TB join pipeline leans on when the optimizer can't inject
it (cross-source joins, pre-aggregated build sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.numeric import decimal_sum
from .queries import register
from .sources.fixtures import load_table


@register(
    "lineitem_bloom_semijoin",
    """
WITH picked AS (
  SELECT o_orderkey, o_orderpriority FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN picked ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def lineitem_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by priority over lineitems of urgent/high orders, with the
    lineitem side Bloom-reduced BEFORE the join shuffle
    (operators/bloomjoin.py:bloom_semi_reduced_join).

    The oracle is the PLAIN join — the Bloom filter is semantics-free by
    construction (no false negatives; false positives die in the real
    join), so the hash gate proves the reduction preserves the result
    exactly. Plan shape: distributed 8 KB bitmap build (bounded driver
    collect of <=1024 words), probe-side membership test inside the scan
    stage, then the usual shuffled join + combinable aggregate on the
    ~2/5-selectivity survivor stream."""
    l = load_table(spark, sf_dir, "lineitem")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )
    from .operators.bloomjoin import bloom_semi_reduced_join

    j = bloom_semi_reduced_join(l, "l_orderkey", o, "o_orderkey")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        decimal_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
    )


@register(
    "events_hll_partitioned_rollup",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS two_level_equals_one_level,
       TRUE AS hll_within_5sigma
FROM events
GROUP BY event_type
""",
)
def events_hll_partitioned_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable-sketch rollup ALGEBRA — the property that makes sketch
    cubes materializable: per-day HyperLogLog sketches union to exactly
    the sketch of the whole (register-wise max commutes with any
    partitioning), so a 100 TB pipeline can keep daily sketch rollups
    and answer month/quarter/all-time distincts by UNIONING sketches —
    never rescanning the fact table.

    Gated in the events_sketch_profile style: the estimates are
    engine-specific, so the hashed row carries booleans — (a) the
    two-level estimate (daily hll_sketch_agg -> hll_union_agg) EQUALS the
    one-level estimate over the raw stream, which is the merge-exactness
    property itself, and (b) the estimate lands within 5 sigma of the
    exact distinct count (exact side is gate-scale verification only;
    production keeps just the sketch path)."""
    e = load_table(spark, sf_dir, "events")
    lgk = F.lit(14)
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id", lgk).alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    two = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("two_level"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    one = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", lgk)).alias(
            "one_level"
        ),
        F.count_distinct("user_id").cast("bigint").alias("exact_users"),
    )
    sigma = 0.02 * F.col("exact_users").cast("double")
    return (
        two.join(one, "event_type")
        .select(
            "event_type",
            "n_events",
            "exact_users",
            (F.col("two_level") == F.col("one_level")).alias(
                "two_level_equals_one_level"
            ),
            (
                F.abs(
                    F.col("two_level").cast("double")
                    - F.col("exact_users").cast("double")
                )
                <= F.greatest(F.lit(2.0), 5.0 * sigma)
            ).alias("hll_within_5sigma"),
        )
    )
