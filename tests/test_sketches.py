"""Error bounds for the sketch-aggregate profile (HLL++, approx quantiles).

Sketches trade exactness for constant memory and mergeability — the right
trade at 100 TB. They can't be hash-gated against DuckDB (estimates are
engine-specific), so we bound them against the exact answers instead.
"""

from one_one_one_rule_spark.queries import QUERIES
from one_one_one_rule_spark.sources.fixtures import load_table

import pyspark.sql.functions as F


def test_sketch_profile_bounds(spark, sf_dir):
    """Raw-estimate error bounds (the gate query now emits the bounds as
    hashed booleans; this keeps the underlying sketch values themselves
    under direct test)."""
    e = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        )
        .collect()
    }
    exact = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").alias("users"),
            F.expr(
                "percentile(value, array(0.25, 0.75))"
            ).alias("p25_p75"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, row in got.items():
        ex = exact[et]
        # HLL++ rsd=0.02 → allow 5 sigma plus integer slack on tiny sets
        tol = max(2, 0.10 * ex.users)
        assert abs(row.approx_users - ex.users) <= tol, (et, row, ex)
        p25, p75 = ex.p25_p75
        assert p25 <= row.approx_p50 <= p75, (et, row.approx_p50, p25, p75)


def test_sketch_profile_gate_flags_true(spark, sf_dir):
    """Every bound flag in the hash-gated profile row must hold (the
    DuckDB oracle emits literal TRUE, so a false flag is a hash miss —
    this pins the same property in-process)."""
    for r in QUERIES["events_sketch_profile"](spark, sf_dir).collect():
        assert r.hll_within_5sigma is True, r
        assert r.p50_in_exact_iqr is True, r


def test_sketch_profile_is_mergeable_shape(spark, sf_dir):
    # Re-running over a repartitioned input must give the same HLL counts:
    # register-max merge is order- and partitioning-independent.
    e = load_table(spark, sf_dir, "events")
    a = {
        (r.event_type, r.approx_users)
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .collect()
    }
    b = {
        (r.event_type, r.approx_users)
        for r in e.repartition(13, "user_id")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .collect()
    }
    assert a == b
