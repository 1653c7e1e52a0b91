"""2D grid-blocked proximity join (queries_spatial.py) — pair symmetry,
radius bound, and the equi-join (never cartesian/nested-loop) plan shape;
cross-engine values are the oracle gate's job."""

from pyspark.sql import functions as F

from one_one_one_rule_spark.queries import QUERIES
from one_one_one_rule_spark.queries_spatial import GEO_RADIUS


def test_geo_neighbors_symmetry_and_radius(spark, sf_dir):
    df = QUERIES["customer_geo_neighbors"](spark, sf_dir)
    rows = df.collect()
    # neighbor-of is symmetric, so the directed count total is even
    total = sum(r["n_neighbors"] for r in rows)
    assert total % 2 == 0
    assert total > 0, "radius matched nothing at this sf — dead gate"
    for r in rows:
        if r["n_neighbors"] > 0:
            # 0 is legitimate: the two coordinate hashes share modulus
            # GEO_SPAN, so custkeys 100000 apart coincide exactly (first
            # occurs at >= 100001 customers, beyond these fixtures)
            assert 0 <= r["min_d2"] <= GEO_RADIUS * GEO_RADIUS
        else:
            assert r["min_d2"] is None


def test_geo_neighbors_plan_is_equi_join(spark, sf_dir):
    df = QUERIES["customer_geo_neighbors"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_neighbor_pairs_equal_unsalted_on_hot_cell(spark):
    """Round-8 verdict item 3 (2D half): 90% of points in ONE grid cell;
    neighbor_pairs(salt_buckets=8) must return the identical multiset of
    (point, d2) pairs while widening the join key with the salt."""
    import random

    from one_one_one_rule_spark.queries_spatial import neighbor_pairs

    rng = random.Random(13)
    pts = []
    for i in range(400):
        if i % 10 < 9:  # hot cell: the first r x r square
            pts.append((i, rng.randrange(0, GEO_RADIUS),
                        rng.randrange(0, GEO_RADIUS)))
        else:
            pts.append((i, rng.randrange(0, 100_000),
                        rng.randrange(0, 100_000)))
    p = spark.createDataFrame(pts, "c_custkey long, x long, y long")
    plain = sorted(
        (r["c_custkey"], r["d2"])
        for r in neighbor_pairs(p, GEO_RADIUS).collect()
    )
    salted_df = neighbor_pairs(p, GEO_RADIUS, salt_buckets=8)
    salted = sorted(
        (r["c_custkey"], r["d2"]) for r in salted_df.collect()
    )
    assert salted == plain and len(plain) > 1000  # the hot cell is dense
    assert "_salt" in salted_df._jdf.queryExecution().executedPlan().toString()
    # the salt really splits the hot population (operator's own formula)
    shares = (
        p.filter((F.col("x") < GEO_RADIUS) & (F.col("y") < GEO_RADIUS))
        .groupBy(F.pmod(F.hash("c_custkey"), F.lit(8)).alias("s"))
        .count()
        .collect()
    )
    assert len(shares) == 8
    assert max(r["count"] for r in shares) <= 0.35 * sum(
        r["count"] for r in shares
    )
