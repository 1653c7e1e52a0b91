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
