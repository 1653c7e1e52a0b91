"""Spatial-join tier (registry extension): 2D proximity join via grid
blocking — the planar generalization of the 1D time-grid interval join
(operators/intervals.py), and the operator class behind geo enrichment,
store-catchment assignment, and spatial dedup at warehouse scale. Spark
has no native spatial join; the naive spelling is a cartesian with a
distance residual. The scale shape is the classic cell trick: hash every
point to a square cell of side = the query radius, explode the PROBE
side to its 3x3 cell neighborhood, equi-join on the cell id (each
candidate pair arises in exactly ONE cell — the build point's own — so
no dedup pass is needed), and verify the exact distance predicate on the
equi-join's residual.

Coordinates are synthesized deterministically from the customer key
(multiplicative-hash lattice — the same synthesize-don't-ship convention
as the multimodal tier's PNG/WAV payloads), and the distance test is
PURE INTEGER (dx^2 + dy^2 <= r^2): no sqrt, no float, hash-exact on any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .sources.fixtures import load_table

#: Coordinate lattice: integer grid 0..99999 in both axes, derived from
#: c_custkey by two independent multiplicative hashes.
GEO_SPAN = 100_000
GEO_MULT_X = 2654435761
GEO_MULT_Y = 40503
#: Query radius and (equal) grid cell side — cell = r makes the 3x3
#: neighborhood sufficient and minimal.
GEO_RADIUS = 5_000


def neighbor_pairs(
    p: DataFrame, r: int, salt_buckets: int = 1
) -> DataFrame:
    """(c_custkey, d2) for every ordered point pair within radius ``r``:
    build side keyed by its own cell (x div r, y div r), probe side
    exploded to the 3x3 cell neighborhood (clamped to the lattice — the
    off-grid edge cells can never match, so generating them is pure
    explode/shuffle overhead), ONE hash equi-join on the composite cell
    id, integer d^2 <= r^2 residual. ``p`` must carry (c_custkey, x, y).

    ``salt_buckets > 1`` is the pathological-hot-cell escape hatch (the
    2D analogue of overlap_join_grid's): probe rows take a deterministic
    key-hash salt, build rows replicate ``salt_buckets`` ways, the join
    key widens to (cx, cy, salt) — a hot cell's pair volume splits
    across ``salt_buckets`` reducers, results identical (each candidate
    pair still meets in exactly one cell and one salt).
    """
    if salt_buckets < 1:
        raise ValueError(
            f"salt_buckets must be a positive integer, got {salt_buckets!r}"
        )
    build = p.select(
        F.col("c_custkey").alias("nb"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.expr(f"x div {r}").alias("cx"),
        F.expr(f"y div {r}").alias("cy"),
    )
    max_cell = (GEO_SPAN - 1) // r
    probe = p.select(
        "c_custkey",
        "x",
        "y",
        F.explode(
            F.sequence(
                F.greatest(F.expr(f"x div {r}") - 1, F.lit(0)),
                F.least(F.expr(f"x div {r}") + 1, F.lit(max_cell)),
            )
        ).alias("cx"),
    ).select(
        "c_custkey",
        "x",
        "y",
        "cx",
        F.explode(
            F.sequence(
                F.greatest(F.expr(f"y div {r}") - 1, F.lit(0)),
                F.least(F.expr(f"y div {r}") + 1, F.lit(max_cell)),
            )
        ).alias("cy"),
    )
    join_keys = ["cx", "cy"]
    if salt_buckets > 1:
        probe = probe.withColumn(
            "_salt", F.pmod(F.hash("c_custkey"), F.lit(salt_buckets))
        )
        build = build.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        )
        join_keys = ["cx", "cy", "_salt"]
    d2 = (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx")) + (
        F.col("y") - F.col("by")
    ) * (F.col("y") - F.col("by"))
    return (
        probe.join(build, join_keys)
        .filter((F.col("c_custkey") != F.col("nb")) & (d2 <= r * r))
        .select("c_custkey", d2.alias("d2"))
    )


#: ONE literal oracle for both the unsalted gate and its salted twin —
#: the salted path must be hash-identical, so it earns the SAME oracle,
#: not a re-derivation (the established salted-pair pattern from the
#: window/as-of/interval tiers).
GEO_NEIGHBORS_ORACLE_SQL = f"""
WITH p AS (
  SELECT c_custkey,
         (c_custkey * {GEO_MULT_X}) % {GEO_SPAN} AS x,
         (c_custkey * {GEO_MULT_Y}) % {GEO_SPAN} AS y
  FROM customer
),
ov AS (
  SELECT a.c_custkey,
         b.c_custkey AS nb,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM p a JOIN p b
    ON a.c_custkey <> b.c_custkey
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
       <= {GEO_RADIUS * GEO_RADIUS}
)
SELECT p.c_custkey, CAST(p.x AS BIGINT) AS x, CAST(p.y AS BIGINT) AS y,
       CAST(COUNT(ov.nb) AS BIGINT) AS n_neighbors,
       CAST(MIN(ov.d2) AS BIGINT) AS min_d2
FROM p LEFT JOIN ov ON p.c_custkey = ov.c_custkey
GROUP BY p.c_custkey, p.x, p.y
"""


@register("customer_geo_neighbors", GEO_NEIGHBORS_ORACLE_SQL)
def customer_geo_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D proximity join, grid-blocked: every customer point annotated
    with how many other customers sit within radius r on the hash
    lattice, plus the exact squared distance to the nearest one.

    The plan is the spatial-join scale shape: build side keyed by its
    own cell (x div r, y div r), probe side exploded to the 3x3 cell
    neighborhood (a fixed x9 fan-out — the 2D analogue of the interval
    join's len/cell+1), ONE hash equi-join on the composite cell id,
    integer distance residual, then a combinable per-point aggregate
    and a keyed join back for the zero-neighbor points. No
    cartesian, no nested loop (plan-gated); hot cells are ordinary
    equi-join skew — the same AQE-split behavior proven for the 1D grid
    in tests/test_intervals.py. The oracle is the literal
    distance-filtered self-join.

    At 100 TB: candidate volume is 9 x points-per-cell per probe — set
    the cell to the query radius and it tracks local density, never
    N^2; the composite cell id also serves as the layout key (this IS
    the geohash-bucketing a spatial warehouse persists)."""
    return _geo_neighbors(spark, sf_dir, salt_buckets=1)


@register("customer_geo_neighbors_salted", GEO_NEIGHBORS_ORACLE_SQL)
def customer_geo_neighbors_salted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hot-cell-proof twin of customer_geo_neighbors: same lattice, same
    radius, same aggregate, but neighbor_pairs runs with salt_buckets=8 —
    probe rows take a deterministic key-hash salt, build rows replicate
    8 ways, and the join key widens to (cx, cy, salt), so one
    pathologically dense cell's pair volume splits across 8 reducers
    instead of landing on one. Gated against the SAME literal
    distance-join oracle as the unsalted gate (the salted-pair pattern
    already proven for the window top-k, as-of, and interval tiers):
    identical hashes are the claim, the 8-way shuffle shape is the point.

    At 100 TB: a uniform lattice never needs this, but real geo data has
    city-center cells 1000x denser than the median — the salt bounds the
    worst reducer by density/8 at the cost of an 8x build-side replicate
    (build rows are 5 ints; the replicate is cheap next to the pair
    volume it splits)."""
    return _geo_neighbors(spark, sf_dir, salt_buckets=8)


def _geo_neighbors(
    spark: SparkSession, sf_dir: str, salt_buckets: int
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    p = c.select(
        "c_custkey",
        ((F.col("c_custkey") * GEO_MULT_X) % GEO_SPAN).alias("x"),
        ((F.col("c_custkey") * GEO_MULT_Y) % GEO_SPAN).alias("y"),
    ).localCheckpoint(eager=True)
    pairs = neighbor_pairs(p, GEO_RADIUS, salt_buckets=salt_buckets)
    agg = pairs.groupBy("c_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_neighbors"),
        F.min("d2").cast("bigint").alias("min_d2"),
    )
    # NO broadcast hint: agg is corpus-linear (one row per customer with
    # neighbors) — the join shuffles on the key; AQE may still choose a
    # broadcast at small scale on measured size
    return p.join(agg, "c_custkey", "left").select(
        "c_custkey",
        F.col("x").cast("bigint").alias("x"),
        F.col("y").cast("bigint").alias("y"),
        F.coalesce("n_neighbors", F.lit(0)).cast("bigint").alias(
            "n_neighbors"
        ),
        F.col("min_d2").cast("bigint").alias("min_d2"),
    )
