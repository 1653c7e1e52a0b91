"""Skew-resistant operator shapes.

A plain ``row_number().over(partitionBy(key))`` ships EVERY row of a hot
key to one reducer — at 100 TB a single key with billions of rows
serializes the stage. ``salted_topk_per_key`` is the two-phase form:

  phase 1: rank within (key, salt) where salt = the input partition id —
           free (no hash), locally computed, bounded output k rows per
           (key, salt);
  phase 2: rank the surviving ≤ k·#partitions candidates per key.

The final shuffle carries at most k rows per input partition per key
instead of the full key population. Results are identical to the naive
window for any total-order tiebreak (the global top-k of a union of
per-partition top-ks is the global top-k, since each partition retains
every row that could survive phase 2).

Salting for skewed JOINS is delegated to AQE
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) which splits
oversized partitions at runtime; aggregates with algebraic functions are
already two-phase (partial/final) in Spark's hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topk_per_key(
    df: DataFrame,
    key: str,
    order: list[Column],
    k: int,
    out_rank: str = "rn",
) -> DataFrame:
    """Top-k rows per key, hot-key-proof. ``order`` must be a total order
    (include a unique tiebreak column) or ranks are nondeterministic."""
    w1 = Window.partitionBy(key, "_salt").orderBy(*order)
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("_salt", F.spark_partition_id())
        .withColumn("_prank", F.row_number().over(w1))
        .filter(F.col("_prank") <= k)
        .withColumn(out_rank, F.row_number().over(w2).cast("bigint"))
        .filter(F.col(out_rank) <= k)
        .drop("_salt", "_prank")
    )


def exact_heavy_hitters(
    items: DataFrame, col: str, theta: float = 0.002
) -> DataFrame:
    """Exact heavy hitters (items with global frequency ≥ ``theta`` of all
    rows) without ever shuffling the full key space.

    A plain groupBy-HAVING shuffles one partial aggregate per DISTINCT key
    — fine for user ids, ruinous for open vocabularies (n-grams at 100 TB:
    billions of keys, almost all singletons). Two phases:

      phase 1 (candidates): per input partition, exact local counts via
        ``mapInPandas`` (never leaves the partition); keep keys with local
        fraction ≥ theta. If a key's GLOBAL fraction ≥ theta then by
        averaging some partition sees local fraction ≥ theta, so the
        candidate union is a superset of every true heavy hitter (a 1-row
        slack absorbs float-threshold rounding). Output is bounded by
        ≤ ⌈1/theta⌉ keys per partition.
      phase 2 (exact verify): broadcast the candidate set, semi-join the
        stream, and exactly count ONLY candidate keys — the shuffle
        carries ≤ #partitions/theta keys, independent of vocabulary size.
        The global row count rides along as a broadcast 1-row aggregate
        (same pattern as the global-median fallback J2), so no driver
        action anywhere.

    False positives from phase 1 are eliminated by the exact phase-2
    filter, so the result is EXACTLY ``HAVING count >= theta * n`` — fully
    SQL-oracle-checkable, unlike sketch-based heavy hitters."""

    def local_candidates(batches):
        import pandas as pd
        from collections import Counter

        cnt: Counter = Counter()
        total = 0
        for pdf in batches:
            total += len(pdf)
            cnt.update(pdf[col])
        thresh = theta * total - 1  # slack: superset under float rounding
        yield pd.DataFrame({col: [k for k, c in cnt.items() if c >= thresh]})

    cands = items.mapInPandas(local_candidates, f"{col} string").distinct()
    total = items.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        items.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.lit(theta) * F.col("n").cast("double"))
        .select(col, "cnt")
    )


# Portable count-min-sketch hash family: a_r * (key mod P) + b_r mod P
# mod width, with P = 2^31 - 1 (the engine-wide portable hash modulus,
# functions/text.py:HASH_P). Seeds are fixed odd multipliers (Knuth /
# xxhash primes reduced mod P) so the DuckDB oracle reproduces every
# cell address bit-for-bit.
CMS_P = 2147483647
CMS_SEEDS = (
    (2654435761 % CMS_P, 40503),
    (2246822519 % CMS_P, 3266489917 % CMS_P),
    (3266489917 % CMS_P, 668265263 % CMS_P),
)


def _cms_cell(key: Column, a: int, b: int, width: int) -> Column:
    return F.pmod(F.lit(a) * F.pmod(key, F.lit(CMS_P)) + F.lit(b), F.lit(CMS_P)) % width


def cms_build(df: DataFrame, key: str, width: int = 512) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) of an integer key
    column: ``len(CMS_SEEDS)`` hash rows × ``width`` cells, built as ONE
    map-side-combinable aggregate per row (a union of d cheap projections
    feeding a (r, cell) groupBy whose output is bounded at d*width rows
    regardless of input size — the mergeable-summary property that lets a
    100 TB pipeline keep per-partition / per-day sketches and OR them
    together without rescanning).

    Returns (r, cell, cnt). Point estimate = min over r of the addressed
    cells — an overestimate by construction (collisions only ADD), with
    the classic eps*N / delta guarantees at w = e/eps, d = ln(1/delta)."""
    parts = [
        df.select(
            F.lit(r).alias("r"),
            _cms_cell(F.col(key), a, b, width).alias("cell"),
        )
        for r, (a, b) in enumerate(CMS_SEEDS)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("r", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key: str, width: int = 512
) -> DataFrame:
    """Join-based point lookup: for each candidate key, the min over the d
    sketch rows of its addressed cell. The sketch is bounded at d*width
    rows by construction, so each of the d joins is a legitimate
    broadcast — the fact side streams once. Left joins + coalesce-to-0:
    a candidate key whose addressed cell never appeared in the sketched
    stream gets the correct estimate 0 instead of being silently dropped
    (callers may probe EXTERNAL candidate lists, not just keys drawn from
    the sketched data)."""
    out = keys
    for r, (a, b) in enumerate(CMS_SEEDS):
        sk = sketch.filter(F.col("r") == r).select(
            F.col("cell").alias(f"cell{r}"), F.col("cnt").alias(f"c{r}")
        )
        out = (
            out.withColumn(f"cell{r}", _cms_cell(F.col(key), a, b, width))
            .join(F.broadcast(sk), f"cell{r}", "left")
            .withColumn(f"c{r}", F.coalesce(F.col(f"c{r}"), F.lit(0)))
        )
    return out.withColumn(
        "cms_est", F.least(*[F.col(f"c{r}") for r in range(len(CMS_SEEDS))])
    ).drop(*[c for r in range(len(CMS_SEEDS)) for c in (f"cell{r}", f"c{r}")])
