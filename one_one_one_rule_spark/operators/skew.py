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
