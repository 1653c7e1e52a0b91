"""Scale-safe range join: value-vs-interval matching via bucketed equi-join.

The reference has no range joins (SURVEY.md §2.4), but a banded/range join is
a core general-surface operator (value→tier lookup, time→window attribution,
IP→geo ranges). The naive formulation — a theta join ``lo <= v AND v < hi`` —
is a broadcast-nested-loop in Spark: every fact row is tested against every
band, O(|fact|·|bands|), and with a large band table it degenerates to a
cartesian product. This module implements the standard scale shape instead:

1. Pick a fixed bucket width ``W`` and a bucket cap ``B`` (everything at or
   beyond ``B*W`` shares the tail bucket, so open-ended/huge top bands don't
   explode).
2. Explode each band interval ``[lo, hi)`` into the coarse buckets it
   overlaps — ``floor(lo/W) .. min(floor((hi-ulp)/W), B)`` — a tiny,
   broadcastable relation (bands × avg buckets-per-band rows).
3. Equi-join fact rows on ``bucket = least(floor(v/W), B)`` — a broadcast
   hash join, never a shuffle of the fact side — then apply the exact
   residual predicate ``lo <= v AND v < hi``.

The equi-join prunes candidates to the bands overlapping the row's bucket
(≥1, usually 1-2), so the per-row work is O(bands overlapping its bucket)
instead of O(all bands). The same trick with both sides exploded is the
standard interval-overlap join; here the fact side is a point so one
explode suffices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_band_buckets(
    bands: DataFrame,
    lo: str = "lo",
    hi: str = "hi",
    width: float = 10.0,
    max_bucket: int = 100,
) -> DataFrame:
    """Band dimension → (band*, bucket) relation: one row per coarse bucket
    the half-open interval ``[lo, hi)`` overlaps, tail-capped at
    ``max_bucket``. ``hi`` is exclusive, so the last covered bucket is the
    one containing ``hi - ulp`` — computed as ``floor((hi*(1-eps))/W)``
    which is exact for the integer-valued band bounds used here."""
    first = F.least(
        F.floor(F.col(lo) / F.lit(width)), F.lit(max_bucket)
    ).cast("long")
    last = F.least(
        F.floor((F.col(hi) - F.lit(1e-9)) / F.lit(width)), F.lit(max_bucket)
    ).cast("long")
    return bands.withColumn("bucket", F.explode(F.sequence(first, last)))


def point_bucket(
    v: Column, width: float = 10.0, max_bucket: int = 100
) -> Column:
    """The coarse bucket of a point value (tail-capped)."""
    return F.least(F.floor(v / F.lit(width)), F.lit(max_bucket)).cast("long")


def bucketed_range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo: str = "lo",
    hi: str = "hi",
    width: float = 10.0,
    max_bucket: int = 100,
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the band(s) whose ``[lo, hi)`` interval
    contains ``value_col`` — as a broadcast equi-join on the coarse bucket
    plus the exact residual predicate (never a nested-loop theta join).

    Rows with NULL value match nothing (residual is NULL), mirroring SQL
    ``BETWEEN`` semantics.
    """
    b = explode_band_buckets(bands, lo, hi, width, max_bucket)
    f = fact.withColumn(
        "_rj_bucket", point_bucket(F.col(value_col), width, max_bucket)
    )
    cond = (
        (f["_rj_bucket"] == b["bucket"])
        & (f[value_col] >= b[lo])
        & (f[value_col] < b[hi])
    )
    return f.join(F.broadcast(b), cond, how).drop("_rj_bucket", "bucket")
