"""As-of (backward) join — an operator Spark lacks natively.

Semantics: for every left row, attach the payload of the most recent right
row with the same key and ``right.ts <= left.ts`` (DuckDB/kdb ``ASOF JOIN``,
pandas ``merge_asof(direction='backward')``).

Implementation is a composition of existing DataFrame ops (SURVEY.md §2
custom-operator rule: prefer composition over UDFs): union both sides
tagged, one window sort per key, ``last(payload, ignorenulls=True)`` over an
unbounded-preceding frame, keep left rows. Cost: ONE shuffle of
|left| + |right| rows on the key — strictly cheaper than the naive
range-join (broadcast + filter + max-per-left-row) and never quadratic.
Right rows sort before left rows at equal timestamps, so an exactly
simultaneous right row is matched (ASOF's ``<=``).

At 100 TB: the window partitions by join key — skewed keys (one user with
billions of events) are the hazard; mitigate by pre-bucketing both inputs
on the key so the sort is local, or salt + two-phase as-of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    out_prefix: str = "asof_",
) -> DataFrame:
    """Attach the latest right payload at-or-before each left row's ``ts``.

    ``left`` keeps all its columns; payload columns arrive as
    ``{out_prefix}{col}`` (NULL when no right row precedes). The right side
    should be unique per (key, ts) — dedupe upstream if it is not, or the
    matched payload is ambiguous.
    """
    l_tag = left.withColumn("_asof_side", F.lit(1)).withColumn(
        "_asof_payload",
        F.lit(None).cast(
            "struct<"
            + ", ".join(
                f"{c}: {dict(right.dtypes)[c]}" for c in payload_cols
            )
            + ">"
        ),
    )
    # A NULL-ts right row would sort before every left row (asc = nulls
    # first) and leak its payload as "preceding" data to the whole key —
    # a NULL timestamp can never satisfy right.ts <= left.ts, so drop it.
    r_tag = right.filter(F.col(ts).isNotNull()).select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_asof_side"),
        F.struct(*payload_cols).alias("_asof_payload"),
    )
    # align schemas: right rows carry NULL for every left-only column
    for c, t in left.dtypes:
        if c not in (key, ts):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(t))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    w = (
        Window.partitionBy(key)
        .orderBy(F.asc(ts), F.asc("_asof_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("_asof_side") == 1)
    for c in payload_cols:
        out = out.withColumn(f"{out_prefix}{c}", F.col(f"_asof_match.{c}"))
    return out.drop("_asof_side", "_asof_payload", "_asof_match")
