"""Interval overlap join — grid-blocked, never cartesian.

Spark has no native interval (range-overlap) join: the naive spelling
``a JOIN b ON a.start <= b.end AND b.start <= a.end`` has no equi-key, so
Catalyst plans BroadcastNestedLoopJoin (fine only when one side is tiny)
or a cartesian product (never fine). The classic distributed answer is
GRID BLOCKING (the same family as DuckDB's IEJoin alternative and the
spatial-join bin trick): overlay a fixed cell grid on the time axis,
explode every interval to the cells it touches, equi-join on the cell id,
and keep each qualifying pair exactly once by crediting it ONLY to the
cell containing the later of the two start points.

Cost model: explode volume is ``len(interval)/cell + 1`` rows per
interval; the join is a plain hash equi-join on the cell id. Pick the
cell near the median interval length — too small inflates the explode,
too large packs unrelated intervals into one cell (the degenerate case is
one cell = the cartesian). Hot cells (everyone online at the same hour)
are ordinary hash-join skew: AQE skew-split handles moderate cases, and a
cell-id salt on the build side handles pathological ones — the same
mitigations as any skewed equi-join, which is the point of reducing to
one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlap_join_grid(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    cell: int,
    salt_buckets: int = 1,
) -> DataFrame:
    """All (left, right) pairs whose CLOSED integer intervals overlap:
    ``l_start <= r_end AND r_start <= l_end``.

    Start/end columns must be integral (e.g. microsecond epochs) with
    ``start <= end`` on every row; ``cell`` is the grid width in the same
    unit. Output carries every column of both inputs (names must not
    collide) — exactly one row per qualifying pair, any partitioning.

    Binning note: ``x - x % cell`` truncates toward zero (Spark ``%``
    takes the dividend's sign), so for negative coordinates the bins are
    uneven around zero — still CORRECT (the bin function is monotone and
    identical on both sides, every multiple of ``cell`` between two bins
    is generated, so the anchor bin always matches), just mildly
    unbalanced for data straddling zero; epoch timestamps never do.

    ``salt_buckets > 1`` is the PATHOLOGICAL-skew escape hatch the module
    docstring names (everyone online in the same hour = one cell holding
    most of both sides; AQE's skew split only subdivides the STREAM side
    of a sort-merge pair, and a broadcast plan is immune but single-cell
    density can exceed any sane broadcast). Left rows take a
    deterministic row-hash salt, right rows replicate ``salt_buckets``
    ways, the join key widens to (cell, salt): the hot cell's pair volume
    splits across ``salt_buckets`` reducers at the cost of a
    ``salt_buckets``x replication of the RIGHT explode — so salt with the
    smaller side on the right. Results are identical (each qualifying
    pair still arises in exactly one cell and exactly one salt).
    """
    if cell < 1:
        # a zero step would only surface as an executor-side sequence()
        # error three stages in; negative cells break the bin arithmetic
        # the exactly-once credit depends on
        raise ValueError(f"cell must be a positive integer, got {cell!r}")
    shared = set(left.columns) & set(right.columns)
    if shared:
        # the post-join filter resolves l_start/r_start/l_end/r_end with
        # plain F.col — a shared name would surface as AMBIGUOUS_REFERENCE
        # three stages in (or bind to the wrong side on older Spark), so
        # enforce the documented no-collision precondition at the call site
        raise ValueError(
            "left/right column names must not collide, shared: "
            f"{sorted(shared)}"
        )
    if salt_buckets < 1:
        raise ValueError(
            f"salt_buckets must be a positive integer, got {salt_buckets!r}"
        )
    lc = left.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.col(l_start).cast("bigint") - (F.col(l_start).cast("bigint") % cell),
                F.col(l_end).cast("bigint") - (F.col(l_end).cast("bigint") % cell),
                F.lit(cell),
            )
        ),
    )
    rc = right.withColumn(
        "_rcell",
        F.explode(
            F.sequence(
                F.col(r_start).cast("bigint") - (F.col(r_start).cast("bigint") % cell),
                F.col(r_end).cast("bigint") - (F.col(r_end).cast("bigint") % cell),
                F.lit(cell),
            )
        ),
    )
    if salt_buckets > 1:
        # deterministic row-hash salt on the probe side (uniform over the
        # hot cell's population), full replication on the build side: one
        # replica per salt value, so every pair meets exactly once
        lc = lc.withColumn(
            "_salt",
            F.pmod(F.hash(*[F.col(c) for c in left.columns]),
                   F.lit(salt_buckets)),
        )
        rc = rc.withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
        )
        on = (lc["_cell"] == rc["_rcell"]) & (lc["_salt"] == rc["_salt"])
        drop_cols = ["_cell", "_rcell", "_salt"]
    else:
        on = lc["_cell"] == rc["_rcell"]
        drop_cols = ["_cell", "_rcell"]
    # the dedup invariant: a pair overlaps in possibly many cells, but the
    # cell containing max(l_start, r_start) is unique and always one of
    # them (the later start lies inside BOTH intervals, hence inside both
    # explode ranges)
    anchor = F.greatest(F.col(l_start), F.col(r_start)).cast("bigint")
    return (
        lc.join(rc, on)
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_cell") == anchor - (anchor % cell))
        )
        .drop(*drop_cols)
    )
