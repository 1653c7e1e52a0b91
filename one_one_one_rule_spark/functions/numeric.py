"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent; at cluster scale partial-aggregate
merge order is nondeterministic, so two runs (or two engines) can differ in
the last ulps. Routing the summation through an exact decimal makes it
associative — identical under any partitioning — and exactly reproducible by
the DuckDB oracle (which applies the same cast). Cast back to double for a
stable, engine-neutral output type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL = "decimal(38,6)"


def decimal_sum(col: Column) -> Column:
    """SUM via exact decimal(38,6): deterministic at any scale/partitioning."""
    return F.sum(col.cast(DECIMAL)).cast("double")


def decimal_avg(col: Column) -> Column:
    """AVG as exact-decimal SUM / COUNT(col) — both engine-deterministic."""
    return F.sum(col.cast(DECIMAL)).cast("double") / F.count(col)


def int_avg(col: Column) -> Column:
    """AVG over integral input: exact integer SUM / COUNT(col)."""
    return F.sum(col).cast("double") / F.count(col)
