"""Grouped-agg pandas UDAFs — the custom vectorized AGGREGATE surface.

These are the engine's only aggregate-side Python UDFs, reserved for
order-statistic aggregates Spark has no built-in for, and only over
groups whose cardinality is BOUNDED BY SCHEMA (see
queries.py:orders_trimmed_mean_udaf for the scale contract).

pandas/numpy are imported at module level — grouped-agg ``pandas_udf``
resolves the ``pd.Series`` annotation through the function's module
globals, so a function-local import would leave the hint unresolvable
(PySpark raises UNSUPPORTED_SIGNATURE). The UDFs themselves are built
lazily through factories so importing this module never touches Spark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def trimmed_sum_udaf():
    """Σ of the values that survive trimming floor(n/4) from each end of
    the value-sorted group — tie-safe (the kept multiset is unique even
    when duplicates straddle the trim boundary)."""

    @pandas_udf("bigint")
    def trimmed_cents_sum(c: pd.Series) -> int:
        a = np.sort(c.to_numpy())
        k = len(a) // 4
        return int(a[k : len(a) - k].sum())

    return trimmed_cents_sum


def group_count_udaf():
    """len(group) as a pandas UDAF: built-in aggregates cannot be mixed
    with grouped-agg pandas UDFs in a single ``agg()``, so the group
    size rides the same shuffle as its sibling UDAF instead of costing
    a second aggregation + join."""

    @pandas_udf("bigint")
    def group_n(c: pd.Series) -> int:
        return len(c)

    return group_n
