"""Cleanse stage — reference cleanse_fundamentals (transform_valuation.py:99-149)
as a single lazy DataFrame chain.

Pipeline: normalize ticker (F3) → drop null/empty (P3) → keep-first dedup
(D1, deterministic via explicit order column) → coerce numerics to double
with NaN/±inf→NULL (U6+P5) → non-positive price/market_cap→NULL (P4) →
sector fill (P6).

Scale notes (100 TB): the only shuffle here is the dedup's hash partition by
ticker; everything else is a narrow projection that fuses into one
whole-stage-codegen pass over the scan. With AQE on, skewed ticker keys are
split automatically. If the source is already bucketed/partitioned by ticker
the shuffle is elided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cleansing import (
    fill_unknown,
    normalize_symbol,
    null_if_nonpositive,
    to_clean_double,
)
from ..schemas import SNAPSHOT_NUMERIC_COLS


def keep_first_dedup(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """D1 — deterministic keep-first dedup.

    pandas ``drop_duplicates(keep='first')`` (transform_valuation.py:113) is
    order-sensitive; Spark's ``dropDuplicates`` keeps an arbitrary row, so we
    pin the reference semantics with row_number over an explicit order column.
    One shuffle on ``keys``; map-side nothing to combine (row_number needs the
    full group), but groups are tiny (duplicate tickers), so this is safe at
    any scale.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def cleanse_fundamentals(
    df: DataFrame,
    order_col: str | None = None,
    numeric_cols: list[str] | None = None,
) -> DataFrame:
    """Full cleanse stage over a raw fundamentals snapshot.

    ``order_col``: column defining "first" for the keep-first dedup (the
    reference's fetch order). When None, a monotonically increasing id is
    used — deterministic only for single-partition or already-ordered input,
    so callers that need oracle parity must pass a real key.
    """
    numeric_cols = numeric_cols or [c for c in SNAPSHOT_NUMERIC_COLS if c in df.columns]

    synthetic_order = order_col is None
    if synthetic_order:
        order_col = "__src_order"
        df = df.withColumn(order_col, F.monotonically_increasing_id())

    df = df.withColumn("ticker", normalize_symbol("ticker"))
    df = df.filter(F.col("ticker").isNotNull() & (F.col("ticker") != ""))
    df = keep_first_dedup(df, ["ticker"], order_col)

    casts = {c: to_clean_double(c).alias(c) for c in numeric_cols}
    df = df.withColumns(casts)

    if "price" in df.columns:
        df = df.withColumn("price", null_if_nonpositive("price"))
    if "market_cap" in df.columns:
        df = df.withColumn("market_cap", null_if_nonpositive("market_cap"))
    if "sector" in df.columns:
        df = df.withColumn("sector", fill_unknown("sector"))

    if synthetic_order:
        df = df.drop(order_col)
    return df
