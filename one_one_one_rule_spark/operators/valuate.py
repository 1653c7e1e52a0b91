"""Valuation stage — reference apply_valuation (transform_valuation.py:213-309)
as one lazy DataFrame plan.

Physical shape, chosen for 100 TB:
  - sector medians (A1) via groupBy().agg() — partial aggregation map-side,
    result is #sectors rows → broadcast joined back (J1). The fact table is
    NEVER shuffled for the attach; compare Window.partitionBy('sector'),
    which would shuffle every row into #sectors hot partitions.
  - overall medians (A2) via a 1-row agg, attached with a broadcast
    cross join (J2's fillna ≡ coalesce).
  - every per-row formula (F4-F11) is a native Column expression; the whole
    post-join stage is one codegen'd projection.

Exact vs approx median: ``exact=True`` (default) uses F.median — an exact
interpolating percentile, required for duckdb-oracle parity (SURVEY §4).
At extreme scale pass ``exact=False`` for percentile_approx(0.5), which is
single-pass and mergeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_THRESHOLDS, ValuationThresholds
from ..functions import valuation as V


def sector_median_stats(df: DataFrame, exact: bool = True) -> DataFrame:
    """A1 — per-sector exact medians of trailing/forward PE
    (transform_valuation.py:216-219)."""
    med = F.median if exact else (lambda c: F.percentile_approx(c, 0.5))
    return df.groupBy("sector").agg(
        med(F.col("trailing_pe")).alias("sector_median_pe"),
        med(F.col("forward_pe")).alias("sector_median_fpe"),
    )


def overall_median_stats(df: DataFrame, exact: bool = True) -> DataFrame:
    """A2 — global medians (1-row DataFrame)."""
    med = F.median if exact else (lambda c: F.percentile_approx(c, 0.5))
    return df.agg(
        med(F.col("trailing_pe")).alias("overall_median_pe"),
        med(F.col("forward_pe")).alias("overall_median_fpe"),
    )


def apply_valuation(
    df: DataFrame,
    thresholds: ValuationThresholds = DEFAULT_THRESHOLDS,
    exact_median: bool = True,
) -> DataFrame:
    """Compute valuation metrics + classification labels on a cleansed
    fundamentals DataFrame. Adds the same columns as the reference:
    graham_value, peg_ratio (overwritten), peg_ratio_source, sector_median_pe,
    pe_median_used, fair_value, fair_value_source, margin_of_safety, the three
    tri-state checks, valuation_hunter, valuation, pct_diff.
    """
    sector_stats = sector_median_stats(df, exact_median)
    overall = overall_median_stats(df, exact_median)

    out = df.join(F.broadcast(sector_stats), on="sector", how="left").crossJoin(
        F.broadcast(overall)
    )

    eps = F.col("trailing_eps")
    feps = F.col("forward_eps")
    out = out.withColumns(
        {
            "graham_value": V.graham_value(eps, F.col("book_value_per_share")),
            "peg_ratio_source": V.peg_ratio_source(
                F.col("peg_ratio"), F.col("trailing_pe"), F.col("earnings_growth")
            ),
            # peg_ratio overwritten last so the source column above still sees
            # the reported value (reference keeps them in separate passes).
            "peg_ratio": V.peg_ratio(
                F.col("peg_ratio"), F.col("trailing_pe"), F.col("earnings_growth")
            ),
            "pe_median_used": F.coalesce(
                F.col("sector_median_pe"), F.col("overall_median_pe")
            ),
            "fpe_median_used": F.coalesce(
                F.col("sector_median_fpe"), F.col("overall_median_fpe")
            ),
        }
    )

    out = out.withColumns(
        {
            "fair_value": V.fair_value(
                F.col("graham_value"),
                F.col("target_mean_price"),
                eps,
                F.col("pe_median_used"),
                feps,
                F.col("fpe_median_used"),
            ),
            "fair_value_source": V.fair_value_source(
                F.col("graham_value"),
                F.col("target_mean_price"),
                eps,
                F.col("pe_median_used"),
                feps,
                F.col("fpe_median_used"),
            ),
            "margin_of_safety": V.margin_of_safety(
                F.col("graham_value"), F.col("price")
            ),
        }
    )

    out = out.withColumns(
        {
            "peg_pass": V.peg_pass(F.col("peg_ratio"), thresholds),
            "pe_vs_sector_pass": V.pe_vs_sector_pass(
                F.col("trailing_pe"), F.col("pe_median_used"), thresholds
            ),
            "margin_of_safety_pass": V.margin_of_safety_pass(
                F.col("margin_of_safety"), thresholds
            ),
        }
    )

    out = out.withColumns(
        {
            "valuation_hunter": V.hunter_verdict(
                F.col("peg_pass"),
                F.col("pe_vs_sector_pass"),
                F.col("margin_of_safety_pass"),
            ),
            "valuation": V.valuation_class(
                F.col("price"), F.col("fair_value"), thresholds
            ),
            "pct_diff": V.pct_diff(F.col("price"), F.col("fair_value")),
        }
    )

    return out.drop("overall_median_pe", "overall_median_fpe", "sector_median_fpe", "fpe_median_used")
