"""Valuation expression library — the analytical core (SURVEY.md §2.7).

Every function returns a native Catalyst ``Column``; the reference's
iterrows/apply row loops (transform_valuation.py:226-306) compile away into
one codegen'd projection. NULL three-valued logic stands in for the
reference's NaN guards: ``NULL > 0`` is NULL, which ``F.when`` treats as
false — exactly the reference's ``pd.notna(x) and x > 0`` shape.

Provenance tags are produced by `when` chains mirroring the exact guard
order of their value counterparts, so tag and value can never disagree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import ValuationThresholds


def graham_value(trailing_eps: Column, book_value_per_share: Column) -> Column:
    """F4 — Graham number: sqrt(22.5 * eps * bvps) iff both > 0, else NULL.

    Reference: _compute_graham_value, transform_valuation.py:181-187.
    """
    return F.when(
        (trailing_eps > 0) & (book_value_per_share > 0),
        F.sqrt(F.lit(22.5) * trailing_eps * book_value_per_share),
    )


def _growth_pct(earnings_growth: Column) -> Column:
    """Unit normalization: growth <= 1 is a fraction → ×100, else already %.

    Reference: transform_valuation.py:199.
    """
    return F.when(earnings_growth <= 1, earnings_growth * 100).otherwise(
        earnings_growth
    )


def peg_ratio(
    reported_peg: Column, trailing_pe: Column, earnings_growth: Column
) -> Column:
    """F5 (value) — reported PEG if > 0, else derived trailing_pe/growth_pct
    when both trailing_pe > 0 and earnings_growth > 0; else NULL.

    Reference: _compute_peg_ratio, transform_valuation.py:190-203.
    """
    return F.when(reported_peg > 0, reported_peg).when(
        (trailing_pe > 0) & (earnings_growth > 0),
        trailing_pe / _growth_pct(earnings_growth),
    )


def peg_ratio_source(
    reported_peg: Column, trailing_pe: Column, earnings_growth: Column
) -> Column:
    """F5 (provenance) — 'reported' / 'derived' / 'missing', same guard order
    as :func:`peg_ratio`."""
    return (
        F.when(reported_peg > 0, F.lit("reported"))
        .when((trailing_pe > 0) & (earnings_growth > 0), F.lit("derived"))
        .otherwise(F.lit("missing"))
    )


def fair_value(
    graham: Column,
    target_mean_price: Column,
    trailing_eps: Column,
    pe_median_used: Column,
    forward_eps: Column,
    fpe_median_used: Column,
) -> Column:
    """F7 (value) — fallback chain: graham → analyst target → trailing_eps ×
    sector/overall trailing-PE median → forward_eps × forward-PE median →
    NULL.

    ``pe_median_used`` / ``fpe_median_used`` must already be
    coalesce(sector_median, overall_median) — reference
    transform_valuation.py:164-167 and :172-175.

    Reference: _select_fair_value, transform_valuation.py:152-178.
    """
    return (
        F.when(graham > 0, graham)
        .when(target_mean_price > 0, target_mean_price)
        .when(
            (trailing_eps > 0) & (pe_median_used > 0),
            trailing_eps * pe_median_used,
        )
        .when(
            (forward_eps > 0) & (fpe_median_used > 0),
            forward_eps * fpe_median_used,
        )
    )


def fair_value_source(
    graham: Column,
    target_mean_price: Column,
    trailing_eps: Column,
    pe_median_used: Column,
    forward_eps: Column,
    fpe_median_used: Column,
) -> Column:
    """F7 (provenance) — mirrored guard chain of :func:`fair_value`."""
    return (
        F.when(graham > 0, F.lit("graham_value"))
        .when(target_mean_price > 0, F.lit("target_mean_price"))
        .when(
            (trailing_eps > 0) & (pe_median_used > 0),
            F.lit("sector_median_trailing_pe"),
        )
        .when(
            (forward_eps > 0) & (fpe_median_used > 0),
            F.lit("sector_median_forward_pe"),
        )
        .otherwise(F.lit("missing"))
    )


def margin_of_safety(graham: Column, price: Column) -> Column:
    """F6 — (graham - price) / graham iff graham > 0, else NULL. A NULL price
    propagates to NULL (reference np.where leaves NaN),
    transform_valuation.py:254-258."""
    return F.when(graham > 0, (graham - price) / graham)


def tri_state(valid: Column, condition: Column) -> Column:
    """F8 — 'unknown' when not valid, else 'pass'/'fail' on condition.

    Reference: _pass_fail_unknown, transform_valuation.py:206-210. ``condition``
    is only consulted when ``valid`` is true, so a NULL condition under a valid
    guard yields 'fail' — matching the reference where valid implies the
    operands are non-null.
    """
    return (
        F.when(~valid, F.lit("unknown"))
        .when(condition, F.lit("pass"))
        .otherwise(F.lit("fail"))
    )


def peg_pass(peg: Column, thresholds: ValuationThresholds) -> Column:
    """F8 application #1 — valid = peg non-null and > 0; pass when
    peg < peg_max. Reference: transform_valuation.py:260-264."""
    return tri_state(peg.isNotNull() & (peg > 0), peg < F.lit(thresholds.peg_max))


def pe_vs_sector_pass(
    trailing_pe: Column, pe_median_used: Column, thresholds: ValuationThresholds
) -> Column:
    """F8 application #2 — valid = both non-null; pass when
    pe <= median × mult. Reference: transform_valuation.py:266-273."""
    return tri_state(
        trailing_pe.isNotNull() & pe_median_used.isNotNull(),
        trailing_pe <= pe_median_used * F.lit(thresholds.pe_sector_max_mult),
    )


def margin_of_safety_pass(mos: Column, thresholds: ValuationThresholds) -> Column:
    """F8 application #3 — valid = mos non-null; pass when mos >= min.
    Reference: transform_valuation.py:275-279."""
    return tri_state(mos.isNotNull(), mos >= F.lit(thresholds.margin_of_safety_min))


def hunter_verdict(c1: Column, c2: Column, c3: Column) -> Column:
    """F9 — 3-way AND with unknown propagation: any 'unknown' → 'unknown';
    all 'pass' → 'pass'; else 'fail'.

    Reference: hunter_classify, transform_valuation.py:281-293.
    """
    unk = F.lit("unknown")
    return (
        F.when((c1 == unk) | (c2 == unk) | (c3 == unk), unk)
        .when(
            (c1 == F.lit("pass")) & (c2 == F.lit("pass")) & (c3 == F.lit("pass")),
            F.lit("pass"),
        )
        .otherwise(F.lit("fail"))
    )


def valuation_class(
    price: Column, fair: Column, thresholds: ValuationThresholds
) -> Column:
    """F10 — threshold classification with inclusive bounds.

    Reference: classify, transform_valuation.py:295-304.
    """
    return (
        F.when(price.isNull() | fair.isNull() | (fair <= 0), F.lit("unknown"))
        .when(price <= fair * F.lit(thresholds.undervalued), F.lit("undervalued"))
        .when(price >= fair * F.lit(thresholds.overvalued), F.lit("overvalued"))
        .otherwise(F.lit("fair"))
    )


def pct_diff(price: Column, fair: Column) -> Column:
    """F11 — (price - fair) / fair; NULL propagates (no guard, reference
    transform_valuation.py:307)."""
    return (price - fair) / fair
