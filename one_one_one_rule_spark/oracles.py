"""DuckDB oracle SQL — ANSI formulations of every oracle-checked query.

The fundamentals CTEs here mirror sources/fixtures.py:synthetic_fundamentals
and the cleanse/valuate operators 1:1 (same CASE branch order, same literal
arithmetic, same guard order), so Spark and DuckDB results are bit-identical:
every scalar formula is evaluated in the same IEEE-754 operation order on the
same inputs, and medians are exact interpolating percentiles in both engines.

Aggregate SUMs over doubles are order-dependent, so every general-surface SUM
routes through an exact decimal cast: ``CAST(SUM(CAST(x AS DECIMAL(38,6)))
AS DOUBLE)`` — associative, hence identical under any partitioning/merge
order in both engines. (The matching Spark queries do the same.)
"""

from __future__ import annotations

from .config import DEFAULT_THRESHOLDS, ValuationThresholds

# ---------------------------------------------------------------------------
# fundamentals fixture + cleanse (mirrors sources/fixtures.py + operators/cleanse.py)
# ---------------------------------------------------------------------------

FUNDAMENTALS_CTES = """
__fund_raw AS (
  SELECT
    p_partkey AS k,
    p_name,
    p_brand,
    p_size,
    p_retailprice,
    CASE WHEN p_partkey % 50 = 49
         THEN 'T' || CAST(p_partkey - 1 AS VARCHAR)
         ELSE 'T' || CAST(p_partkey AS VARCHAR) END AS base_ticker
  FROM part
),
fundamentals AS (
  SELECT
    k,
    CASE WHEN k % 103 = 0 THEN NULL
         WHEN k % 101 = 0 THEN ''
         WHEN k % 31 = 0 THEN '  ' || lower(base_ticker) || ' '
         WHEN k % 41 = 0 THEN 'T.' || substr(base_ticker, 2)
         WHEN k % 3 = 0 THEN lower(base_ticker)
         ELSE base_ticker END AS ticker,
    p_name AS company,
    CASE WHEN k % 53 = 0 THEN 'NoPE'
         WHEN k % 19 = 0 THEN NULL
         WHEN k % 23 = 0 THEN ''
         ELSE p_brand END AS sector,
    CAST(CASE WHEN k % 17 = 0 THEN NULL
              WHEN k % 13 = 0 THEN -5.0e0
              WHEN k % 11 = 0 THEN 0.0e0
              ELSE p_retailprice / 10.0e0 END AS DOUBLE) AS price,
    CAST(CASE WHEN k % 7 = 0 THEN 0.0e0
              ELSE p_retailprice * 1000000.0e0 END AS DOUBLE) AS market_cap,
    CASE WHEN k % 2 = 0 THEN 'USD' ELSE '' END AS currency,
    CAST(CASE WHEN k % 53 = 0 THEN NULL
              WHEN k % 5 = 0 THEN NULL
              WHEN k % 29 = 0 THEN -3.0e0
              ELSE (k % 40) + p_size / 10.0e0 END AS DOUBLE) AS trailing_pe,
    CAST(CASE WHEN k % 6 = 0 THEN NULL
              ELSE (k % 35) + 1.5e0 END AS DOUBLE) AS forward_pe,
    CAST((k % 21) - 4.0e0 AS DOUBLE) AS trailing_eps,
    CAST(((k % 15) - 3.0e0) * 1.2e0 AS DOUBLE) AS forward_eps,
    CAST(CASE WHEN k % 9 = 0 THEN NULL
              WHEN k % 4 = 0 THEN 0.15e0
              WHEN k % 4 = 1 THEN 15.0e0
              WHEN k % 4 = 2 THEN 0.0e0
              ELSE -0.05e0 END AS DOUBLE) AS earnings_growth,
    CAST(CASE WHEN k % 8 = 0 THEN 1.2e0
              WHEN k % 8 = 1 THEN -0.5e0
              WHEN k % 8 = 2 THEN 0.0e0
              ELSE NULL END AS DOUBLE) AS peg_ratio,
    CAST(((k % 25) - 5.0e0) * 2.0e0 AS DOUBLE) AS book_value_per_share,
    CAST(CASE WHEN k % 10 = 0 THEN 50.0e0
              WHEN k % 10 = 1 THEN -10.0e0
              ELSE NULL END AS DOUBLE) AS target_mean_price
  FROM __fund_raw
)
"""

CLEANSE_CTES = """
__norm AS (
  SELECT *, replace(upper(trim(ticker)), '.', '-') AS norm_ticker
  FROM fundamentals
  WHERE ticker IS NOT NULL
),
cleansed AS (
  SELECT k, ticker, company, sector, price, market_cap, currency,
         trailing_pe, forward_pe, trailing_eps, forward_eps,
         earnings_growth, peg_ratio, book_value_per_share, target_mean_price
  FROM (
    SELECT k,
           norm_ticker AS ticker,
           company,
           CASE WHEN sector IS NULL OR sector = '' THEN 'Unknown' ELSE sector END AS sector,
           CASE WHEN price <= 0 THEN NULL ELSE price END AS price,
           CASE WHEN market_cap <= 0 THEN NULL ELSE market_cap END AS market_cap,
           currency, trailing_pe, forward_pe, trailing_eps, forward_eps,
           earnings_growth, peg_ratio, book_value_per_share, target_mean_price,
           row_number() OVER (PARTITION BY norm_ticker ORDER BY k) AS __rn
    FROM __norm
    WHERE norm_ticker <> ''
  ) t
  WHERE __rn = 1
)
"""


def valuation_ctes(t: ValuationThresholds = DEFAULT_THRESHOLDS) -> str:
    return f"""
__sector_stats AS (
  SELECT sector,
         median(trailing_pe) AS sector_median_pe,
         median(forward_pe) AS sector_median_fpe
  FROM cleansed GROUP BY sector
),
__overall AS (
  SELECT median(trailing_pe) AS overall_median_pe,
         median(forward_pe) AS overall_median_fpe
  FROM cleansed
),
__valued0 AS (
  SELECT c.*,
         s.sector_median_pe, s.sector_median_fpe,
         COALESCE(s.sector_median_pe, o.overall_median_pe) AS pe_median_used,
         COALESCE(s.sector_median_fpe, o.overall_median_fpe) AS fpe_median_used,
         CASE WHEN c.trailing_eps > 0 AND c.book_value_per_share > 0
              THEN sqrt(22.5e0 * c.trailing_eps * c.book_value_per_share) END AS graham_value,
         CASE WHEN c.peg_ratio > 0 THEN 'reported'
              WHEN c.trailing_pe > 0 AND c.earnings_growth > 0 THEN 'derived'
              ELSE 'missing' END AS peg_ratio_source,
         CASE WHEN c.peg_ratio > 0 THEN c.peg_ratio
              WHEN c.trailing_pe > 0 AND c.earnings_growth > 0
              THEN c.trailing_pe / (CASE WHEN c.earnings_growth <= 1
                                         THEN c.earnings_growth * 100
                                         ELSE c.earnings_growth END)
         END AS peg_final
  FROM cleansed c
  JOIN __sector_stats s USING (sector)
  CROSS JOIN __overall o
),
__valued1 AS (
  SELECT *,
    CASE WHEN graham_value > 0 THEN graham_value
         WHEN target_mean_price > 0 THEN target_mean_price
         WHEN trailing_eps > 0 AND pe_median_used > 0 THEN trailing_eps * pe_median_used
         WHEN forward_eps > 0 AND fpe_median_used > 0 THEN forward_eps * fpe_median_used
    END AS fair_value,
    CASE WHEN graham_value > 0 THEN 'graham_value'
         WHEN target_mean_price > 0 THEN 'target_mean_price'
         WHEN trailing_eps > 0 AND pe_median_used > 0 THEN 'sector_median_trailing_pe'
         WHEN forward_eps > 0 AND fpe_median_used > 0 THEN 'sector_median_forward_pe'
         ELSE 'missing' END AS fair_value_source,
    CASE WHEN graham_value > 0 THEN (graham_value - price) / graham_value END AS margin_of_safety
  FROM __valued0
),
__valued2 AS (
  SELECT *,
    CASE WHEN peg_final IS NULL OR peg_final <= 0 THEN 'unknown'
         WHEN peg_final < {t.peg_max!r}e0 THEN 'pass' ELSE 'fail' END AS peg_pass,
    CASE WHEN trailing_pe IS NULL OR pe_median_used IS NULL THEN 'unknown'
         WHEN trailing_pe <= pe_median_used * {t.pe_sector_max_mult!r}e0 THEN 'pass' ELSE 'fail' END AS pe_vs_sector_pass,
    CASE WHEN margin_of_safety IS NULL THEN 'unknown'
         WHEN margin_of_safety >= {t.margin_of_safety_min!r}e0 THEN 'pass' ELSE 'fail' END AS margin_of_safety_pass
  FROM __valued1
),
valued AS (
  SELECT *,
    CASE WHEN peg_pass = 'unknown' OR pe_vs_sector_pass = 'unknown' OR margin_of_safety_pass = 'unknown'
         THEN 'unknown'
         WHEN peg_pass = 'pass' AND pe_vs_sector_pass = 'pass' AND margin_of_safety_pass = 'pass'
         THEN 'pass'
         ELSE 'fail' END AS valuation_hunter,
    CASE WHEN price IS NULL OR fair_value IS NULL OR fair_value <= 0 THEN 'unknown'
         WHEN price <= fair_value * {t.undervalued!r}e0 THEN 'undervalued'
         WHEN price >= fair_value * {t.overvalued!r}e0 THEN 'overvalued'
         ELSE 'fair' END AS valuation,
    (price - fair_value) / fair_value AS pct_diff
  FROM __valued2
)
"""


def with_fundamentals(select_sql: str) -> str:
    """Wrap a SELECT with the fundamentals fixture CTEs."""
    return f"WITH {FUNDAMENTALS_CTES.strip()} {select_sql}"


def with_cleansed(select_sql: str) -> str:
    return f"WITH {FUNDAMENTALS_CTES.strip()}, {CLEANSE_CTES.strip()} {select_sql}"


def with_valued(
    select_sql: str, t: ValuationThresholds = DEFAULT_THRESHOLDS
) -> str:
    return (
        f"WITH {FUNDAMENTALS_CTES.strip()}, {CLEANSE_CTES.strip()},"
        f" {valuation_ctes(t).strip()} {select_sql}"
    )
