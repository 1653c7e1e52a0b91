"""Query registry — every oracle-checked query (SURVEY.md §2 inventory).

Each entry is a pair: a Spark query function ``(spark, sf_dir) -> DataFrame``
and (for SQL-expressible ops) a DuckDB oracle string over the same parquet
tables. Column names/aliases match exactly between the two; numeric outputs
follow the determinism rules documented in oracles.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import oracles
from .analytics import looker
from .config import DEFAULT_THRESHOLDS, FIXED_AS_OF_DATE, FIXED_RUN_TS_UTC
from .functions.cleansing import normalize_symbol
from .operators.cleanse import cleanse_fundamentals
from .operators.valuate import apply_valuation, sector_median_stats
from .plans.pipeline import run_fixture_pipeline
from .sources.fixtures import load_table, synthetic_fundamentals

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _cleansed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cleanse_fundamentals(
        synthetic_fundamentals(spark, sf_dir), order_col="k"
    )


def _valued(spark: SparkSession, sf_dir: str) -> DataFrame:
    return apply_valuation(_cleansed(spark, sf_dir), DEFAULT_THRESHOLDS)


# ---------------------------------------------------------------------------
# Valuation suite (reference pipeline: cleanse → valuate → project)
# ---------------------------------------------------------------------------

_VALUATION_FULL_COLS = [
    "as_of_date",
    "run_ts_utc",
    "ticker",
    "company",
    "sector",
    "price",
    "peg_ratio",
    "peg_ratio_source",
    "trailing_pe",
    "sector_median_pe",
    "pe_median_used",
    "forward_pe",
    "earnings_growth",
    "trailing_eps",
    "forward_eps",
    "book_value_per_share",
    "graham_value",
    "margin_of_safety",
    "peg_pass",
    "pe_vs_sector_pass",
    "margin_of_safety_pass",
    "valuation_hunter",
    "fair_value",
    "fair_value_source",
    "valuation",
    "pct_diff",
    "currency",
    "market_cap",
    "target_mean_price",
]


@register(
    "valuation_full",
    oracles.with_valued(
        f"""
SELECT '{FIXED_AS_OF_DATE}' AS as_of_date,
       '{FIXED_RUN_TS_UTC}' AS run_ts_utc,
       ticker, company, sector, price,
       peg_final AS peg_ratio, peg_ratio_source,
       trailing_pe, sector_median_pe, pe_median_used,
       forward_pe, earnings_growth, trailing_eps, forward_eps,
       book_value_per_share, graham_value, margin_of_safety,
       peg_pass, pe_vs_sector_pass, margin_of_safety_pass, valuation_hunter,
       fair_value, fair_value_source, valuation, pct_diff,
       currency, market_cap, target_mean_price
FROM valued
"""
    ),
)
def valuation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full 29-column valuation screen (pipeline_job.py:83-186)."""
    return run_fixture_pipeline(spark, sf_dir).select(*_VALUATION_FULL_COLS)


@register(
    "fundamentals_cleanse",
    oracles.with_cleansed(
        """
SELECT ticker, company, sector, price, market_cap, currency,
       trailing_pe, forward_pe, trailing_eps, forward_eps,
       earnings_growth, peg_ratio, book_value_per_share, target_mean_price
FROM cleansed
"""
    ),
)
def fundamentals_cleanse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleanse stage alone: F3/P3/D1/U6/P5/P4/P6
    (transform_valuation.py:99-149)."""
    return _cleansed(spark, sf_dir).drop("k")


@register(
    "sector_medians",
    oracles.with_cleansed(
        """
SELECT sector,
       median(trailing_pe) AS sector_median_pe,
       median(forward_pe) AS sector_median_fpe
FROM cleansed GROUP BY sector
"""
    ),
)
def sector_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — exact interpolating per-sector medians
    (transform_valuation.py:216-219)."""
    return sector_median_stats(_cleansed(spark, sf_dir))


@register(
    "graham_peg",
    oracles.with_valued(
        """
SELECT ticker, graham_value, peg_final AS peg_ratio, peg_ratio_source
FROM valued
"""
    ),
)
def graham_peg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 + F5 — Graham number and provenance-tagged PEG
    (transform_valuation.py:181-203)."""
    return _valued(spark, sf_dir).select(
        "ticker", "graham_value", "peg_ratio", "peg_ratio_source"
    )


@register(
    "valuation_screen_stats",
    oracles.with_valued(
        """
SELECT sector,
       CAST(COUNT(*) AS BIGINT) AS n_tickers,
       CAST(SUM(CASE WHEN valuation = 'undervalued' THEN 1 ELSE 0 END) AS BIGINT) AS undervalued_count,
       CAST(SUM(CASE WHEN valuation_hunter = 'pass' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(ticker) AS hunter_pass_rate
FROM valued
GROUP BY sector
"""
    ),
)
def valuation_screen_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 + A4 — Looker aggregate fields per sector (README.md:287-291)."""
    v = _valued(spark, sf_dir)
    return v.groupBy("sector").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tickers"),
        looker.undervalued_count(F.col("valuation")).alias("undervalued_count"),
        looker.hunter_pass_rate(F.col("valuation_hunter"), F.col("ticker")).alias(
            "hunter_pass_rate"
        ),
    )


@register(
    "looker_mos_buckets",
    oracles.with_valued(
        """
SELECT CASE WHEN margin_of_safety IS NULL THEN 'unknown'
            WHEN margin_of_safety >= 0.25 THEN '>=25%'
            WHEN margin_of_safety >= 0.10 THEN '10-25%'
            WHEN margin_of_safety >= 0 THEN '0-10%'
            ELSE '<0%' END AS mos_bucket,
       upper(valuation_hunter) AS valuation_hunter_flag,
       CAST(COUNT(*) AS BIGINT) AS n
FROM valued
GROUP BY 1, 2
"""
    ),
)
def looker_mos_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 — margin-of-safety bucketing + hunter flag, aggregated
    (README.md:271-285)."""
    v = _valued(spark, sf_dir)
    return (
        v.select(
            looker.mos_bucket(F.col("margin_of_safety")).alias("mos_bucket"),
            looker.valuation_hunter_flag(F.col("valuation_hunter")).alias(
                "valuation_hunter_flag"
            ),
        )
        .groupBy("mos_bucket", "valuation_hunter_flag")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register(
    "tickers_normalized",
    oracles.with_fundamentals(
        """
SELECT DISTINCT replace(upper(trim(ticker)), '.', '-') AS symbol
FROM fundamentals
WHERE ticker IS NOT NULL AND replace(upper(trim(ticker)), '.', '-') <> ''
"""
    ),
)
def tickers_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 + D2 — normalized sorted-distinct ticker universe
    (extract_tickers.py:12-18,41)."""
    raw = synthetic_fundamentals(spark, sf_dir)
    sym = normalize_symbol("ticker")
    return (
        raw.filter(F.col("ticker").isNotNull())
        .select(sym.alias("symbol"))
        .filter(F.col("symbol") != "")
        .distinct()
        .orderBy("symbol")
    )
