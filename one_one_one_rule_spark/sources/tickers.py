"""Ticker-universe sources (S1-S4, SURVEY.md §2.1).

S3 CSV scan with case-insensitive column resolution and S4 source-level
fallback are engine-native; the Wikipedia HTML scans (S1/S2) are driver-side
utilities gated behind import-try (network + bs4/pandas.read_html are not
available here), mirroring the reference's structure where scraping happens
before any DataFrame work (extract_tickers.py:64-82).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleansing import normalize_symbol

MIN_TICKERS_SANITY = 80  # P7 — accept scraped list only if >= 80 (extract_tickers.py:40-41)


def tickers_from_csv(
    spark: SparkSession, path: str, column: str | None = None
) -> DataFrame:
    """S3 — header CSV scan; prefer a column case-insensitively named
    'symbol', else the first column (extract_tickers.py:45-61)."""
    df = spark.read.option("header", True).csv(path)
    if column is None:
        lowered = {c.lower(): c for c in df.columns}
        column = lowered.get("symbol", df.columns[0])
    return df.select(F.col(column).alias("symbol"))


def normalized_distinct(tickers: DataFrame) -> DataFrame:
    """F3 + D2 — normalize, drop empties, sorted distinct
    (extract_tickers.py:12-18,41)."""
    return (
        tickers.select(normalize_symbol("symbol").alias("symbol"))
        .filter(F.col("symbol").isNotNull() & (F.col("symbol") != ""))
        .distinct()
        .orderBy("symbol")
    )


def tickers_from_wikipedia(spark: SparkSession) -> DataFrame | None:
    """S1/S2 — driver-side Wikipedia constituents scrape.

    Probes every table for a ticker-ish column and applies the ≥80-row
    sanity gate (P7). Returns None when the network/HTML stack is
    unavailable — callers fall back to the CSV source (S4).
    """
    try:  # pragma: no cover - network not available in this environment
        import pandas as pd

        tables = pd.read_html("https://en.wikipedia.org/wiki/Nasdaq-100")
        for t in tables:
            cols = {str(c).strip().lower(): c for c in t.columns}
            for cand in ("ticker", "ticker symbol", "symbol"):
                if cand in cols and len(t) >= MIN_TICKERS_SANITY:
                    syms = t[cols[cand]].astype(str).tolist()
                    return spark.createDataFrame(
                        [(s,) for s in syms], "symbol string"
                    )
        return None
    except Exception:
        return None


def load_tickers(
    spark: SparkSession,
    fallback_csv: str,
    use_wikipedia: bool = False,
) -> DataFrame:
    """S4 — fallback source chain: Wikipedia (if enabled) else CSV; raise if
    the result is empty (extract_tickers.py:64-82)."""
    df = tickers_from_wikipedia(spark) if use_wikipedia else None
    if df is None:
        df = tickers_from_csv(spark, fallback_csv)
    out = normalized_distinct(df)
    if out.limit(1).count() == 0:
        raise ValueError("no tickers available from any source")
    return out
