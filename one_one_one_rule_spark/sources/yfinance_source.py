"""Live fundamentals source (S5/S6, SURVEY.md §2.1) — yfinance adapter.

The reference fetches ~101 tickers sequentially on one thread
(transform_valuation.py:90-96); here the fetch is distributed: the ticker
DataFrame is repartitioned and each partition pulls its tickers inside an
Arrow-batched ``mapInPandas`` (bounded parallelism == partitions, the
rate-limit knob). yfinance is not installed in this environment, so the
network call is gated behind import-try; the partition-parallel plumbing and
the per-field fallback chains (F2 — coalesce over candidate fields) are real
and tested via ``fetch_fn`` injection.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

from ..schemas import SNAPSHOT_NUMERIC_COLS

SNAPSHOT_FIELDS = [
    "ticker",
    "company",
    "sector",
    "price",
    "market_cap",
    "currency",
    "trailing_pe",
    "forward_pe",
    "trailing_eps",
    "forward_eps",
    "earnings_growth",
    "peg_ratio",
    "book_value_per_share",
    "target_mean_price",
]

SNAPSHOT_DDL = (
    "ticker string, company string, sector string, price double, "
    "market_cap double, currency string, trailing_pe double, "
    "forward_pe double, trailing_eps double, forward_eps double, "
    "earnings_growth double, peg_ratio double, "
    "book_value_per_share double, target_mean_price double"
)


def _first(*vals):
    """F2 — first non-None value (transform_valuation.py:22-30); NaN never
    enters: numeric coercion happens downstream in the cleanse stage."""
    for v in vals:
        if v is not None:
            return v
    return None


def default_fetch(ticker: str) -> dict:
    """S5 — flatten yfinance info/fast_info to the 14-field snapshot
    (transform_valuation.py:42-87), with per-field coalesce chains."""
    try:  # pragma: no cover - yfinance not installed here
        import yfinance as yf
    except Exception as exc:  # noqa: BLE001
        raise NotImplementedError(
            "yfinance is not available in this environment; inject fetch_fn "
            "or use the parquet FixtureSource"
        ) from exc

    t = yf.Ticker(ticker)
    try:
        info = t.info or {}
    except Exception:
        info = {}
    try:
        fast = t.fast_info or {}
    except Exception:
        fast = {}
    return {
        "ticker": ticker,
        "company": info.get("shortName") or info.get("longName") or "",
        "sector": info.get("sector") or "Unknown",
        "price": _first(
            fast.get("last_price"),
            fast.get("regular_market_price"),
            info.get("currentPrice"),
            info.get("regularMarketPrice"),
        ),
        "market_cap": _first(fast.get("market_cap"), info.get("marketCap")),
        "currency": _first(fast.get("currency"), info.get("currency")) or "",
        "trailing_pe": info.get("trailingPE"),
        "forward_pe": info.get("forwardPE"),
        "trailing_eps": info.get("trailingEps"),
        "forward_eps": info.get("forwardEps"),
        "earnings_growth": info.get("earningsGrowth"),
        "peg_ratio": info.get("pegRatio"),
        "book_value_per_share": info.get("bookValue"),
        "target_mean_price": info.get("targetMeanPrice"),
    }


def fetch_fundamentals_distributed(
    tickers: DataFrame,
    fetch_fn: Callable[[str], dict] | None = None,
    parallelism: int = 8,
) -> DataFrame:
    """S6 distributed — one snapshot row per ticker, fetched
    partition-parallel. ``parallelism`` bounds concurrent fetchers (HTTP
    rate-limit control)."""
    fetch = fetch_fn or default_fetch

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [fetch(t) for t in pdf["symbol"]]
            out = pd.DataFrame(rows, columns=SNAPSHOT_FIELDS)
            for c in SNAPSHOT_NUMERIC_COLS:
                out[c] = pd.to_numeric(out[c], errors="coerce")
            yield out

    return tickers.repartition(parallelism).mapInPandas(fn, schema=SNAPSHOT_DDL)
