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


def assemble_snapshot(ticker: str, info: dict, fast: dict) -> dict:
    """S6 row assembly — flatten info/fast_info dicts to the 14-field
    snapshot with the per-field F2 coalesce chains
    (transform_valuation.py:42-87). Pure; exercised offline with injected
    dicts and oracle-gated via the ``fundamentals_fetch`` registry query."""
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


def default_fetch(ticker: str) -> dict:
    """S5 — live yfinance fetch feeding :func:`assemble_snapshot`
    (transform_valuation.py:42-96)."""
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
    return assemble_snapshot(ticker, info, fast)


def fixture_fetch(ticker: str) -> dict:
    """Deterministic offline stand-in for the live fetch (S5 gate): derives
    info/fast dicts from the ticker's numeric suffix with pure arithmetic so
    the assembled snapshot is reproducible in ANSI SQL (the
    ``fundamentals_fetch`` oracle). Field placement exercises every F2
    fallback branch: price present in fast only for n%3==0 (else falls to
    info), market_cap in fast only for n%4==0, currency never in info, names
    missing from shortName every 11th ticker."""
    n = int(ticker[1:])
    info = {
        "shortName": None if n % 11 == 0 else f"Info {n}",
        "longName": f"Long {n}",
        "sector": None if n % 17 == 0 else f"SEC{n % 7}",
        "currentPrice": n / 10.0,
        "marketCap": n * 1000000.0,
        "trailingPE": None if n % 5 == 0 else (n % 40) + 0.5,
        "forwardPE": None if n % 6 == 0 else (n % 35) + 1.5,
        "trailingEps": (n % 21) - 4.0,
        "forwardEps": ((n % 15) - 3.0) * 1.2,
        "earningsGrowth": None
        if n % 9 == 0
        else (
            0.15
            if n % 4 == 0
            else 15.0 if n % 4 == 1 else 0.0 if n % 4 == 2 else -0.05
        ),
        "pegRatio": 1.2 if n % 8 == 0 else (-0.5 if n % 8 == 1 else None),
        "bookValue": ((n % 25) - 5.0) * 2.0,
        "targetMeanPrice": 50.0 if n % 10 == 0 else None,
    }
    fast = {
        "last_price": n / 10.0 + 0.25 if n % 3 == 0 else None,
        "market_cap": n * 2000000.0 if n % 4 == 0 else None,
        "currency": "USD" if n % 2 == 0 else None,
    }
    return assemble_snapshot(ticker, info, fast)


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
