"""Source/sink adapter tests: CSV ticker scan with column resolution,
fallback chain, distributed fundamentals fetch (injected fetch_fn), CSV
single-file sink, local post-sink upsert."""

import os

import pytest

from one_one_one_rule_spark.operators.output import (
    build_output,
    write_single_csv,
)
from one_one_one_rule_spark.sources.sinks import LocalCopySink, ship
from one_one_one_rule_spark.sources.tickers import (
    load_tickers,
    normalized_distinct,
    tickers_from_csv,
)
from one_one_one_rule_spark.sources.yfinance_source import (
    fetch_fundamentals_distributed,
)


@pytest.fixture()
def ticker_csv(tmp_path):
    p = tmp_path / "tickers.csv"
    p.write_text("Symbol,Name\n aapl ,Apple\nMSFT,Microsoft\nbrk.b,Berkshire\nAAPL,Apple dup\n,empty\n")
    return str(p)


def test_csv_scan_case_insensitive_column(spark, ticker_csv):
    df = tickers_from_csv(spark, ticker_csv)  # resolves 'Symbol'
    assert df.columns == ["symbol"]
    assert df.count() == 5


def test_normalize_distinct_sorted(spark, ticker_csv):
    out = normalized_distinct(tickers_from_csv(spark, ticker_csv)).collect()
    assert [r.symbol for r in out] == ["AAPL", "BRK-B", "MSFT"]


def test_fallback_chain_and_empty_raises(spark, ticker_csv, tmp_path):
    # wikipedia disabled -> csv fallback works
    assert load_tickers(spark, ticker_csv).count() == 3
    empty = tmp_path / "empty.csv"
    empty.write_text("Symbol\n")
    with pytest.raises(ValueError):
        load_tickers(spark, str(empty))


def test_distributed_fetch_with_injected_fn(spark, ticker_csv):
    tickers = normalized_distinct(tickers_from_csv(spark, ticker_csv))

    def fake_fetch(t):
        return {
            "ticker": t,
            "company": f"{t} inc",
            "sector": "Tech",
            "price": float(len(t)),
            "market_cap": 1e9,
            "currency": "USD",
            "trailing_pe": 10.0,
            "forward_pe": None,
            "trailing_eps": 1.0,
            "forward_eps": None,
            "earnings_growth": "0.5",  # string -> coerced to double
            "peg_ratio": None,
            "book_value_per_share": 2.0,
            "target_mean_price": None,
        }

    snap = fetch_fundamentals_distributed(tickers, fetch_fn=fake_fetch, parallelism=2)
    rows = {r.ticker: r for r in snap.collect()}
    assert set(rows) == {"AAPL", "BRK-B", "MSFT"}
    assert rows["AAPL"].earnings_growth == 0.5  # coerced
    assert dict(snap.dtypes)["earnings_growth"] == "double"


def test_single_csv_sink_and_post_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [("AAPL", 1.0), ("MSFT", None)], "ticker string, x double"
    )
    out = build_output(df, "2026-01-01", "2026-01-01T00:00:00Z")
    assert out.columns[:3] == ["as_of_date", "run_ts_utc", "ticker"]
    path = write_single_csv(out, str(tmp_path / "out.csv"))
    text = open(path).read().splitlines()
    assert text[0] == "as_of_date,run_ts_utc,ticker,x"
    assert len(text) == 3
    assert text[1].endswith("1.0") or text[2].endswith("1.0")

    # post-sink upsert-by-name: second ship overwrites
    sink = LocalCopySink(str(tmp_path / "drive"))
    dest1 = ship(path, sink, "valuations.csv")
    dest2 = ship(path, sink, "valuations.csv")
    assert dest1 == dest2 and os.path.exists(dest1)
    assert ship(path, None) is None
