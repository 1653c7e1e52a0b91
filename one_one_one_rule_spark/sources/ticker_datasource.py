"""Ticker source as a Spark 4 Python Data Source (DataSource V2 API).

The reference's extraction entry point (extract_tickers.py:64-82) is a
fallback chain: Wikipedia constituents scrape, else a local CSV, raising if
both come up empty. ``sources/tickers.py`` models that chain as driver-side
helpers; this module elevates it to a REGISTERED source —

    spark.dataSource.register(TickerDataSource)
    spark.read.format("nasdaq_tickers").option("csv_path", ...).load()

— so the fallback logic lives behind the same ``spark.read`` surface as any
built-in format, composes with the DataFrame API (the scan runs on
executors, partitioned), and is swappable per deployment by options rather
than code. The Wikipedia leg stays network-gated exactly as in
``tickers.py:tickers_from_wikipedia``: offline it silently falls through to
the CSV leg, and an empty result raises (the reference's S4 contract).

Scale note: a ticker list is a ~100-row dimension, so the partition count
(default 2) only demonstrates the API's split planning — real weight comes
from the broadcast-join consumers downstream, not this scan.
"""

from __future__ import annotations

import csv
import io
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


@dataclass
class _Slice(InputPartition):
    """One modular slice of the resolved symbol list.

    Carries the slice's SYMBOLS, not just its index: the source list is
    resolved exactly once, driver-side, in ``partitions()``. If executors
    re-fetched per partition (and per task retry), the Wikipedia leg could
    return a different snapshot between fetches and drop or duplicate
    symbols across slices — embedding the data is what makes retries
    idempotent for the network leg, not just the stable CSV leg.
    InputPartition is pickled to executors, so a ~100-row payload rides
    the task closure for free."""

    index: int
    symbols: list


def _read_csv_symbols(path: str) -> list[str]:
    """Driver/executor-safe CSV read: prefer a column case-insensitively
    named 'symbol', else the first column (mirrors tickers_from_csv, S3)."""
    with io.open(path, "r", encoding="utf-8", newline="") as fh:
        rows = list(csv.reader(fh))
    if not rows:
        return []
    header = rows[0]
    lowered = {c.lower(): i for i, c in enumerate(header)}
    idx = lowered.get("symbol", 0)
    return [r[idx] for r in rows[1:] if len(r) > idx]


class TickerReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._csv_path = options.get("csv_path")
        self._use_wikipedia = (
            str(options.get("use_wikipedia", "false")).lower() == "true"
        )
        self._num_partitions = int(options.get("num_partitions", "2"))

    def _symbols(self) -> list[str]:
        symbols: list[str] | None = None
        if self._use_wikipedia:  # pragma: no cover - network-gated (S1/S2)
            try:
                from urllib.request import urlopen

                from .tickers import parse_html_tables, probe_ticker_tables

                with urlopen("https://en.wikipedia.org/wiki/Nasdaq-100") as r:
                    html = r.read().decode("utf-8", errors="replace")
                symbols = probe_ticker_tables(parse_html_tables(html))
            except Exception:
                symbols = None
        if symbols is None:
            if not self._csv_path:
                raise ValueError(
                    "nasdaq_tickers: csv_path option is required when the "
                    "wikipedia leg is disabled or unavailable"
                )
            symbols = _read_csv_symbols(self._csv_path)
        if not symbols:
            raise ValueError("no tickers available from any source")  # S4
        return symbols

    def partitions(self) -> list[_Slice]:
        # Resolve the fallback chain ONCE on the driver and embed each
        # slice's symbols in its InputPartition — one snapshot for the
        # whole scan, executors never re-fetch (see _Slice docstring).
        symbols = self._symbols()
        return [
            _Slice(i, symbols[i :: self._num_partitions])
            for i in range(self._num_partitions)
        ]

    def read(self, partition: _Slice):
        for sym in partition.symbols:
            yield (sym,)


class TickerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "nasdaq_tickers"

    def schema(self) -> str:
        return "symbol string"

    def reader(self, schema) -> TickerReader:
        return TickerReader(self.options)
